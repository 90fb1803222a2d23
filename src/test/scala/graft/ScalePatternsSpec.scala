package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Skew

/** Scale patterns: salted skew joins and partition-pruned layouts. */
class ScalePatternsSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  test("salted join returns exactly the plain-join rows") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey")).collect().toSet
    val salted = Skew.saltedJoin(orders, customer,
        col("o_custkey") === col("c_custkey"), salt = 8)
      .select(col("o_orderkey"), col("c_custkey")).collect().toSet
    assert(salted == plain)
  }

  test("partitionBy layout prunes partitions at read time") {
    val tmp = Files.createTempDirectory("graft_part").toString
    Tables.documents(spark, sf).write.mode("overwrite")
      .partitionBy("lang").parquet(tmp)
    val q = spark.read.parquet(tmp).filter(col("lang") === "en")
    val expected = Tables.documents(spark, sf).filter(col("lang") === "en").count()
    assert(q.count() == expected)
    // partition filter reaches the scan (expression ids vary: "lang#N = en")
    val scan = q.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[.*lang#\\d+ = en".r.findFirstIn(scan).isDefined, scan)
  }

  test("curate pipeline exposes observed metrics") {
    import scala.collection.mutable
    val seen = mutable.Map.empty[String, Long]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        qe.observedMetrics.get("curate_metrics").foreach { row =>
          seen("rows_seen") = row.getAs[Long]("rows_seen")
          seen("rows_kept") = row.getAs[Long]("rows_kept")
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      pipeline.Curate.run(spark, sf).collect()
      // listener fires asynchronously; poll briefly
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.get("rows_seen").contains(Tables.documents(spark, sf).count()))
      assert(seen("rows_kept") <= seen("rows_seen"))
    } finally spark.listenerManager.unregister(listener)
  }

  test("dedup clusters group exact duplicates together") {
    import spark.implicits._
    val c = dedup.Dedup.clusters(spark, sf)
    // every doc labeled, labels ≤ doc_id (min-propagation invariant)
    assert(c.count() == Tables.documents(spark, sf).count())
    assert(c.filter($"cluster_id" > $"doc_id").count() == 0)
    // exact duplicates (same md5) must share a cluster
    val dupPair = Tables.documents(spark, sf)
      .groupBy(md5($"text")).agg(collect_list($"doc_id").as("ids"))
      .filter(size($"ids") > 1).select(explode($"ids").as("doc_id"),
        $"ids"(0).as("rep"))
    if (dupPair.count() > 0) {
      val joined = dupPair.join(c, "doc_id")
        .groupBy($"rep").agg(countDistinct($"cluster_id").as("nc"))
      assert(joined.filter($"nc" =!= 1).count() == 0)
    }
  }
}
