package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Scale-path proof: bucketed tables make repeated fact⋈fact joins
  * co-located — Spark plans the join with NO shuffle exchange because both
  * sides already satisfy HashPartitioning(custkey, 8). At 100 TB this is
  * the difference between re-shuffling the fact table per query and
  * shuffling once at write time.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    spark.stop()
  }

  test("layout_bucketed: q18-shape aggregate over the bucketed layout is exchange-free and value-identical") {
    val df = operators.Layout.bucketedAgg(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed aggregate must not shuffle:\n$plan")
    // value identity vs the same aggregate over raw parquet — the oracle
    // relation CORRECTNESS checks at sf0.01, pinned here at sf0.001 too
    val raw = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 300)
      .collect().map(r => (r.get(0), r.get(1))).toSet
    val got = df.collect().map(r => (r.get(0), r.get(1))).toSet
    assert(got == raw, s"bucketed aggregate diverged: ${got.size} vs ${raw.size}")
    assert(got.nonEmpty, "threshold 300 must keep rows at sf0.001")
  }

  test("bucketed join plans with no shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
      Tables.customer(spark, sf).write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      assert(joined.count() == Tables.orders(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
