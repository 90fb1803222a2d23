package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Frontier measurement for the layout_bucketed lever (round 17 — r16
  * verdict item 2): addendum 8 measured q18's 600M-row orderkey shuffle
  * as its floor at the 17 GB corpus (partials reduce only 2%) and NAMED
  * bucketed layout as the fix; this makes the claim a number.
  *
  * Times, at the given corpus:
  *   1. the q18-shape per-order HAVING aggregate over RAW parquet (the
  *      shuffle-floor plan),
  *   2. the one-time bucketed write (the amortized cost: one shuffle at
  *      write time, paid once per corpus snapshot),
  *   3. the same aggregate over the BUCKETED table (must plan with no
  *      Exchange — asserted, not assumed),
  *   4. full q18 raw vs full q18 with lineitem swapped for the bucketed
  *      table (the end-to-end query the layout serves).
  *
  *   sbt "runMain graft.tools.BucketedAggScale /tmp/k100_tpch /tmp/k100_wh [buckets]"
  */
object BucketedAggScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val wh = args(1)
    val buckets = if (args.length > 2) args(2).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]")
          .config("spark.sql.warehouse.dir", wh), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"""{"step":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
      r
    }

    def perOrderAgg(li: org.apache.spark.sql.DataFrame) =
      li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 300)

    def q18Over(li: org.apache.spark.sql.DataFrame) = {
      val perOrder = perOrderAgg(li)
      spark.read.parquet(s"$dir/orders.parquet")
        .join(perOrder, col("o_orderkey") === col("l_orderkey"))
        .join(spark.read.parquet(s"$dir/customer.parquet"),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_totalprice").as("total_price"), col("total_qty"))
        .orderBy(col("total_price").desc, col("o_orderkey"))
        .limit(100)
    }

    val raw = spark.read.parquet(s"$dir/lineitem.parquet")
    time("agg_raw") { perOrderAgg(raw).queryExecution.toRdd.count() }

    val tbl = "li_bucketed_scale"
    time("bucketed_write") {
      raw.write.mode("overwrite")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(tbl)
    }
    val b = spark.table(tbl)
    val bPlan = perOrderAgg(b).queryExecution.executedPlan.toString
    require(!bPlan.contains("Exchange"),
      s"bucketed aggregate must be exchange-free:\n$bPlan")
    time("agg_bucketed") { perOrderAgg(b).queryExecution.toRdd.count() }

    time("q18_raw") { q18Over(raw).queryExecution.toRdd.count() }
    time("q18_bucketed") { q18Over(b).queryExecution.toRdd.count() }

    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.stop()
  }
}
