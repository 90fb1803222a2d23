package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** K=1000 frontier harness for the join-heavy TPC-H shapes (round 15 —
  * r14 verdict item 5): the r11 17 GB capture covered the scan family;
  * this times the multi-fact joins (q8, q9, q21), the two-pass aggregate
  * (q17), and the dimHint-swept promo shapes (q14, q19) at the scaled
  * corpus — with the forced broadcast hints size-gated, these plans must
  * survive a part table three orders of magnitude past the hint bound.
  *
  *   sbt "runMain graft.tools.TpchScale /tmp/k1000_tpch [keys,...]"
  */
object TpchScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val keys = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q14_promo_revenue", "q19_discounted_revenue",
        "q17_small_qty_revenue", "q8_market_share", "q9_product_profit",
        "q21_waiting_suppliers")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      val t0 = System.nanoTime()
      // toRdd.count(), not collect() and not Dataset.count(): frontier
      // corpora make some results corpus-sized (e.g. one row per
      // session), which overflows spark.driver.maxResultSize under
      // collect — and Dataset.count() lets Catalyst prune projections
      // and non-grouping aggregate expressions not needed to count rows,
      // under-measuring expression-heavy shapes. queryExecution.toRdd
      // is the already-optimized physical plan AS WRITTEN; counting its
      // rows executes every projection without shipping rows back.
      val n = graft.SparkEntry.queries(k)(spark, dir).queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"query":"$k","sec":$secs%.1f,"rows":$n}""")
      graft.Checkpoints.releaseAll()
    }
    spark.stop()
  }
}
