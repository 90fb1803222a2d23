package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Dev tool: execute each named query at a toy SF and count FINAL-plan
  * FileScan nodes per table (AQE's plan string appends an
  * "== Initial Plan ==" twin, which is excluded). A fact table appearing
  * more than once means the plan genuinely re-scans it — ReusedExchange /
  * ReusedSubquery dedupe shows up here as a count of 1.
  *
  *   sbt "runMain graft.tools.ScanAudit q15_top_supplier q2_min_cost_supplier"
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.filter(k =>
        k.startsWith("q") && k.take(3).exists(_.isDigit)).toSeq.sorted
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("lineitem", "orders", "customer", "part", "supplier",
      "events", "documents", "embeddings")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val counts = tables.flatMap { t =>
        val c = finalPlan.split("\n").count(l =>
          l.contains("FileScan") && l.contains(s"$t.parquet"))
        if (c > 0) Some(s"$t=$c") else None
      }
      val flag = if (counts.exists(_.split("=")(1).toInt > 1)) "  <-- RESCAN" else ""
      println(s"scanaudit $n: ${counts.mkString(" ")}$flag")
      graft.Checkpoints.releaseAll()
    }
    spark.stop()
  }
}
