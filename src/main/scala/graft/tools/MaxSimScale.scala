package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Frontier harness for the routed MaxSim (round 15 — r14 verdict item
  * 6): times the brute-force panel and the IVF-routed variant at a
  * scaled corpus and reports recall of the routed top-3 doc sets against
  * the brute-force panel.
  *
  *   sbt "runMain graft.tools.MaxSimScale /tmp/k1000_emb"
  */
object MaxSimScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def run(label: String, f: => org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val t0 = System.nanoTime()
      val rows = f.select($"query_group", $"doc_label").as[(Long, Long)].collect().toSet
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"variant":"$label","sec":$secs%.1f,"rows":${rows.size}}""")
      graft.Checkpoints.releaseAll()
      rows
    }
    val exact = run("maxsim_brute", graft.similarity.Ann.maxsim(spark, dir))
    val routed = run("maxsim_ivf", graft.similarity.Ann.maxsimIvf(spark, dir))
    val recall = exact.count(routed.contains).toDouble / math.max(1, exact.size)
    println(f"""{"metric":"maxsim_ivf_recall3","value":$recall%.4f}""")
    spark.stop()
  }
}
