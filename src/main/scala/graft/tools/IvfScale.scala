package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Measurement harness for the corpus-scaled IVF quantizer (round 12):
  * times `knnGraphIvfTuned` under (a) the corpus-scaled cell count
  * (coarseCells levels > 0 at big corpora) and (b) the r11
  * fixed-8-cell + member-cap fallback, then measures recall of both
  * against the exact top-5 graph of a sampled query panel (the full
  * exact graph is n² — only the panel is brute-forced, via the
  * broadcast-panel one-pass scan shape).
  *
  *   sbt "runMain graft.tools.IvfScale /tmp/sf100_synth 4000"
  *
  * arg2 = panel modulus (query panel is vec_id % mod == 0).
  */
object IvfScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mod = if (args.length > 1) args(1).toLong else 4000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def panelEdges(df: DataFrame): Set[(Long, Long)] =
      df.filter(col("query_id") % mod === 0)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    // exact top-5 for the panel only: broadcast panel × streamed corpus
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.filter(col("vec_id") % mod === 0)
      .select(col("vec_id").as("query_id"), col("emb").as("ea"))
    val c = graft.Tables.spread(
      e.select(col("vec_id").as("neighbor_id"), col("emb").as("eb")))
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.native.cosineSim(col("ea"), col("eb")).as("cos"))
    val t0 = System.nanoTime()
    val exact = graft.operators.TopK.perKey(scored,
        keys = Seq("query_id"),
        order = Seq("cos" -> true, "neighbor_id" -> false), k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    println(f"exact_panel: ${(System.nanoTime() - t0) / 1e9}%.1f s, ${exact.size} edges")

    def run(label: String, maxCell: Int, targetCell: Int): Unit = {
      val t = System.nanoTime()
      val edges = panelEdges(graft.similarity.Ann.knnGraphIvfTuned(
        spark, dir, probes = 2, replicas = 2,
        maxCell = maxCell, targetCell = targetCell))
      val secs = (System.nanoTime() - t) / 1e9
      val recall = (exact intersect edges).size.toDouble / exact.size
      println(f"""{"variant":"$label","sec":$secs%.1f,"panel_recall":$recall%.4f,"panel_edges":${edges.size}}""")
      graft.Checkpoints.releaseAll() // don't pool lineage-cut blocks across variants
    }
    run("scaled", maxCell = 2000, targetCell = 2000) // levels>0 at big corpora
    run("capped", maxCell = 2000, targetCell = Int.MaxValue) // r11 fallback: 8 cells + cap
    spark.stop()
  }
}
