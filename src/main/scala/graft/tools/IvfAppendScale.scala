package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Append-vs-rebuild economics for the IVF cells artifact (round 16 —
  * r15 verdict item 3): builds the artifact on a corpus snapshot, appends
  * a batch through the frozen tree with [[graft.similarity.Ann.appendCells]],
  * and times both against the full re-train — the claim to verify is
  * append ≪ rebuild with no recall cliff (recall gated in DedupAnnSpec;
  * here we record the wall economics and the drift verdict at scale).
  *
  * Snapshot = vec_id below the split quantile of the corpus at `dir`;
  * batch = the rest (a real appended shard: same distribution, new ids).
  *
  *   sbt "runMain graft.tools.IvfAppendScale /tmp/k1000_emb [batchFrac]"
  */
object IvfAppendScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val batchFrac = if (args.length > 1) args(1).toDouble else 0.01
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val all = graft.Tables.embeddings(spark, dir)
    val n = all.count()
    val cut = all.stat.approxQuantile("vec_id", Array(1.0 - batchFrac), 0.001)(0).toLong
    val tmp = java.nio.file.Files.createTempDirectory("ivf_append_scale").toString
    val snapDir = tmp + "/snap"
    new java.io.File(snapDir).mkdirs()
    all.filter(col("vec_id") < cut).write.parquet(snapDir + "/embeddings.parquet")
    val batch = all.filter(col("vec_id") >= cut).select(col("vec_id"), col("embedding"))
    val nBatch = batch.count()
    println(s"corpus=$n snapshot=${n - nBatch} batch=$nBatch")

    val uri = tmp + "/cells"
    var t0 = System.nanoTime()
    graft.similarity.Ann.materializedCells(spark, snapDir, 2, Some(uri))
      .queryExecution.toRdd.count()
    val buildSec = (System.nanoTime() - t0) / 1e9
    graft.Checkpoints.releaseAll()

    t0 = System.nanoTime()
    val drifted = graft.similarity.Ann.appendCells(spark, batch, uri)
    val appendSec = (System.nanoTime() - t0) / 1e9
    graft.Checkpoints.releaseAll()

    // the drift response for comparison: full re-train over the grown corpus
    t0 = System.nanoTime()
    graft.similarity.Ann.rebuildMaterializedCells(spark, dir, 2, uri)
    val rebuildSec = (System.nanoTime() - t0) / 1e9

    println(f"""{"build_snapshot_sec":$buildSec%.1f,"append_sec":$appendSec%.1f,"rebuild_sec":$rebuildSec%.1f,"batch":$nBatch,"drifted":$drifted}""")
    spark.stop()
  }
}
