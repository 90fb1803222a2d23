package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Band-family economics for MinHash-LSH (round 16 — r15 verdict item 7):
  * the standing designed-miss caveat is (1−j⁴)¹⁶ ≈ 2e-4/pair at j=0.8
  * with 16 bands; a second independent family (permutations 64..127 of
  * the same Carter–Wegman construction, i.e. 32 bands over a 128-perm
  * signature) squares the miss to ~4e-8 at ~2× the candidate volume.
  * This times the full verified-pair pipeline at both widths over a
  * corpus-scale documents dir so the keep/close decision is measured.
  *
  *   sbt "runMain graft.tools.MinhashBandsScale /tmp/k1000_docs"
  */
object MinhashBandsScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(bands: Int): Unit = {
      val t0 = System.nanoTime()
      val pairs = graft.dedup.Dedup
        .minhashVerifiedPairs(spark, dir, 0.8, nBands = bands)
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"bands":$bands,"sec":$secs%.1f,"verified_pairs":$pairs}""")
      graft.Checkpoints.releaseAll()
    }
    run(16)
    run(32)
    spark.stop()
  }
}
