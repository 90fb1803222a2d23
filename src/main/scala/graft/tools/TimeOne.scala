package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Dev loop helper: time ONE query (3 runs) at a given SF dir without the
  * full Bench sweep.
  *
  *   sbt "runMain graft.tools.TimeOne graph_pagerank /root/testdata/sf0.1"
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.tools.TimeOne <queryName>[,<name2>...] <sfDir> [runs]")
      sys.exit(2)
    }
    val names = args(0).split(",").toSeq
    val sfDir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val q = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        val n = q(spark, sfDir).count()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        graft.Checkpoints.releaseAll() // don't pool lineage-cut blocks across runs
      }
    }
    spark.stop()
  }
}
