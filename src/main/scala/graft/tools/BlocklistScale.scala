package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Blocklist term-count scaling check (round 16 — r15 verdict item 4):
  * production blocklists run to tens of thousands of terms (slur lists,
  * spam URL fragments), so per-token membership must be O(1), not
  * O(|terms|). Catalyst's OptimizeIn rewrites the `isin` to an InSet
  * hash set above the conversion threshold; this tool proves the wall
  * cost is flat by timing the same corpus scan at 3 terms vs 50,000.
  *
  *   sbt "runMain graft.tools.BlocklistScale /root/testdata/sf0.1"
  */
object BlocklistScale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)

    // 50k synthetic terms none of which occur, plus the 3 real ones so
    // both runs produce identical output rows — the delta is pure
    // membership cost
    val small = Seq("slow", "stream", "vector")
    val big = small ++ (0 until 50000).map(i => f"zqxterm$i%05d")

    def time(label: String, terms: Seq[String]): Unit = {
      // warm once (scan cache, codegen), then two measured runs
      graft.textanalysis.Text.blocklistOf(docs, terms)
        .queryExecution.toRdd.count()
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = graft.textanalysis.Text.blocklistOf(docs, terms)
          .queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"""{"terms":"$label","sec_min":${secs.map(_._1).min}%.3f,"rows":${secs.head._2}}""")
    }
    time("3", small)
    time("50003", big)
    spark.stop()
  }
}
