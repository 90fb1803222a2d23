package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry, Verify}

/** Dev loop helper: dump ONE query's result + oracle SQL so a single
  * operator can be checked against DuckDB without the full Verify sweep.
  *
  *   sbt "runMain graft.tools.DumpOne emb_semdedup /root/testdata/sf0.001 /tmp/one"
  *   python3 tools/check_oracle.py /root/testdata/sf0.001 /tmp/one
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    if (args.length != 3) {
      System.err.println("usage: graft.tools.DumpOne <queryName> <sfDir> <outDir>")
      sys.exit(2)
    }
    val Array(name, sfDir, outDir) = args
    val selected = name.split(',').map { n =>
      n -> SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    }.toMap
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failures = Verify.dumpAll(spark, selected, sfDir, outDir)
    Verify.writeJsonMap(s"$outDir/oracle_sql.json",
      SparkEntry.oracleSql.view.filterKeys(selected.contains).toSeq)
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
