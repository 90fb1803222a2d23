package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump every query; a failing query must leave loud evidence, not
    * silently vanish from the correctness report (round-2 lesson): write
    * `<name>.err` next to the parquet dirs and return the failures (also
    * summarized in errors.json by main). Factored out of main so the
    * failure path itself is unit-testable with a poisoned query map.
    */
  def dumpAll(spark: SparkSession,
      queries: Map[String, (SparkSession, String) => DataFrame],
      sfDir: String, outDir: String): Seq[(String, String)] = {
    new java.io.File(outDir).mkdirs()
    queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${e.getMessage}"
        System.err.println(s"[verify] $name FAILED: $msg")
        Files.writeString(Paths.get(s"$outDir/$name.err"), msg + "\n")
        Some(name -> msg)
      } finally {
        // the dump is complete; drop this query's lineage-cut blocks so
        // 233 sequential queries don't pool their intermediates
        Checkpoints.releaseAll()
      }
    }
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def writeJsonMap(path: String, kvs: Iterable[(String, String)]): Unit =
    Files.writeString(Paths.get(path),
      kvs.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))

  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: graft.Verify <sfDir> <outDir>")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Dev-loop subset filter (mirrors Bench's SPARK_GRAFT_BENCH_ONLY):
    // comma-separated query names; the driver never sets it, so the full
    // dump remains the default contract.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)
    val failures = dumpAll(spark, selected, sfDir, outDir)
    writeJsonMap(s"$outDir/oracle_sql.json", SparkEntry.oracleSql)
    writeJsonMap(s"$outDir/errors.json", failures)
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} quer${if (failures.size == 1) "y" else "ies"} FAILED: ${failures.map(_._1).mkString(", ")}")
    spark.stop()
  }
}
