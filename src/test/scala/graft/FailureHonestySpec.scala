package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Round-2 lesson, pinned as tests: a query that throws must surface as an
  * explicit failure in BOTH the correctness dump (err marker + errors.json)
  * and the bench (failed list, never a timing) — it must not silently
  * vanish from the round's reports.
  */
class FailureHonestySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(2)

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private val poisoned: Map[String, (SparkSession, String) => DataFrame] = Map(
    "good_query" -> ((s, dir) => Tables.documents(s, dir).select("doc_id")),
    "broken_query" -> ((s, dir) =>
      Tables.documents(s, dir).selectExpr("assert_true(doc_id < 0) as boom", "doc_id")))

  test("Verify.dumpAll leaves an err marker and reports the broken query") {
    val out = Files.createTempDirectory("verify_honesty").toString
    val failures = Verify.dumpAll(spark, poisoned, sf, out)
    assert(failures.map(_._1) == Seq("broken_query"), failures.toString)
    assert(Files.exists(Paths.get(s"$out/broken_query.err")), "err marker missing")
    assert(Files.exists(Paths.get(s"$out/good_query")), "good query parquet missing")
    Verify.writeJsonMap(s"$out/errors.json", failures)
    val json = Files.readString(Paths.get(s"$out/errors.json"))
    assert(json.contains("broken_query"), json)
  }

  test("Bench.timeAll records the broken query as failed, never as a timing") {
    val results = Bench.timeAll(spark, poisoned, sf, samples = 1, maxSamples = 2)
    val byName = results.map(r => r.name -> r).toMap
    val broken = byName("broken_query")
    assert(broken.failed && broken.timings.isEmpty,
      s"broken query must have no timings: $broken")
    assert(broken.error.isDefined, "broken query must carry its error")
    assert(broken.attempts >= 1, "attempt count must reflect real attempts")
    val good = byName("good_query")
    assert(good.timings.nonEmpty && good.error.isEmpty && !good.flaky,
      s"good query must time cleanly: $good")
    assert(good.attempts == good.timings.size, "clean query: attempts == timings")
  }

  test("Bench.jcompact emits short valid JSON numbers at every magnitude") {
    val cases = Seq(
      0.0 -> "0", 0.0004 -> "0", 0.013 -> "0.013", 0.1 -> "0.1",
      0.104 -> "0.104", 1.0 -> "1", 6.164 -> "6.16", 16.009 -> "16",
      123.4 -> "123", Double.NaN -> "0")
    cases.foreach { case (in, want) =>
      assert(Bench.jcompact(in) == want, s"jcompact($in)")
    }
    // every output must be ≤6 chars for sub-100s values — the stdout line
    // budget (driver tail window = 2000 chars) depends on it
    Seq(0.001, 0.0999, 0.9994, 9.99, 99.9).foreach { d =>
      assert(Bench.jcompact(d).length <= 6, s"jcompact($d) too long")
    }
  }

  test("Bench stdout line fits the driver's 2000-char tail capture") {
    // Rounds 1-3 shipped a ~4 KB line whose head was truncated by the
    // driver's tail window, leaving NO parseable bench numbers. Pin the
    // budget against the LIVE query set at pessimistic timings so adding
    // operators can never silently regrow the line past the window.
    val worst = SparkEntry.queries.keys.toSeq.sorted.map(n =>
      Bench.QueryResult(n, Seq(99.949), 6, None))
    val cc = """{"ref_aggregation":99.9,"ref_filter":99.9,"ref_full_scan":99.9}"""
    val tp = """{"rows_per_sec":99999999,"scan_rows":999999999,"iterations":5}"""
    val line = Bench.stdoutLine(worst, Nil, Nil, cc, tp, "/root/testdata/sf0.1")
    assert(line.length <= 1500,
      s"stdout line ${line.length} chars — too close to the 2000-char capture window")
    // and it must be valid single-line JSON
    assert(!line.contains("\n") && line.startsWith("{\"metric\"") && line.endsWith("}"))
  }
}
