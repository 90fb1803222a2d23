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
    val byName = results.map(r => r._1 -> r).toMap
    val (_, brokenTimes, brokenErr) = byName("broken_query")
    assert(brokenTimes.isEmpty, s"broken query must have no timings: $brokenTimes")
    assert(brokenErr.isDefined, "broken query must carry its error")
    val (_, goodTimes, goodErr) = byName("good_query")
    assert(goodTimes.nonEmpty && goodErr.isEmpty, s"good query must time cleanly: $goodTimes $goodErr")
  }
}
