package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Schema-drift canary for the events loader (round-8 postmortem).
  *
  * The driver's generator has emitted `events.ts` under two different
  * physical parquet encodings across rounds: TIMESTAMP(NANOS) — which
  * Spark's reader can't decode, so under `nanosAsLong` it surfaces as
  * BIGINT nanoseconds — and plain TIMESTAMP(MICROS), which surfaces as a
  * real TIMESTAMP. Round 8 shipped a loader hard-wired to the first
  * encoding and every events-family query failed analysis when the data
  * flipped to the second. This spec writes a tiny events fixture BOTH ways
  * and asserts `Tables.events` (and a representative query through it)
  * analyzes and produces identical instants against each — it fails if
  * either branch of the loader is removed or hard-wired again.
  */
class SchemaDriftSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  /** (event_id, epoch_micros, user_id, event_type, value, props) — micros
    * chosen non-round so ns→us floor division is exercised non-trivially.
    */
  private val fixtureRows = Seq(
    (1L, 1700000000123456L, 10L, "click", 1.25, """{"k":1}"""),
    (2L, 1700000000123457L, 10L, "error", 2.50, """{"k":2}"""),
    (3L, 1700003600000001L, 11L, "click", 0.75, """{"k":3}"""),
    (4L, 1700007200999999L, 12L, "view", 4.00, """{"k":4}"""))

  /** Writes `<tmp>/events.parquet` with ts as BIGINT nanoseconds — the
    * dtype a NANOS-annotated column surfaces as under `nanosAsLong`.
    */
  private def writeNanosAsLong(): String = {
    val dir = Files.createTempDirectory("graft_drift_ns").toString
    import spark.implicits._
    fixtureRows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), (col("us") * 1000L + 789L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Writes `<tmp>/events.parquet` with ts as a native micros TIMESTAMP —
    * the encoding the round-8 regenerated testdata used.
    */
  private def writeMicrosTimestamp(): String = {
    val dir = Files.createTempDirectory("graft_drift_us").toString
    import spark.implicits._
    fixtureRows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events loader analyzes both ts encodings and yields identical instants") {
    val nsDir = writeNanosAsLong()
    val usDir = writeMicrosTimestamp()

    val fromNs = Tables.events(spark, nsDir)
    val fromUs = Tables.events(spark, usDir)

    // Both branches must surface a plain micros TIMESTAMP column.
    assert(fromNs.schema("ts").dataType == TimestampType)
    assert(fromUs.schema("ts").dataType == TimestampType)

    // The +789 ns tail must floor away: identical epoch-micros per event.
    def instants(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ns = instants(fromNs)
    val us = instants(fromUs)
    assert(ns == us)
    assert(us(1L) == 1700000000123456L)
  }

  test("representative events queries run against both encodings") {
    val nsDir = writeNanosAsLong()
    val usDir = writeMicrosTimestamp()
    for (dir <- Seq(nsDir, usDir)) {
      // scan, filter+projection, and a ts-arithmetic query (date_trunc agg)
      assert(graft.operators.Events.refFullScan(spark, dir).count() == 4)
      val filtered = graft.operators.Events.refFilter(spark, dir).collect()
      assert(filtered.map(_.getLong(0)).toSet == Set(2L))
      val hourly = graft.operators.Events.hourlyAgg(spark, dir)
        .orderBy("hour_epoch", "event_type").collect()
      assert(hourly.map(_.getLong(2)).sum == 4L)
    }
  }

  test("eventsLake reads a directory mixing both ts encodings, pushdown intact") {
    import java.nio.file.{Files => JFiles, Paths}
    val nsDir = writeNanosAsLong()
    val usDir = writeMicrosTimestamp()
    val lake = JFiles.createTempDirectory("graft_lake").toString
    // one physical parquet file per encoding, side by side in one directory
    def copyParts(src: String, tag: String): Unit = {
      val stream = JFiles.list(Paths.get(src, "events.parquet"))
      try stream.iterator().forEachRemaining { p =>
        if (p.getFileName.toString.endsWith(".parquet"))
          JFiles.copy(p, Paths.get(lake, s"$tag-${p.getFileName}"))
      } finally stream.close()
    }
    copyParts(nsDir, "producer-old")
    copyParts(usDir, "producer-new")

    val df = graft.sources.Sources.eventsLake(spark, lake)
    assert(df.schema("ts").dataType == TimestampType)
    // every event appears once per producer file
    assert(df.count() == fixtureRows.size * 2L)
    val perEvent = df.select(col("event_id"), unix_micros(col("ts")))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // both producers' copies normalize to the same instant
    assert(perEvent(1L) == Set(1700000000123456L))

    // a filter on an untouched column reaches the parquet scan of BOTH
    // encoding branches
    val plan = df.filter(col("event_type") === "error")
      .queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[.*event_type.*\\]".r.findAllIn(plan).size
    assert(pushed >= 2, s"expected event_type pushed into both branch scans:\n$plan")
  }

  test("registerAll exposes the normalized events view for both encodings") {
    for (dir <- Seq(writeNanosAsLong(), writeMicrosTimestamp())) {
      Tables.registerAllSubset(spark, dir, Seq("events"))
      val got = spark.sql(
        "SELECT count(*) FROM events WHERE ts >= timestamp_micros(1700000000000000)")
        .collect().head.getLong(0)
      assert(got == 4L)
    }
  }
}
