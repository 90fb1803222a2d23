package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, explode, expr, row_number, size}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(2)

  override def afterAll(): Unit = spark.stop()

  // offset from epoch: a row with event time == initial watermark (0) would
  // be dropped as late data
  private def ts(minutes: Long): Timestamp = new Timestamp(86400000L + minutes * 60000L)

  test("streaming hourly agg matches batch result on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val events = Seq(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0),
      Event(4, ts(70), 2, "click", 4.0))
    input.addData(events: _*)
    val q = EventStreams.hourlyAgg(input.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("update").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly")
        .select($"hour_start", $"event_type", $"n_events", $"total_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val want = Set(
        (ts(0), "click", 2L, 3.0),
        (ts(60), "view", 1L, 3.0),
        (ts(60), "click", 1L, 4.0))
      assert(got == want)
    } finally q.stop()
  }

  test("streaming dedup drops replayed events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    try {
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 1.0))
      q.processAllAvailable()
      // replay event 1 (same id), plus a new one
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(3, ts(2), 2, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 3)
    } finally q.stop()
  }

  test("stream-stream join attributes purchases to clicks within 30 min") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.clickAttribution(input.toDF())
      .writeStream.format("memory").queryName("attributed").outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 0.0),
        Event(2, ts(10), 1, "purchase", 99.0),   // within 30 min of click 1
        Event(3, ts(50), 1, "purchase", 11.0),   // outside the window
        Event(4, ts(5), 2, "purchase", 7.0))     // different user, no click
      q.processAllAvailable()
      // advance watermark so joinable results flush
      input.addData(Event(9, ts(300), 3, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("attributed")
        .select($"click_id", $"purchase_id", $"value")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((1L, 2L, 99.0)))
    } finally q.stop()
  }

  test("windowed agg state survives a checkpointed restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val input = MemoryStream[Event]
    def start() = EventStreams.hourlyAgg(input.toDF())
      .writeStream.format("memory").queryName("restartable")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      input.addData(Event(1, ts(5), 1, "click", 1.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the checkpoint: the window's running count must resume
    val q2 = start()
    try {
      input.addData(Event(2, ts(10), 2, "click", 1.0))
      q2.processAllAvailable()
      val n = spark.table("restartable")
        .filter($"event_type" === "click" && $"hour_start" === ts(0))
        .select($"n_events").as[Long].collect()
      assert(n.toSeq == Seq(2L), s"state lost across restart: $n")
    } finally q2.stop()
  }

  test("streaming curation: dedup + quality + lang gates, windowed audit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    val input = MemoryStream[Doc]
    val q = DocStreams.curate(input.toDF())
      .writeStream.format("memory").queryName("curated").outputMode("append").start()
    try {
      val good = Array.fill(30)("token").mkString(" ") // 30 tokens: q_score 0.65
      input.addData(
        Doc(1, ts(5), good, "en"),
        Doc(2, ts(6), good, "en"),          // exact dup of doc 1 -> dropped
        Doc(3, ts(7), "too short", "en"),   // 2 tokens: q_score 0.51 -> dropped
        Doc(4, ts(8), good + " es", "xx"),  // unsupported lang -> dropped
        Doc(5, ts(9), good + " v2 mail@example.com", "fr")) // kept + scrubbed
      q.processAllAvailable()
      // push the watermark past the window end so the windowed agg emits
      input.addData(Doc(99, ts(600), good + " late", "en"))
      q.processAllAvailable()
      val got = spark.table("curated")
        .select($"hour_start", $"lang", $"n_kept", $"n_redacted")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      // the fr doc carries an email -> scrubbed in-stream, counted redacted
      assert(got == Set((ts(0), "en", 1L, 0L), (ts(0), "fr", 1L, 1L)), got.toString)
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched clicks after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.clickAttributionOuter(input.toDF())
      .writeStream.format("memory").queryName("attr_outer").outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(5), 1, "click", 0.0),
        Event(2, ts(10), 1, "purchase", 9.0), // within 30 min of click 1
        Event(3, ts(6), 2, "click", 0.0))     // never purchases
      q.processAllAvailable()
      // the unmatched click null-emits only once the GLOBAL watermark
      // (min of both sides under the default multipleWatermarkPolicy)
      // passes click_ts + 30min: each side's watermark advances from rows
      // flowing through ITS withWatermark node, so BOTH a late click and a
      // late purchase are needed, and the null row surfaces one micro-batch
      // after the advancing batch (eviction runs on the next trigger)
      input.addData(
        Event(98, ts(600), 8, "click", 0.0),
        Event(99, ts(600), 9, "purchase", 0.0))
      q.processAllAvailable()
      input.addData(
        Event(100, ts(601), 8, "click", 0.0),
        Event(101, ts(601), 9, "purchase", 0.0))
      q.processAllAvailable()
      val got = spark.table("attr_outer")
        .select($"user_id", $"click_id", $"purchase_id")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(got == Set((1L, 1L, 2L), (2L, 3L, -1L)), got.toString)
    } finally q.stop()
  }

  test("stream-static enrichment joins the batch dimension per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val customers = Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("c_custkey", "c_nationkey")
    val q = EventStreams.enrich(input.toDF(), customers)
      .writeStream.format("memory").queryName("enriched").outputMode("complete").start()
    try {
      input.addData(
        Event(1, ts(1), 1, "click", 1.0),
        Event(2, ts(2), 2, "click", 2.0),
        Event(3, ts(3), 3, "view", 4.0),
        Event(4, ts(4), 99, "view", 8.0)) // no matching customer -> dropped
      q.processAllAvailable()
      val got = spark.table("enriched")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((10L, 2L, 3.0), (20L, 1L, 4.0)), got.toString)
      // second batch re-joins the same static side incrementally
      input.addData(Event(5, ts(5), 3, "view", 1.0))
      q.processAllAvailable()
      val got2 = spark.table("enriched").as[(Long, Long, Double)].collect().toSet
      assert(got2 == Set((10L, 2L, 3.0), (20L, 2L, 5.0)), got2.toString)
    } finally q.stop()
  }

  test("foreachBatch idempotent sink skips replayed batch ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("idem_sink").toString
    val input = MemoryStream[Event]
    val q = input.toDF().writeStream
      .foreachBatch(EventStreams.idempotentParquetSink(base) _)
      .option("checkpointLocation", s"$base/_ckpt")
      .start()
    try {
      input.addData(Event(1, ts(1), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(2, ts(2), 2, "view", 2.0))
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$base/batch=0", s"$base/batch=1").count()
      assert(rows == 2, s"expected both batches written, got $rows")
      // replaying an already-written batch id must be a no-op, not a dup
      EventStreams.idempotentParquetSink(base)(
        Seq(Event(9, ts(9), 9, "dup", 9.0)).toDF(), 0L)
      val after = spark.read.parquet(s"$base/batch=0").count()
      assert(after == 1, s"replayed batch must not duplicate rows: $after")
    } finally q.stop()
  }

  test("streaming sessionization closes sessions across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // batch 1: user 1 has two events 10 min apart (one session)
      input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "view", 1.0))
      q.processAllAvailable()
      // batch 2: user 1 comes back 90 min later -> closes session 1
      input.addData(Event(3, ts(100), 1, "click", 1.0))
      q.processAllAvailable()
      // batch 3: push watermark far forward so session 2 times out
      input.addData(Event(4, ts(500), 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(5, ts(1000), 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(6, ts(1500), 2, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .as[EventStreams.Session].collect().filter(_.user_id == 1L)
        .sortBy(_.start_us)
      assert(got.length == 2)
      assert(got(0).start_us == 86400000000L)
      assert(got(0).n_events == 2 && got(0).duration_us == 10L * 60 * 1000000)
      assert(got(1).n_events == 1 && got(1).duration_us == 0L)
    } finally q.stop()
  }

  test("streaming funnel advances stages in order and enforces the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // 60-min stage window so the test data stays readable
    val q = EventStreams.funnelStream(input.toDS(), windowUs = 3600000000L)
      .writeStream.format("memory").queryName("funnel").outputMode("append").start()
    try {
      // batch 1, deliberately out of arrival order: click@20 arrives before
      // view@10 — event-time sorting inside the batch must fix the order.
      // user 3 clicks with no prior view: no advance.
      input.addData(
        Event(1, ts(20), 1, "click", 1.0),
        Event(2, ts(10), 1, "view", 1.0),
        Event(3, ts(15), 2, "view", 1.0),
        Event(4, ts(30), 3, "click", 1.0))
      q.processAllAvailable()
      // batch 2: user 1 purchases 30 min after the click (inside window);
      // user 2 clicks 85 min after the view (outside window -> no advance)
      input.addData(
        Event(5, ts(50), 1, "purchase", 5.0),
        Event(6, ts(100), 2, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("funnel").as[EventStreams.StageAdvance]
        .collect().map(a => (a.user_id, a.stage, a.at_us)).toSet
      def us(m: Long): Long = (86400000L + m * 60000L) * 1000L
      val want = Set(
        (1L, "view", us(10)), (1L, "click", us(20)), (1L, "purchase", us(50)),
        (2L, "view", us(15)))
      assert(got == want, s"got $got")
    } finally q.stop()
  }

  test("native session_window agg equals the flatMapGroupsWithState sessionizer") {
    // Two formulations of the same semantics — the declarative
    // session_window operator and the custom-state sessionizer — must
    // close identical sessions on the real sf0.001 events. Checked on
    // (user, start, n_events): the declarative window's `end` includes
    // the gap padding, the custom one reports last-event time, so
    // duration is compared via start+n only.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf0 = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val sentinel = EventStreams.Event(-1L,
      new java.sql.Timestamp(ev.map(_.ts.getTime).max + 30L * 86400000L), -1L, "view", 0.0)
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionWindowAgg(input.toDF())
      .writeStream.format("memory").queryName("sess_native").outputMode("append").start()
    try {
      input.addData(ev.toSeq); q.processAllAvailable()
      input.addData(sentinel); q.processAllAvailable()
      val got = spark.table("sess_native").filter($"user_id" >= 0)
        .select($"user_id", $"start_ts", $"n_events")
        .as[(Long, Timestamp, Long)].collect()
        .map { case (u, st, n) => (u, EventStreams.tsUs(st), n) }.toSet
      val want = graft.operators.Events.sessionize(spark, sf0)
        .select(col("user_id"), col("start_us"), col("n_events"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got.nonEmpty && got == want,
        s"native/custom diverged: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    } finally q.stop()
  }

  test("sliding windows: every event lands in exactly windowDuration/slide windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val events = Seq(
      Event(1, ts(1), 1, "click", 1.0),
      Event(2, ts(7), 1, "click", 1.0),
      Event(3, ts(12), 2, "view", 1.0),
      Event(4, ts(31), 2, "click", 1.0))
    input.addData(events: _*)
    val q = EventStreams.slidingAgg(input.toDF())
      .writeStream.format("memory").queryName("sliding").outputMode("update").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sliding")
        .select($"win_start", $"event_type", $"n_events")
        .as[(Timestamp, String, Long)].collect()
      // 10-min windows hopping every 5: each event is counted twice
      assert(rows.map(_._3).sum == 2L * events.length,
        s"conservation broken: ${rows.mkString(", ")}")
      // window starts align to the 5-minute grid
      assert(rows.forall(_._1.getTime % 300000L == 0))
    } finally q.stop()
  }

  test("chained window agg rolls hourly counts into a daily max in one query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // hour 0: 3 clicks; hour 1: 1 click; next day hour 0: 2 clicks
    val events = Seq(
      Event(1, ts(5), 1, "click", 1.0), Event(2, ts(10), 1, "click", 1.0),
      Event(3, ts(20), 2, "click", 1.0), Event(4, ts(70), 2, "click", 1.0),
      Event(5, ts(1445), 3, "click", 1.0), Event(6, ts(1450), 3, "click", 1.0))
    input.addData(events: _*)
    // sentinel far past the watermark so both tiers finalize
    input.addData(Event(9, ts(10000), 9, "view", 0.0))
    val q = EventStreams.chainedWindowAgg(input.toDF())
      .writeStream.format("memory").queryName("chained").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("chained").filter($"event_type" === "click")
        .select($"day_start", $"max_hourly").as[(Timestamp, Long)].collect().toMap
      val day0 = new Timestamp(86400000L)
      val day1 = new Timestamp(2 * 86400000L)
      assert(got.get(day0).contains(3L) && got.get(day1).contains(2L),
        s"expected day0 max 3, day1 max 2; got $got")
    } finally q.stop()
  }

  test("streaming sessionize equals batch sessionize on the real events table") {
    // The "mirror" claim, verified end-to-end: the stateful streaming
    // sessionizer fed the REAL sf0.001 events (in timestamp order, three
    // micro-batches) must close exactly the sessions the batch
    // gaps-and-islands operator computes. A far-future sentinel advances
    // the global watermark so every in-flight session times out; the
    // sentinel's own user is excluded from the comparison.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf0 = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val sentinel = EventStreams.Event(-1L,
      new java.sql.Timestamp(ev.map(_.ts.getTime).max + 30L * 86400000L), -1L, "view", 0.0)
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_eq").outputMode("append").start()
    try {
      ev.grouped(ev.length / 3 + 1).foreach { ch =>
        input.addData(ch.toSeq); q.processAllAvailable()
      }
      input.addData(sentinel); q.processAllAvailable()
      val got = spark.table("sess_eq").as[EventStreams.Session].collect()
        .filter(_.user_id >= 0)
        .map(s => (s.user_id, s.start_us, s.n_events.toLong, s.duration_us)).toSet
      val want = graft.operators.Events.sessionize(spark, sf0)
        .select(col("user_id"), col("start_us"), col("n_events"), col("duration_us"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got.nonEmpty && got == want,
        s"stream/batch diverged: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    } finally q.stop()
  }

  test("transformWithState burst detector flags each breaching (user, minute) once") {
    // transformWithState runs only on the RocksDB state store provider
    // (the production backend) — set it for this query, restore after
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = EventStreams.burstStream(input.toDS(), maxPerMinute = 10)
      .writeStream.format("memory").queryName("bursts").outputMode("append").start()
    try {
      var id = 0L
      def ev(user: Long, minute: Long, second: Long): Event = {
        id += 1
        Event(id, new Timestamp(86400000L + minute * 60000L + second * 1000L),
          user, "view", 1.0)
      }
      // user 1: 12 events in minute 0 (burst, flagged at event #11);
      // user 2: 5 events in minute 0 (quiet);
      // batch 2 — user 1: 11 events in minute 2 (second burst)
      input.addData((1L to 12L).map(s => ev(1, 0, s % 60)) ++ (1L to 5L).map(s => ev(2, 0, s)): _*)
      q.processAllAvailable()
      input.addData((1L to 11L).map(s => ev(1, 2, s % 60)): _*)
      q.processAllAvailable()
      val got = spark.table("bursts").as[EventStreams.Burst]
        .collect().map(b => (b.user_id, b.minute_epoch, b.n_events)).toSet
      val base = 86400L
      assert(got == Set((1L, base, 11L), (1L, base + 120L, 11L)),
        s"expected exactly the two crossings: $got")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState MapState milestone detector equals a reference fold on real events") {
    // Unordered-completion mirror claim: feeding the REAL sf0.001 events
    // through milestoneStream (MapState, RocksDB provider) must emit
    // exactly the milestones a sequential reference fold over the same
    // (ts, event_id)-ordered stream produces — one row per user, at the
    // event that supplied the last missing step.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val sf0 = "/root/testdata/sf0.001"
    val steps = Seq("signup", "view", "purchase")
    val ev = Tables.events(spark, sf0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event].collect()
      .sortBy(e => (EventStreams.tsUs(e.ts), e.event_id))
    // reference fold with the operator's exact semantics
    val counts = scala.collection.mutable.Map[Long, Map[String, Long]]()
    val want = scala.collection.mutable.ListBuffer[(Long, Long, Long)]()
    ev.foreach { e =>
      if (steps.contains(e.event_type)) {
        val m = counts.getOrElse(e.user_id, Map.empty)
        if (!m.contains("done")) {
          val m2 = m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
          counts(e.user_id) =
            if (m.getOrElse(e.event_type, 0L) == 0L && steps.forall(m2.contains)) {
              want += ((e.user_id, EventStreams.tsUs(e.ts), steps.map(m2).sum))
              m2.updated("done", 1L)
            } else m2
        }
      }
    }
    val input = MemoryStream[Event]
    val q = EventStreams.milestoneStream(input.toDS(), steps)
      .writeStream.format("memory").queryName("milestones").outputMode("append").start()
    try {
      ev.grouped(ev.length / 3 + 1).foreach { ch =>
        input.addData(ch.toSeq); q.processAllAvailable()
      }
      val got = spark.table("milestones").as[EventStreams.Milestone]
        .collect().map(m => (m.user_id, m.completed_us, m.n_tracked_events)).toSet
      assert(got.nonEmpty && got == want.toSet,
        s"stream/fold diverged: missing=${(want.toSet -- got).take(5)} extra=${(got -- want.toSet).take(5)}")
      // close the triangle: the batch q_milestone operator agrees too
      val batch = graft.operators.Events.milestones(spark, sf0)
        .as[(Long, Long)].collect().toSet
      assert(batch == got.map(m => (m._1, m._2)),
        s"batch/stream diverged: ${batch.diff(got.map(m => (m._1, m._2))).take(5)}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState ListState captures the 3 events preceding each error") {
    // breadcrumbs survive micro-batch boundaries: the error in batch 2
    // must see context from batch 1, trimmed to the latest 3
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = EventStreams.errorContextStream(input.toDS())
      .writeStream.format("memory").queryName("errctx").outputMode("append").start()
    try {
      def ev(id: Long, tpe: String) =
        Event(id, new Timestamp(86400000L + id * 1000L), 1L, tpe, 1.0)
      input.addData(ev(1, "view"), ev(2, "click"), ev(3, "view"), ev(4, "click"))
      q.processAllAvailable()
      input.addData(ev(5, "error"), ev(6, "view"), ev(7, "error"))
      q.processAllAvailable()
      val got = spark.table("errctx").as[EventStreams.ErrorContext]
        .collect().map(c => (c.error_event_id, c.context_ids.toList)).toMap
      assert(got == Map(5L -> List(2L, 3L, 4L), 7L -> List(4L, 5L, 6L)),
        s"contexts wrong: $got")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState event-time timer fires the dormancy alert exactly once") {
    // user 1 goes quiet at t0 (1h quiet window → deadline t0+60m);
    // user 2 stays active until t0+55m (deadline t0+115m);
    // a t0+2h event advances the watermark to t0+110m (10m delay), so
    // exactly user 1's timer fires — by the state store's timer
    // machinery, with no user-1 traffic in any later batch.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    val q = EventStreams.dormancyStream(input.toDS(), quietUs = 3600L * 1000000L)
      .writeStream.format("memory").queryName("dormant").outputMode("append").start()
    try {
      val t0 = 86400000L
      def ev(id: Long, user: Long, offsetMin: Long) =
        Event(id, new Timestamp(t0 + offsetMin * 60000L), user, "view", 1.0)
      input.addData(ev(1, 1, 0), ev(2, 2, 0))
      q.processAllAvailable()
      input.addData(ev(3, 2, 30), ev(4, 2, 55))
      q.processAllAvailable()
      input.addData(ev(5, 3, 120))
      q.processAllAvailable()
      // one more batch so timers registered before the watermark moved fire
      input.addData(ev(6, 3, 121))
      q.processAllAvailable()
      val got = spark.table("dormant").as[EventStreams.Dormant]
        .collect().map(d => (d.user_id, d.last_seen_us)).toSet
      assert(got == Set((1L, t0 * 1000L)),
        s"expected exactly user 1 dormant at t0: $got")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState OHLC bars equal the batch computation, late-but-in-watermark rows included") {
    // Two hours of ticks, delivered OUT of order within the watermark:
    // the bar's open/close must follow EVENT time (ts, event_id), not
    // arrival order. Hour 0's bar closes when the watermark passes its
    // end; hour 1 stays open (no emission) until a late sentinel pushes
    // the watermark past it.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Event]
    // 1h watermark delay: the test delivers rows up to ~40 min out of
    // order ACROSS batches; they must stay inside the watermark or the
    // dedup-at-source semantics would (correctly) drop them as late
    val q = EventStreams.ohlcStream(input.toDS(), delay = "1 hour")
      .writeStream.format("memory").queryName("bars").outputMode("append").start()
    try {
      val t0 = 86400000L // hour-aligned epoch ms
      def ev(id: Long, offsetMin: Long, v: Double) =
        Event(id, new Timestamp(t0 + offsetMin * 60000L), 1, "tick", v)
      // hour 0: true order is id 1 (min 5, v=3.0 open), 2 (min 20, 9.0),
      // 3 (min 50, 1.5), 4 (min 59, 4.0 close) — delivered shuffled,
      // event 2 arriving a full batch after event 4
      input.addData(ev(3, 50, 1.5), ev(1, 5, 3.0))
      q.processAllAvailable()
      input.addData(ev(4, 59, 4.0), ev(2, 20, 9.0))
      q.processAllAvailable()
      assert(spark.table("bars").isEmpty, "no bar may emit before its hour closes")
      // hour 1 ticks (watermark still below hour 0's end: 82−60 < 60)
      input.addData(ev(5, 75, 2.0), ev(6, 80, 7.0), ev(7, 82, 5.0))
      q.processAllAvailable()
      assert(spark.table("bars").isEmpty, "watermark has not passed hour 0 yet")
      // sentinel at min 125 → watermark 65 min: hour 0 closes, hour 1 not
      input.addData(ev(98, 125, 1.0))
      q.processAllAvailable()
      input.addData(ev(99, 126, 1.0)) // extra batch so registered timers fire
      q.processAllAvailable()
      val bars1 = spark.table("bars").as[EventStreams.Bar].collect()
      assert(bars1.map(_.hour_epoch).toSeq == Seq(t0 / 1000L),
        s"exactly hour 0 must have closed: ${bars1.toSeq}")
      val b0 = bars1.head
      assert(b0.n_events == 4 && b0.open_micro == 3000000L &&
        b0.close_micro == 4000000L && b0.high_micro == 9000000L &&
        b0.low_micro == 1500000L && b0.volume_micro == 17500000L, s"$b0")
      // sentinel far ahead (min 200 → watermark 140) closes hour 1
      input.addData(ev(100, 200, 1.0))
      q.processAllAvailable()
      input.addData(ev(101, 201, 1.0))
      q.processAllAvailable()
      val bars2 = spark.table("bars").as[EventStreams.Bar].collect()
        .map(b => b.hour_epoch -> b).toMap
      val b1 = bars2(t0 / 1000L + 3600L)
      assert(b1.n_events == 3 && b1.open_micro == 2000000L &&
        b1.close_micro == 5000000L && b1.high_micro == 7000000L &&
        b1.low_micro == 2000000L, s"$b1")
      // batch ≡ stream: the same rows through the q_ohlc aggregation
      // logic give the same closed bars
      val allEvents = Seq(
        ev(3, 50, 1.5), ev(1, 5, 3.0), ev(4, 59, 4.0), ev(2, 20, 9.0),
        ev(5, 75, 2.0), ev(6, 80, 7.0), ev(7, 82, 5.0)).toDS()
      import org.apache.spark.sql.functions.{date_trunc, round, unix_micros, unix_timestamp}
      val batch = allEvents
        .select(unix_timestamp(date_trunc("hour", col("ts"))).as("h"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"),
          round(col("value") * 1000000.0).cast("long").as("vq"))
        .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
      batch.foreach { case (h, es) =>
        if (bars2.contains(h)) {
          val sorted = es.sortBy(e => (e._2, e._3))
          val b = bars2(h)
          assert(b.n_events == es.length && b.open_micro == sorted.head._4 &&
            b.close_micro == sorted.last._4 &&
            b.high_micro == es.map(_._4).max && b.low_micro == es.map(_._4).min,
            s"batch/stream divergence at hour $h: $b vs ${sorted.toSeq}")
        }
      }
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming anomaly flags the burst hour and only it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.anomalyStream(input.toDS())
      .writeStream.format("memory").queryName("anomaly").outputMode("append").start()
    try {
      // 6 steady hours of 2 events each for type "a"
      var id = 0L
      def ev(hour: Long, minute: Long): Event = {
        id += 1; Event(id, ts(hour * 60 + minute), 1, "a", 1.0)
      }
      input.addData((0L until 6L).flatMap(h => Seq(ev(h, 5), ev(h, 35))): _*)
      q.processAllAvailable()
      // hour 6 bursts to 14 events; hour 7 closes it
      input.addData((0L until 14L).map(m => ev(6, m)): _*)
      input.addData(ev(7, 5), ev(7, 35))
      q.processAllAvailable()
      val got = spark.table("anomaly").as[EventStreams.HourAnomaly]
        .collect().map(a => (a.event_type, a.hour_epoch, a.n_events, a.n_hours)).toSet
      // bucket epoch of test-hour h: (86400000 ms + h*3600000 ms) / 1000
      val burstEpoch = 86400L + 6L * 3600L
      // the burst hour closes against moments over hours 0-5 (n=6, all 2s):
      // (14*6 - 12)^2 = 5184 > 9*(24*6 - 144) = 0 -> flagged; steady hours
      // never deviate (x=2=mean, lhs=0) and the in-flight hour 7 stays open
      assert(got == Set(("a", burstEpoch, 14L, 6L)), s"got $got")
    } finally q.stop()
  }

  test("transformWithState state stays O(keys) at 1M events (RocksDB metrics)") {
    // The 100 TB-stream analogue of the batch scale guards (r10 verdict
    // #8): a stateful stream is only production-viable if state grows
    // with DISTINCT KEYS, not stream length. Push 1M events from 10k
    // users through the RocksDB-backed burst detector across multiple
    // micro-batches and assert — from the state-store METRICS, not the
    // code's intent — that the store holds exactly one row per user and
    // its on-disk footprint is key-bounded.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val nUsers = 10000L
    val perBatch = 250000L
    val nBatches = 4
    val input = MemoryStream[Event]
    val q = EventStreams.burstStream(input.toDS(), maxPerMinute = 1000000)
      .writeStream.format("memory").queryName("state_scale")
      .outputMode("append").start()
    try {
      var id = 0L
      for (b <- 0 until nBatches) {
        // users round-robin within each batch; event time advances one
        // minute per batch so the per-user (minute, count) pair is
        // OVERWRITTEN, never appended — the bounded-state contract
        val batch = (0L until perBatch).map { i =>
          id += 1
          Event(id, new Timestamp(86400000L + b * 60000L + (i % 50) * 1000L),
            i % nUsers, "view", 1.0)
        }
        input.addData(batch: _*)
        q.processAllAvailable()
      }
      val so = q.recentProgress.flatMap(p => p.stateOperators).lastOption
        .getOrElse(fail("no stateOperators progress reported"))
      assert(so.numRowsTotal == nUsers,
        s"state rows ${so.numRowsTotal} != distinct users $nUsers " +
          s"after ${nBatches * perBatch} events — state is not O(keys)")
      // RocksDB's own accounting: total SST + memtable footprint must be
      // key-scale (10k tiny rows), nowhere near event-scale. 32 MB is
      // ~3 KB/user of slack — a per-event leak at 1M events x ~24 B/row
      // would blow through it even before compaction.
      val sst = Option(so.customMetrics.get("rocksdbSstFileSize"))
        .map(_.longValue).getOrElse(0L)
      val mem = Option(so.customMetrics.get("rocksdbMemoryUsageBytes"))
        .map(_.longValue).getOrElse(0L)
      assert(sst + mem > 0L, "RocksDB metrics absent — wrong provider?")
      assert(sst + mem < 32L * 1024 * 1024,
        s"state footprint ${sst + mem} B is not key-bounded (sst=$sst mem=$mem)")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming banded near-dup reproduces batch incremental through the identical verify") {
    // r14 verdict item 4: the batch family has MinHash/SimHash/incremental
    // near-dedup; the stream only mirrored exact/BoW. BandKeeper holds one
    // bounded doc_id list per (band, bandhash) bucket; an arriving doc
    // emits candidates against every strictly earlier bucket member. With
    // the REAL sf0.001 documents' corpus side streamed first and the batch
    // side after, the cross-side candidate pairs fed through the batch
    // path's exact-Jaccard verify must reproduce Dedup.incremental's
    // output row-for-row — and state must stay O(band buckets), never
    // O(arrivals²) or O(text).
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.{BandCand, Doc}
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val sf = "/root/testdata/sf0.001"
    val sideRows = Tables.documents(spark, sf)
      .select($"doc_id",
        (graft.functions.Portable.md5Byte0($"doc_id") < 64).as("is_batch"),
        $"text", $"lang")
      .as[(Long, Boolean, String, String)].collect().sortBy(_._1)
    val corpusDocs = sideRows.filter(!_._2).map(d => Doc(d._1, ts(d._1), d._3, d._4))
    val batchDocs = sideRows.filter(_._2).map(d => Doc(d._1, ts(d._1), d._3, d._4))
    val batchIds = batchDocs.map(_.doc_id).toSet
    val corpusIds = corpusDocs.map(_.doc_id).toSet
    val input = MemoryStream[Doc]
    val q = DocStreams.bandCandidatesStream(input.toDS())
      .writeStream.format("memory").queryName("band_cands")
      .outputMode("append").start()
    try {
      // corpus arrives first (two micro-batches — cross-batch state reuse),
      // then the new batch in one micro-batch, like a daily increment
      corpusDocs.grouped(math.max(1, corpusDocs.length / 2 + 1)).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      input.addData(batchDocs: _*)
      q.processAllAvailable()
      val cands = spark.table("band_cands").as[BandCand].collect()
      // replay the corpus: the contains-guard must add nothing
      input.addData(corpusDocs.take(40): _*)
      q.processAllAvailable()
      assert(spark.table("band_cands").count() == cands.length,
        "replayed docs re-emitted candidates")
      // cross-side candidates through the batch path's EXACT verify
      val cross = cands.collect {
        case BandCand(n, o) if batchIds(n) && corpusIds(o) => (n, o)
      }.distinct.toSeq
      val docsM = graft.dedup.Dedup.withMinhash(Tables.documents(spark, sf))
        .select($"doc_id", $"gh")
      val verified = cross.toDF("batch_id", "corpus_id")
        .join(docsM.select($"doc_id".as("batch_id"), $"gh".as("gh_a")), "batch_id")
        .join(docsM.select($"doc_id".as("corpus_id"), $"gh".as("gh_b")), "corpus_id")
        .withColumn("inter", graft.functions.native.sortedIntersectCount($"gh_a", $"gh_b"))
        .select($"batch_id", $"corpus_id", ($"inter".cast("double") /
          (size($"gh_a") + size($"gh_b") - $"inter")).as("jaccard"))
        .filter($"jaccard" >= 0.8)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"batch_id").orderBy($"jaccard".desc, $"corpus_id")
      val best = verified.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1).drop("rn")
      val got = batchIds.toSeq.toDF("batch_id")
        .join(best, Seq("batch_id"), "left")
        .select($"batch_id", $"corpus_id", $"jaccard")
        .as[(Long, Option[Long], Option[Double])].collect().toSet
      val want = graft.dedup.Dedup.incremental(spark, sf)
        .select($"doc_id", $"dup_of", $"jaccard")
        .as[(Long, Option[Long], Option[Double])].collect().toSet
      assert(got == want,
        s"stream+verify (${got.size}) != batch incremental (${want.size})")
      assert(want.exists(_._2.nonEmpty), "fixture has no near-dups — vacuous test")
      // state is O(band buckets): every doc contributes exactly one entry
      // to each of its 16 buckets — never its text, grams, or signature
      val nDocs = (corpusIds.size + batchIds.size).toLong
      val nKeys = graft.dedup.Dedup.withMinhash(Tables.documents(spark, sf))
        .select(explode(expr(
          """transform(sequence(0, 15),
            |  b -> concat_ws(':', b, xxhash64(sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3])))""".stripMargin)))
        .distinct().count()
      val so = q.recentProgress.flatMap(p => p.stateOperators).lastOption
        .getOrElse(fail("no stateOperators progress reported"))
      assert(so.numRowsTotal == nKeys || so.numRowsTotal == 16L * nDocs,
        s"state rows ${so.numRowsTotal}: not O(buckets) — " +
          s"buckets=$nKeys, members=${16L * nDocs}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState BoW dedup over the real documents table equals the batch keepers") {
    // r13 verdict item 8: the batch dedup family's streaming mirror on
    // arbitrary state. The REAL sf0.001 documents stream in doc_id-ordered
    // micro-batches through the canonical-hash FirstKeeper on RocksDB;
    // the emitted keeper set must equal Dedup.bow's batch keepers (min
    // doc_id per BoW hash), each emitted exactly once, with state rows
    // = distinct keys (bounded), and a replayed batch must add nothing.
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"lang").as[(Long, String, String)]
      .collect().sortBy(_._1)
      .map(d => Doc(d._1, ts(d._1), d._2, d._3))
    val batchKeepers = graft.dedup.Dedup.bow(spark, sf)
      .select($"keeper_id", $"bow_hash").as[(Long, String)].collect().toSet
    val input = MemoryStream[Doc]
    val q = DocStreams.bowDedupStream(input.toDS())
      .writeStream.format("memory").queryName("bow_keepers")
      .outputMode("append").start()
    try {
      docs.grouped(120).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      // full replay of the first chunk: every key already has a keeper
      input.addData(docs.take(120): _*)
      q.processAllAvailable()
      val got = spark.table("bow_keepers")
        .select($"doc_id", $"key_sha").as[(Long, String)].collect()
      assert(got.length == got.toSet.size, "a keeper emitted twice")
      assert(got.toSet == batchKeepers,
        s"stream keepers (${got.length}) != batch keepers (${batchKeepers.size})")
      val so = q.recentProgress.flatMap(p => p.stateOperators).lastOption
        .getOrElse(fail("no stateOperators progress reported"))
      assert(so.numRowsTotal == batchKeepers.size,
        s"state rows ${so.numRowsTotal} != distinct BoW keys ${batchKeepers.size}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("unordered-stream min-keeper converges to the batch keepers exactly") {
    // ADVICE r15's second branch: FirstKeeper's batch-equivalence needs
    // doc_id-ordered arrivals (documented contract); MinKeeper re-elects
    // in Update mode, so the last emission per key equals the batch keeper
    // on ANY order. Drive the WORST case — every dup group's NON-min
    // members stream first, the group minima only at the end (the real
    // corpus's dup ids are adjacent, so a plain reversed feed never splits
    // a group across micro-batches: measured zero re-elections) — and
    // require the emission multiset to match a per-key replay of the
    // re-election rule exactly, the converged keepers to equal
    // Dedup.exact's, state to stay O(keys), and a replay of already-seen
    // (necessarily not-smaller) docs to add nothing.
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val sf = "/root/testdata/sf0.001"
    // key on the BoW canonicalization: the corpus has NO byte-exact dups
    // (25 BoW groups), so exact keying would leave re-election untested
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    def keyOf(text: String): String =
      sha.digest(text.split(" ").distinct.sorted.mkString(" ")
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    val raw = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"lang").as[(Long, String, String)]
      .collect()
      .map(d => Doc(d._1, ts(d._1), d._2, d._3))
    val minIds = raw.groupBy(d => keyOf(d.text))
      .values.map(_.map(_.doc_id).min).toSet
    val dups = raw.filter(d => !minIds(d.doc_id)).sortBy(-_.doc_id)
    assert(dups.nonEmpty, "corpus has no duplicate groups to re-elect")
    val docs = dups ++ raw.filter(d => minIds(d.doc_id)).sortBy(-_.doc_id)
    val batchKeepers = graft.dedup.Dedup.bow(spark, sf)
      .select($"keeper_id", $"bow_hash").as[(Long, String)].collect().toSet
    val chunks = docs.grouped(120).toSeq
    // expected emissions: replay the rule — per key, a chunk whose min
    // doc_id beats the running keeper emits that min
    val running = scala.collection.mutable.Map.empty[String, Long]
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    chunks.foreach { chunk =>
      chunk.groupBy(d => keyOf(d.text)).foreach { case (k, ds) =>
        val m = ds.map(_.doc_id).min
        if (running.get(k).forall(m < _)) {
          running(k) = m
          expected += ((m, k))
        }
      }
    }
    val input = MemoryStream[Doc]
    val q = DocStreams.bowDedupStreamUnordered(input.toDS())
      .writeStream.format("memory").queryName("min_keepers")
      .outputMode("update").start()
    try {
      chunks.foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.table("min_keepers")
        .select($"doc_id", $"key_sha").as[(Long, String)].collect()
      assert(got.sorted.toSeq == expected.sorted.toSeq,
        s"emissions (${got.length}) != the re-election replay (${expected.length})")
      assert(got.length > batchKeepers.size,
        "descending feed never re-elected — the update path went unexercised")
      // converged keepers: min emission per key == the batch keeper
      val converged = got.groupBy(_._2).map { case (k, es) => (es.map(_._1).min, k) }.toSet
      assert(converged == batchKeepers,
        s"converged keepers (${converged.size}) != batch keepers (${batchKeepers.size})")
      // replayed docs can never beat an existing keeper: nothing new
      input.addData(docs.take(120): _*)
      q.processAllAvailable()
      assert(spark.table("min_keepers").count() == got.length,
        "a replayed (not-smaller) doc re-elected")
      val so = q.recentProgress.flatMap(p => p.stateOperators).lastOption
        .getOrElse(fail("no stateOperators progress reported"))
      assert(so.numRowsTotal == batchKeepers.size,
        s"state rows ${so.numRowsTotal} != distinct keys ${batchKeepers.size}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
