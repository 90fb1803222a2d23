package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Events

/** Edge semantics of the as-of join on synthetic frames: no-match events,
  * inclusive boundaries, and same-date tie-breaks.
  */
class AsofEdgeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(2)

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asof join: boundaries, ties, and missing matches") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2020-01-10 00:00:00"), 1L),  // after both orders of user 1
      (2L, ts("2020-01-05 00:00:00"), 1L),  // exactly AT order 11's date: inclusive
      (3L, ts("2020-01-01 00:00:00"), 1L),  // before any order -> dropped
      (4L, ts("2020-01-10 00:00:00"), 2L),  // user 2: two orders same date -> max key
      (5L, ts("2020-01-10 00:00:00"), 9L))  // user with no orders -> dropped
      .toDF("event_id", "ts", "user_id")
    val orders = Seq(
      (10L, 1L, ts("2020-01-03 00:00:00")),
      (11L, 1L, ts("2020-01-05 00:00:00")),
      (20L, 2L, ts("2020-01-04 00:00:00")),
      (21L, 2L, ts("2020-01-04 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = Events.asofJoinGeneric(events, orders)
      .select($"event_id", $"o_orderkey")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 11L,  // latest order at-or-before
      2L -> 11L,  // inclusive boundary
      4L -> 21L)) // same-date tie -> max orderkey
  }

  test("forward asof join: boundaries, ties, and missing matches") {
    import spark.implicits._
    // probes are ORDERS; for each, the earliest event at-or-after its date
    val events = Seq(
      (1L, ts("2020-01-05 00:00:00"), 1L),
      (2L, ts("2020-01-10 00:00:00"), 1L),
      (3L, ts("2020-01-04 00:00:00"), 2L),  // same ts as event 4
      (4L, ts("2020-01-04 00:00:00"), 2L))
      .toDF("event_id", "ts", "user_id")
    val orders = Seq(
      (10L, 1L, ts("2020-01-03 00:00:00")), // next event = 1 (01-05)
      (11L, 1L, ts("2020-01-05 00:00:00")), // exactly AT event 1's ts: inclusive
      (12L, 1L, ts("2020-01-12 00:00:00")), // after every event -> dropped
      (20L, 2L, ts("2020-01-01 00:00:00")), // same-ts events -> min event_id
      (30L, 9L, ts("2020-01-01 00:00:00"))) // user with no events -> dropped
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = Events.asofJoinForwardGeneric(events, orders)
      .select($"o_orderkey", $"event_id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      10L -> 1L,  // earliest event at-or-after
      11L -> 1L,  // inclusive boundary
      20L -> 3L)) // same-ts tie -> min event_id
  }

  test("nearest asof join: direction pick, equidistant tie, one-sided matches") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2020-01-06 00:00:00"), 1L),  // 3d to order 10, 1d to order 11 -> fwd
      (2L, ts("2020-01-05 00:00:00"), 2L),  // equidistant (2d back, 2d fwd) -> BACKWARD
      (3L, ts("2020-01-01 00:00:00"), 3L),  // only a future order -> fwd
      (4L, ts("2020-01-09 00:00:00"), 3L),  // only a past order -> back
      (5L, ts("2020-01-09 00:00:00"), 9L))  // no orders -> dropped
      .toDF("event_id", "ts", "user_id")
    val orders = Seq(
      (10L, 1L, ts("2020-01-03 00:00:00")),
      (11L, 1L, ts("2020-01-07 00:00:00")),
      (20L, 2L, ts("2020-01-03 00:00:00")),
      (21L, 2L, ts("2020-01-07 00:00:00")),
      (30L, 3L, ts("2020-01-05 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val got = Events.asofJoinNearestGeneric(events, orders)
      .select($"event_id", $"o_orderkey", $"delta_us")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val day = 86400L * 1000000L
    assert(got == Map(
      1L -> ((11L, day)),      // forward is closer
      2L -> ((20L, 2 * day)),  // equidistant -> backward
      3L -> ((30L, 4 * day)),  // forward-only
      4L -> ((30L, 4 * day)))) // backward-only
  }

  test("nearest asof join: one hash exchange, two window sorts") {
    import spark.implicits._
    val events = Seq((1L, ts("2020-01-06 00:00:00"), 1L)).toDF("event_id", "ts", "user_id")
    val orders = Seq((10L, 1L, ts("2020-01-03 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val plan = Events.asofJoinNearestGeneric(events, orders)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges in: $plan")
  }
}
