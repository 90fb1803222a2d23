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
}
