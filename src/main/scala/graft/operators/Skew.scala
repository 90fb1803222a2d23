package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable._

/** Skew mitigation: salted join. AQE's skew-join handles most cases at
  * runtime; explicit salting remains the tool when one key dominates so
  * hard that even split sub-partitions overwhelm a task (the classic
  * power-law user_id at 100 TB).
  *
  * The big side gets a uniform salt in [0, salt); the small side is
  * replicated `salt` ways; joining on (key, salt) splits each hot key's
  * rows across `salt` tasks. Result is row-identical to the plain join.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, joinExpr: Column,
      salt: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt)).cast("int"))
    val expandedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(expandedSmall,
        joinExpr && saltedBig("__salt") === expandedSmall("__salt"))
      .drop("__salt")
  }

  /** Salted fact⋈dim as a user-facing query: events (big, power-law
    * user_id) against customer (small), 8-way salt, aggregated per nation.
    * The oracle is the PLAIN join — salting must be result-invisible.
    */
  def saltedJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("value"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    saltedJoin(ev, cust, col("user_id") === col("c_custkey"), 8)
      .groupBy(col("c_nationkey"))
      .agg(centsSum(col("value")).as("sum_value"), count(lit(1)).as("n_events"))
  }

  val saltedJoinSql: String =
    s"""SELECT c_nationkey, ${centsSumSql("value")} AS sum_value, COUNT(*) AS n_events
       |FROM events JOIN customer ON user_id = c_custkey
       |GROUP BY c_nationkey""".stripMargin

  /** Skew-proof distinct counting: `COUNT(DISTINCT user_id)` over a
    * low-cardinality group key would hash every row of a hot group to ONE
    * reducer; the two-stage form first distincts on (group, user) — the
    * shuffle spreads over the full composite key space — then counts the
    * deduped pairs per group. Same result (the oracle is the plain
    * COUNT(DISTINCT)), but no task ever holds a whole group. The canonical
    * rewrite for distinct aggregation under power-law keys at 100 TB.
    */
  def distinctSkew(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))

  val distinctSkewSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_salted_join" -> (saltedJoinQuery _),
    "q_distinct_skew" -> (distinctSkew _))

  val oracles: Map[String, String] = Map(
    "q_salted_join" -> saltedJoinSql,
    "q_distinct_skew" -> distinctSkewSql)
}
