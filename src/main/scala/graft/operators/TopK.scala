package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, NullsFirst, NullsLast, SortOrder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge, TopKPerKeyNode, TopKStrategy}

import graft.Tables

/** Per-key top-k via graft's custom physical operator (heap-based, no
  * per-group sort). The strategy is registered imperatively through the
  * public `spark.experimental.extraStrategies` hook so it works on any
  * session, extensions configured or not.
  */
object TopK {

  def perKey(df: DataFrame, keys: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, s"top-k requires k > 0, got $k")
    require(keys.nonEmpty,
      "per-key top-k requires grouping keys; for a global top-k use orderBy(...).limit(k)")
    require(order.nonEmpty, "top-k requires at least one ordering column")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val ordering = order.map { case (name, descending) =>
      val dir = if (descending) Descending else Ascending
      val nulls = if (descending) NullsLast else NullsFirst
      SortOrder(UnresolvedAttribute.quoted(name), dir, nulls, Seq.empty)
    }
    val node = TopKPerKeyNode(
      keys.map(UnresolvedAttribute.quoted), ordering, k, df.queryExecution.logical)
    ColumnBridge.ofRows(spark, node)
  }

  /** Top-3 orders per customer through the custom operator — same semantics
    * as the window formulation (`q_window_rank` minus the rank column), so
    * it is oracle-checked against standard SQL.
    */
  def topkPerKeyOrders(spark: SparkSession, dir: String): DataFrame =
    perKey(
      Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      keys = Seq("o_custkey"),
      order = Seq("o_totalprice" -> true, "o_orderkey" -> false),
      k = 3)

  val topkPerKeyOrdersSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) t WHERE rn <= 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_per_key" -> (topkPerKeyOrders _))

  val oracles: Map[String, String] = Map(
    "q_topk_per_key" -> topkPerKeyOrdersSql)
}
