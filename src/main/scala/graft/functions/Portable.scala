package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Engine-portable aggregation helpers.
  *
  * The driver's correctness gate hash-compares Spark results against DuckDB.
  * Double summation is order-dependent, so a plain SUM(double) can differ in
  * the last ulp between engines. These helpers make money-style aggregates
  * exact and order-independent by summing scaled integers (order-independent
  * in Z) and only converting to double at the very end with a fixed, mirrored
  * expression shape. `*Sql` emits the byte-identical DuckDB formulation.
  */
object Portable {

  private def factor(scale: Int): String = "1" + ("0" * scale)

  /** round(x * 10^scale) as BIGINT — exact per-row, identical in both engines
    * (same IEEE754 multiply, both round half away from zero for positives).
    */
  def cents(c: Column, scale: Int = 2): Column =
    round(c * factor(scale).toDouble).cast(LongType)

  /** SUM as exact scaled integers, re-expressed as double. */
  def centsSum(c: Column, scale: Int = 2): Column =
    sum(cents(c, scale)).cast(DoubleType) / factor(scale).toDouble

  def centsSumSql(e: String, scale: Int = 2): String = {
    val f = factor(scale)
    s"CAST(SUM(CAST(ROUND(($e)*$f) AS BIGINT)) AS DOUBLE)/$f"
  }

  /** AVG with an exact numerator: (centsSum)/COUNT(*). */
  def centsAvg(c: Column, scale: Int = 2): Column =
    centsSum(c, scale) / count(lit(1))

  def centsAvgSql(e: String, scale: Int = 2): String =
    s"(${centsSumSql(e, scale)})/COUNT(*)"

  /** Byte 0 (0..255) of md5 of a key — THE deterministic, engine-portable
    * split/sample/shard hash (reproducible across engines, retries, and
    * repartitionings; uncorrelated with key order). The same value the
    * Prep split/shard operators compute inline; exposed here for any
    * operator needing a portable side/sample assignment.
    */
  def md5Byte0(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast(LongType)

  def md5Byte0Sql(e: String): String =
    s"(strpos('0123456789abcdef', substr(md5(CAST($e AS VARCHAR)), 1, 1)) - 1) * 16" +
      s" + strpos('0123456789abcdef', substr(md5(CAST($e AS VARCHAR)), 2, 1)) - 1"
}
