package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's `register_parquet(..., parquet_pruning(true))`
  * (`benches/query.rs:37-41`): Spark's vectorized parquet reader does the
  * same row-group pruning + predicate pushdown when plans stay declarative.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS): read as long nanos (see
    * GraftSession's nanosAsLong) and converted to a micros TIMESTAMP with
    * integral division (floor), matching DuckDB's ns→us truncation.
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  private val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region" -> (region _), "nation" -> (nation _), "customer" -> (customer _),
    "supplier" -> (supplier _), "part" -> (part _), "orders" -> (orders _),
    "lineitem" -> (lineitem _), "events" -> (events _),
    "documents" -> (documents _), "embeddings" -> (embeddings _))

  /** Register every table as a temp view so arbitrary SQL runs against the
    * named tables — the reference's exact usage flow (`register_parquet`
    * then `ctx.sql(...)`, `benches/query.rs:37-47`). Views are lazy plans
    * over the parquet scans (events with its nanos→micros ts conversion
    * baked in), so pushdown/pruning behave identically to the programmatic
    * loaders.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    loaders.foreach { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(name)
    }
}
