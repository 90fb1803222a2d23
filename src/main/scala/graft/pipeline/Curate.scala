package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.native

/** End-to-end curation pipeline — the engine's operator families composed
  * the way a pretraining-data job actually runs:
  *
  *   1. quality gate   (text analysis: length/punct/digit score)
  *   2. exact dedup    (md5 group-by, keep min doc_id)
  *   3. near dedup     (MinHash-LSH candidates, verified Jaccard ≥ 0.8,
  *                      drop the higher doc_id of each pair)
  *   4. language gate  (keep the five supported langs)
  *   5. audit output   (per lang × source: kept/dropped counts by stage)
  *
  * Every stage is declarative, so the whole pipeline is ONE Catalyst plan:
  * pushdown and pruning apply end-to-end, and at 100 TB each stage is a
  * bounded number of shuffles (hash by content hash, band hash, doc_id).
  */
object Curate {

  def run(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)

    // 1. quality gate (mirrors Text.quality's score shape)
    val nTokens = length(col("text")) - length(expr("replace(text, ' ', '')")) + 1
    val score = lit(0.5) * least(lit(1.0), nTokens / 100.0) + lit(0.5)
    val quality = docs.withColumn("q_score", score)
      .withColumn("pass_quality", col("q_score") >= 0.6)

    // 2. exact dedup: keeper = min doc_id per content hash
    val keeper = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val exact = quality.withColumn("rn", row_number().over(keeper))
      .withColumn("pass_exact", col("rn") === 1).drop("rn")

    // 3. near dedup via MinHash-LSH: drop the higher id of each verified pair
    val shingled = docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", expr(
        """array_distinct(transform(sequence(0, greatest(size(words)-3, 0)),
          |  i -> concat_ws(' ', words[i], words[i+1], words[i+2])))""".stripMargin))
      .withColumn("sig", native.minHashSignature(col("shingles")))
      .withColumn("gh", array_sort(array_distinct(expr("transform(shingles, s -> xxhash64(s))"))))
      .select(col("doc_id"), col("sig"), col("gh"))
    val bands = shingled.select(col("doc_id"), col("gh"), explode(expr(
      """transform(sequence(0, 15),
        |  b -> named_struct('band', b, 'bh', xxhash64(sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3])))""".stripMargin)).as("bb"))
      .select(col("doc_id"), col("gh"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    // candidate key = (band index, band hash) — same key as Dedup.minhashLsh;
    // hash-only would admit spurious cross-band collisions into the verify
    val nearDupIds = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
          && col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", native.sortedIntersectCount(col("a.gh"), col("b.gh")))
      .filter(col("inter").cast("double") /
        (size(col("a.gh")) + size(col("b.gh")) - col("inter")) >= 0.8)
      .select(col("b.doc_id").as("doc_id")).distinct()
    val near = exact.join(nearDupIds.withColumn("is_near_dup", lit(true)), Seq("doc_id"), "left")
      .withColumn("pass_near", coalesce(col("is_near_dup"), lit(false)) === false)

    // 4. language gate + 5. audit. `observe` attaches accumulator-backed
    // metrics to the plan itself — per-batch row/kept counts surface through
    // QueryExecutionListener (or StreamingQueryProgress) with zero extra
    // passes over the data.
    near
      .withColumn("pass_lang", col("lang").isin("en", "es", "de", "fr", "zh"))
      .withColumn("kept",
        col("pass_quality") && col("pass_exact") && col("pass_near") && col("pass_lang"))
      .observe("curate_metrics",
        count(lit(1)).as("rows_seen"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("rows_kept"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("pass_quality"), 1L).otherwise(0L)).as("drop_quality"),
        sum(when(!col("pass_exact"), 1L).otherwise(0L)).as("drop_exact_dup"),
        sum(when(!col("pass_near"), 1L).otherwise(0L)).as("drop_near_dup"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> (run _))

  val oracles: Map[String, String] = Map.empty
}
