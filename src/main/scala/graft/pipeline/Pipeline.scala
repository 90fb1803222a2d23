package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composable curation pipeline — the user-facing fluent API over the
  * operator families. Each stage is a DataFrame → DataFrame transform, so a
  * chained pipeline stays ONE Catalyst plan end-to-end (pushdown, pruning,
  * and AQE apply across stage boundaries) and the whole chain is equally
  * valid under Structured Streaming where noted.
  *
  * {{{
  * import graft.pipeline.Pipeline._
  * val curated = docs
  *   .transform(qualityGate(0.6))
  *   .transform(exactDedup())
  *   .transform(langGate(Seq("en", "de")))
  *   .transform(packSequences(budget = 2048))
  * }}}
  *
  * Stages mark-and-keep rather than delete, where the audit trail matters:
  * `qualityGate` drops rows, but `exactDedup` keeps the keeper — mirroring
  * how production curation jobs preserve drop accounting (see Curate.run's
  * observe() metrics for the audited form).
  */
object Pipeline {

  private val nTokens: Column =
    (length(col("text")) - length(expr("replace(text, ' ', '')")) + 1).cast("bigint")

  /** Keep documents scoring ≥ `minScore` on the standard length/punct/digit
    * quality blend (Text.quality's shape). Map-only: no shuffle.
    */
  def qualityGate(minScore: Double = 0.6): DataFrame => DataFrame = { df =>
    val nPunct = length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))
    val nDigit = length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))
    val score = lit(0.5) * least(lit(1.0), nTokens / 100.0) +
      lit(0.25) * (lit(1.0) - nPunct.cast("double") / length(col("text"))) +
      lit(0.25) * (lit(1.0) - nDigit.cast("double") / length(col("text")))
    df.filter(score >= minScore)
  }

  /** Keep one document per exact content hash (min `keyCol` wins). One
    * shuffle on the 256-bit hash — document bodies never ship.
    */
  def exactDedup(keyCol: String = "doc_id"): DataFrame => DataFrame = { df =>
    val w = Window.partitionBy(sha2(col("text"), 256)).orderBy(col(keyCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Keep documents in the supported-language set. Map-only. */
  def langGate(langs: Seq[String]): DataFrame => DataFrame =
    _.filter(col("lang").isin(langs: _*))

  /** Drop highly repetitive documents (Gopher-style repetition filter):
    * keep docs whose duplicate-word fraction stays below `maxDupWordFrac`
    * AND duplicate-2-gram fraction below `maxDup2gramFrac` (Text.repetition's
    * expressions). In-row array ops — map-only, no shuffle.
    */
  def repetitionGate(maxDupWordFrac: Double = 0.9,
      maxDup2gramFrac: Double = 0.9): DataFrame => DataFrame = { df =>
    val w = split(col("text"), " ")
    val g2 = expr(
      "transform(sequence(1, greatest(size(split(text, ' ')) - 1, 1)), i -> array_join(slice(split(text, ' '), i, 2), ' '))")
    val dupW = (size(w) - size(array_distinct(w))).cast("double") / size(w)
    val dupG = (size(g2) - size(array_distinct(g2))).cast("double") / size(g2)
    df.filter(dupW < maxDupWordFrac && dupG < maxDup2gramFrac)
  }

  /** Redact PII in place: emails → `<EMAIL>`, URLs → `<URL>`, phone-shaped
    * tokens → `<PHONE>` — delegates to Text.scrubExpr, the single home of
    * the patterns and their order invariant. Map-only, no shuffle.
    */
  def scrubPii(textCol: String = "text"): DataFrame => DataFrame =
    df => df.withColumn(textCol, graft.textanalysis.Text.scrubExpr(col(textCol)))

  /** Canonicalize text in place (lowercase, strip non-alphanumerics,
    * collapse whitespace). Map-only.
    */
  def normalize(textCol: String = "text"): DataFrame => DataFrame =
    _.withColumn(textCol, trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +", " ")))

  /** Deterministic subsample at `pct` percent via an md5(keyCol) hex-prefix
    * threshold — membership is reproducible on any engine/cluster/retry.
    * `pct` is quantized to 1/256ths (hex-byte resolution). Map-only.
    */
  def deterministicSample(pct: Double, keyCol: String = "doc_id"): DataFrame => DataFrame = { df =>
    // 3-hex-digit compare with a leading '0' on the md5 side so pct=100
    // (threshold "100") still sorts above every "0xx" prefix
    val thr = f"${math.round(pct / 100.0 * 256).min(256).max(0)}%03x"
    df.filter(concat(lit("0"), substring(md5(col(keyCol).cast("string")), 1, 2)) < thr)
  }

  /** Assign token-budget training sequences within each `shardCol` group
    * (see Prep.packSequences for the scale rationale: per-shard running
    * sums, never a global window). Adds `seq_id`.
    */
  def packSequences(budget: Long = 2048L, shardCol: String = "source",
      orderCol: String = "doc_id"): DataFrame => DataFrame = { df =>
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum", coalesce(sum(nTokens).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__cum div $budget")).drop("__cum")
  }
}
