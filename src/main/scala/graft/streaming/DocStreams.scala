package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document curation — the incremental form of
  * `graft.pipeline.Curate`: documents arrive as a stream and pass the same
  * gates (quality score, exact dedup, language), with per-window audit
  * counts at the end.
  *
  * The dedup state is keyed by the sha2 content hash and bounded by the
  * watermark (memory ∝ lateness bound, not stream history); the windowed
  * audit is a second stateful operator downstream of the dedup — the
  * chained-stateful-operator shape that, at 100 TB/day, runs with state
  * partitioned by hash across the cluster and a RocksDB state backend.
  */
object DocStreams {

  case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String, lang: String)

  def curate(docs: DataFrame): DataFrame = {
    // same quality shape as Curate.run / Text.quality's length term
    val nTokens = length(col("text")) - length(expr("replace(text, ' ', '')")) + 1
    val score = lit(0.5) * least(lit(1.0), nTokens / 100.0) + lit(0.5)
    docs
      .withWatermark("ts", "1 hour")
      .withColumn("content_hash", sha2(col("text"), 256))
      .dropDuplicatesWithinWatermark("content_hash") // keeper = first arrival
      .withColumn("q_score", score)
      .filter(col("q_score") >= 0.6)
      .filter(col("lang").isin("en", "es", "de", "fr", "zh"))
      // PII scrub is a stateless map stage, so it slots into the streaming
      // chain unchanged (dedup keys on the PRE-scrub hash: redaction must
      // not merge distinct documents that share a template). A doc counts
      // as redacted iff the scrub CHANGED it — matching the sentinel
      // strings instead would miscount a doc that legitimately contained
      // the literal text "<EMAIL>".
      .withColumn("scrubbed", graft.textanalysis.Text.scrubExpr(col("text")))
      .withColumn("was_redacted", col("scrubbed") =!= col("text"))
      .withColumn("text", col("scrubbed")).drop("scrubbed")
      .groupBy(window(col("ts"), "1 hour"), col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        sum(when(col("was_redacted"), 1L).otherwise(0L)).as("n_redacted"))
      .select(col("window.start").as("hour_start"), col("lang"),
        col("n_kept"), col("n_redacted"))
  }
}
