package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

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

  /** A kept (keeper) document emitted by the canonical-hash dedup. */
  case class Kept(doc_id: Long, key_sha: String)

  /** First-keeper dedup on `transformWithState` (round 14 — the streaming
    * mirror of the batch dedup_exact / dedup_bow family): one ValueState
    * Long per DISTINCT canonical hash (the keeper's doc_id) — the minimum
    * any exact dedup must remember, and exactly the cardinality the BATCH
    * dedup's group-by shuffles (state is O(distinct keys), never
    * O(arrivals); the spec asserts numRowsTotal == distinct keys). A
    * lateness-bounded horizon is the OTHER streaming dedup in this file
    * ([[curate]]'s dropDuplicatesWithinWatermark); this one is the
    * full-corpus mirror. TimeMode.None deliberately: a processing-time
    * TTL would re-trigger empty micro-batches continuously (measured:
    * thousands of no-data commits while idle), pure checkpoint churn.
    * Emission is exactly-once per key: the first micro-batch containing a
    * key emits its MINIMUM doc_id (so a replay ordered by doc_id
    * reproduces the batch keeper choice — min doc_id per key — exactly;
    * StreamingSpec proves batch ≡ stream on the real documents table),
    * every later arrival of the key is swallowed.
    */
  private class FirstKeeper
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, Long), Kept] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var keeper: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      keeper = getHandle.getValueState[Long]("keeper",
        Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        tv: TimerValues): Iterator[Kept] = {
      if (keeper.exists()) Iterator.empty
      else {
        var m = Long.MaxValue
        rows.foreach(r => if (r._2 < m) m = r._2)
        keeper.update(m)
        Iterator.single(Kept(m, key))
      }
    }
  }

  /** Dedup an arriving document stream on an arbitrary canonical-hash
    * column — the composition surface the exact and BoW mirrors share.
    * The canonicalization is computed stateless map-side; only the
    * 64-hex key and the doc_id reach the stateful operator, so state and
    * shuffle stay slim no matter how large the documents are.
    */
  def canonicalDedupStream(docs: Dataset[Doc], canonical: Column): Dataset[Kept] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    docs.select(canonical.cast("string").as("key_sha"), col("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new FirstKeeper,
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming twin of `Dedup.exactHash`: keyed on sha2(text). */
  def exactDedupStream(docs: Dataset[Doc]): Dataset[Kept] =
    canonicalDedupStream(docs, sha2(col("text"), 256))

  /** Streaming twin of `Dedup.bow`: keyed on the sorted-distinct-token
    * canonical hash, the EXACT canonicalization `Dedup.bowOf` groups by —
    * so the batch job and the stream agree on what "same document" means.
    */
  def bowDedupStream(docs: Dataset[Doc]): Dataset[Kept] =
    canonicalDedupStream(docs,
      sha2(array_join(array_sort(array_distinct(split(col("text"), " "))), " "), 256))
}
