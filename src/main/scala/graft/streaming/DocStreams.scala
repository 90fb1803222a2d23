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
    *
    * KEEPER SEMANTICS (ADVICE r15): the keeper is FIRST-ARRIVAL-WINS —
    * the first micro-batch containing a key emits that batch's min
    * doc_id, and the choice is final (Append mode cannot retract). This
    * equals the BATCH keeper (global min doc_id per key) exactly when
    * arrivals are doc_id-ordered — an ingest stream with monotone ids,
    * or a replay sorted by doc_id (what StreamingSpec drives). On an
    * UNORDERED production stream the kept SET of keys is identical but
    * the representative doc_id per key may differ from the batch job's;
    * first-arrival-wins is also `dedup_incremental`'s contract, so the
    * two incremental paths agree with each other by construction. If
    * batch-identical representatives on unordered streams are required,
    * run the batch keeper re-election over the kept set at compaction
    * time instead of retracting mid-stream.
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

  /** Re-electing min-keeper for UNORDERED streams (ADVICE r15's second
    * branch, complementing the ordered-arrival contract documented on
    * [[canonicalDedupStream]]): the state per key is still one Long (the
    * best keeper so far), but an arrival SMALLER than it re-elects —
    * emits the new keeper in Update mode — so the LATEST emission per key
    * (equivalently the min across emissions, since re-elections are
    * strictly decreasing) equals the BATCH keeper (global min doc_id per
    * key) on ANY arrival order, once the stream has drained. Emission
    * count per key = 1 + number of strict improvements: doc_id-ordered
    * input degenerates to exactly [[FirstKeeper]]'s one-per-key output,
    * and even fully reversed input emits at most O(arrivals) updates —
    * there is no retraction, consumers keep last-write-wins per key (the
    * natural shape for a keyed store / compacted log sink).
    */
  private class MinKeeper
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, Long), Kept] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var keeper: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      keeper = getHandle.getValueState[Long]("keeper",
        Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        tv: TimerValues): Iterator[Kept] = {
      var m = Long.MaxValue
      rows.foreach(r => if (r._2 < m) m = r._2)
      if (keeper.exists() && keeper.get() <= m) Iterator.empty
      else {
        keeper.update(m)
        Iterator.single(Kept(m, key))
      }
    }
  }

  /** [[canonicalDedupStream]]'s unordered-safe twin: same slim
    * (key, doc_id) state and shuffle, Update output, last emission per
    * key = the batch keeper regardless of arrival order.
    */
  def canonicalDedupStreamUnordered(docs: Dataset[Doc], canonical: Column): Dataset[Kept] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    docs.select(canonical.cast("string").as("key_sha"), col("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new MinKeeper,
        TimeMode.None(), OutputMode.Update())
  }

  /** Streaming twin of `Dedup.exact` for unordered arrivals: keyed on
    * sha2(text), batch-identical keepers under last-write-wins.
    */
  def exactDedupStreamUnordered(docs: Dataset[Doc]): Dataset[Kept] =
    canonicalDedupStreamUnordered(docs, sha2(col("text"), 256))

  /** Streaming twin of `Dedup.bow` for unordered arrivals: keyed on the
    * sorted-distinct-token canonical hash (the canonicalization under
    * which the test corpus actually HAS multi-member groups, so the
    * re-election path is exercised against real merges).
    */
  def bowDedupStreamUnordered(docs: Dataset[Doc]): Dataset[Kept] =
    canonicalDedupStreamUnordered(docs,
      sha2(array_join(array_sort(array_distinct(split(col("text"), " "))), " "), 256))

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

  /** A candidate near-duplicate pair from the banded-LSH stream:
    * `new_id` arrived strictly after `old_id` (previous micro-batch, or
    * earlier in the same one) and the two collide on at least one MinHash
    * band. Candidates, not verdicts — the exact-Jaccard verification joins
    * the pair ids back to the document store downstream, exactly like the
    * batch path's verify stage.
    */
  case class BandCand(new_id: Long, old_id: Long)

  /** Per-band-bucket membership keeper (round 15 — r14 verdict item 4,
    * the streaming mirror of `Dedup.incremental`'s banded candidate
    * generation): one ListState of doc_ids per DISTINCT (band, bandhash)
    * bucket, bounded at `cap` members. An arriving doc emits a candidate
    * against every doc already in its bucket, then joins it; state is
    * O(buckets × min(bucket size, cap)) — each doc contributes exactly
    * one entry to each of its 16 band buckets, never its text or
    * signature.
    *
    * Saturation (the hot-band cap): once a bucket holds `cap` members it
    * stops BOTH matching and storing — the streaming analog of
    * `Dedup.capBuckets` dropping degenerate buckets, except Append mode
    * cannot retract, so saturation is prefix-censoring (the first `cap`
    * members' candidates stand) rather than the batch path's retroactive
    * drop. A bucket that hot is non-discriminative either way.
    */
  private class BandKeeper(cap: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, Long), BandCand] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders
    @transient private var members: ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("members",
        Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        tv: TimerValues): Iterator[BandCand] = {
      val stored = scala.collection.mutable.ArrayBuffer.empty[Long]
      members.get().foreach(stored += _)
      val out = scala.collection.mutable.ArrayBuffer.empty[BandCand]
      rows.foreach { case (_, docId) =>
        // contains-guard: a replayed doc re-pairs and re-stores nothing
        if (stored.size < cap && !stored.contains(docId)) {
          stored.foreach(old => out += BandCand(docId, old))
          stored += docId
          members.appendValue(docId)
        }
      }
      out.iterator
    }
  }

  /** Streaming banded near-dup candidates — the incremental-dedup mirror:
    * each arriving document pairs against every STRICTLY EARLIER arrival
    * it shares a MinHash band with (the same 64-permutation signature and
    * 16×4 banding as `Dedup.minhashLsh` / `Dedup.incremental`, computed
    * stateless map-side; only the band key and doc_id reach state). With
    * the corpus streamed first and a new batch after, the cross-side
    * candidate set equals the batch `incremental` path's band-collision
    * candidates exactly (StreamingSpec proves batch ≡ stream through the
    * identical exact-Jaccard verify on the real documents table).
    *
    * A pair colliding in several bands emits once per band — downstream
    * verification deduplicates, exactly as the batch path's `distinct()`
    * does. Intra-micro-batch arrivals pair in iterator order, so the
    * stream's contract is a total arrival order, not batch boundaries.
    */
  def bandCandidatesStream(docs: Dataset[Doc], cap: Int = 10000): Dataset[BandCand] = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    graft.dedup.Dedup.withMinhash(docs.toDF())
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, 15),
          |  b -> concat_ws(':', b, xxhash64(sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3])))""".stripMargin))
        .as("bkey"))
      .select(col("bkey"), col("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new BandKeeper(cap),
        TimeMode.None(), OutputMode.Append())
  }
}
