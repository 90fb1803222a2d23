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

    // 3. near dedup via MinHash-LSH: drop the higher id of each verified
    // pair. The pair engine (shingle → banded LSH → hot-bucket cap → exact
    // Jaccard ≥ 0.8) is SHARED with the dedup family — one implementation,
    // one set of band/threshold/cap constants to maintain.
    val nearDupIds = graft.dedup.Dedup.minhashVerifiedPairs(spark, dir, 0.8)
      .select(col("id_b").as("doc_id")).distinct()
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

  /** DuckDB mirror of `run` (round-4 verdict item 1): every stage is
    * re-expressed exactly — the quality score's IEEE shape, md5 exact-dedup
    * window, the language list, and the per-(lang, source) counts. The
    * near-dup stage is the one approximation seam: the oracle computes
    * EXACT all-pairs word-3gram-shingle Jaccard ≥ 0.8 while the Spark side
    * generates candidates with 16×4 banded LSH before the exact verify —
    * the same designed-recall caveat as `Dedup.minhashLshSql` (per-pair
    * miss ≈ 2·10⁻⁴ at j = 0.8, ≈ 4·10⁻⁸ at the ≥ 0.9 Jaccard this corpus's
    * duplicate pairs actually have). A future one-pair drift here is the
    * recall tail, not a stage regression.
    *
    * The count sums are CAST to BIGINT: DuckDB's SUM over integers returns
    * HUGEINT, which pandas widens to float64 — values equal to Spark's
    * bigint but a different typed representation, which fails the driver's
    * value hash (the round-5 `pipeline_curate` red row was exactly this,
    * not a recall miss).
    */
  val oracleSql: String =
    s"""WITH q AS (
      |  SELECT doc_id, lang, source, text,
      |    (0.5 * LEAST(1.0, (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) / 100.0) + 0.5) >= 0.6 AS pass_quality,
      |    (row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)) = 1 AS pass_exact
      |  FROM documents),
      |${graft.dedup.Dedup.shinglePairCtes},
      |near AS (
      |  SELECT DISTINCT i.id_b AS doc_id
      |  FROM inter i
      |  JOIN c ca ON ca.doc_id = i.id_a
      |  JOIN c cb ON cb.doc_id = i.id_b
      |  WHERE CAST(i.ni AS DOUBLE) / (ca.n + cb.n - i.ni) >= 0.8),
      |flags AS (
      |  SELECT q.doc_id, q.lang, q.source, q.pass_quality, q.pass_exact,
      |         near.doc_id IS NULL AS pass_near,
      |         q.lang IN ('en', 'es', 'de', 'fr', 'zh') AS pass_lang
      |  FROM q LEFT JOIN near ON q.doc_id = near.doc_id)
      |SELECT lang, source,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN pass_quality AND pass_exact AND pass_near AND pass_lang
      |        THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN NOT pass_quality THEN 1 ELSE 0 END) AS BIGINT) AS drop_quality,
      |  CAST(SUM(CASE WHEN NOT pass_exact THEN 1 ELSE 0 END) AS BIGINT) AS drop_exact_dup,
      |  CAST(SUM(CASE WHEN NOT pass_near THEN 1 ELSE 0 END) AS BIGINT) AS drop_near_dup
      |FROM flags
      |GROUP BY 1, 2""".stripMargin

  /** Round-13 curation pipeline over the round's new operator families,
    * composed the way they'd actually chain:
    *
    *   1. Gopher rule panel    (Text.withGopherPanel — exact-integer rules)
    *   2. BoW canonical dedup  (sorted-token-set sha2, keep min doc_id)
    *   3. CDC duplication gate (GearChunkEnds chunks; drop docs whose
    *                            shared-with-a-lower-id chunk share > 50%)
    *   4. diversity floor      (Simpson ≤ 55k ppm — template/boilerplate cut)
    *   5. audit                (per lang × source: pass counts per stage)
    *
    * Stages 1/2/4 ride ONE document scan (projection + one window);
    * stage 3 is the chunk pipeline (in-row chunking → chunk-keyed group →
    * doc-keyed join back), the one genuinely separate aggregation path.
    * Every stage is deterministic integers, so unlike [[run]]'s LSH seam
    * the WHOLE audit is hash-exact against the oracle.
    */
  def runV2(spark: SparkSession, dir: String): DataFrame =
    runV2Of(Tables.documents(spark, dir))

  /** [[runV2]] over an arbitrary documents frame (spec injection surface —
    * PipelineSpec proves conservation on corpora with empty documents,
    * which produce ZERO CDC chunks and must still reach the audit).
    */
  private[graft] def runV2Of(docs: DataFrame): DataFrame = {
    import graft.textanalysis.Text
    import graft.dedup.Dedup
    val paneled = Text.withDiversity(Text.withGopherPanel(docs))
      .withColumnRenamed("passes", "pass_gopher")
      .withColumn("pass_div", col("simpson_ppm") <= 55000L)
    val bowKeeper = Window
      .partitionBy(sha2(array_join(array_sort(array_distinct(split(col("text"), " "))), " "), 256))
      .orderBy(col("doc_id"))
    val st2 = paneled
      .withColumn("pass_bow", row_number().over(bowKeeper) === 1)
    // the chunk set feeds TWO consumers (keeper aggregate + the share
    // join); without the cut the lazy plan re-scans documents and re-runs
    // the Gear chunking once per consumer (measured: 3 parquet scans → 2)
    val chunks = {
      import graft.Checkpoints.CheckpointOps
      Dedup.cdcChunks(docs).cutLineage()
    }
    val keepers = chunks.groupBy(col("chunk_md5"))
      .agg(min(col("doc_id")).as("chunk_keeper"))
    val dupShare = chunks.join(keepers, Seq("chunk_md5"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("chunk_keeper") < col("doc_id"), 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"),
        expr("n_shared * 1000000 div n_chunks").as("cdc_dup_ppm"))
    // LEFT join: a document producing zero CDC chunks (empty text) has no
    // dupShare row — it shared nothing, so its dup share is 0, and it must
    // still reach the audit (the conservation invariant PipelineSpec asserts)
    st2.join(dupShare, Seq("doc_id"), "left_outer")
      .withColumn("pass_cdc", coalesce(col("cdc_dup_ppm"), lit(0L)) <= 500000L)
      .withColumn("kept",
        col("pass_gopher") && col("pass_bow") && col("pass_cdc") && col("pass_div"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("pass_gopher"), 1L).otherwise(0L)).as("drop_gopher"),
        sum(when(!col("pass_bow"), 1L).otherwise(0L)).as("drop_bow_dup"),
        sum(when(!col("pass_cdc"), 1L).otherwise(0L)).as("drop_cdc_dup"),
        sum(when(!col("pass_div"), 1L).otherwise(0L)).as("drop_diversity"))
  }

  /** DuckDB mirror of [[runV2]] — deterministic end to end (no LSH seam):
    * the Gopher booleans, BoW keeper window, the Gear-walk chunk CTEs
    * (shared string with `Dedup.cdcSql`), and the Simpson floor replay
    * exactly; the audit hash must match bit-for-bit.
    */
  val oracleV2Sql: String = {
    val nW = "(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)"
    val chars = "LENGTH(REPLACE(text, ' ', ''))"
    val alpha =
      "len(list_filter(string_split(text, ' '), w -> regexp_matches(w, '[a-zA-Z]')))"
    val stops =
      "len(list_filter(string_split(text, ' '), w -> list_contains(['the','a','and','of','to','in','is','that','it','for'], w)))"
    val sym =
      "((LENGTH(text) - LENGTH(REPLACE(text, '#', ''))) + (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) // 3)"
    s"""WITH RECURSIVE ${graft.dedup.Dedup.cdcChunksCtes},
       |keepers AS (
       |  SELECT chunk_md5, MIN(doc_id) AS chunk_keeper FROM chunks GROUP BY 1),
       |share AS (
       |  SELECT c.doc_id,
       |    CAST(SUM(CASE WHEN k.chunk_keeper < c.doc_id THEN 1 ELSE 0 END)
       |      AS BIGINT) * 1000000
       |      // CAST(COUNT(*) AS BIGINT) AS cdc_dup_ppm
       |  FROM chunks c JOIN keepers k USING (chunk_md5) GROUP BY 1),
       |div AS (
       |  SELECT doc_id,
       |    CAST(list_sum(list_transform(list_distinct(string_split(text, ' ')),
       |      t -> CAST(len(list_filter(string_split(text, ' '), w -> w = t)) AS BIGINT)
       |        * CAST(len(list_filter(string_split(text, ' '), w -> w = t)) AS BIGINT)))
       |      AS BIGINT) * 1000000
       |      // (CAST($nW AS BIGINT) * $nW) AS simpson_ppm
       |  FROM documents),
       |flags AS (
       |  SELECT d.doc_id, d.lang, d.source,
       |    ($nW >= 50 AND $nW <= 100000 AND $nW * 3 <= $chars
       |      AND $chars <= $nW * 10 AND $sym * 10 <= $nW
       |      AND $alpha * 5 >= $nW * 4 AND $stops >= 2) AS pass_gopher,
       |    (ROW_NUMBER() OVER (
       |      PARTITION BY SHA256(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
       |      ORDER BY d.doc_id)) = 1 AS pass_bow,
       |    COALESCE(s.cdc_dup_ppm, 0) <= 500000 AS pass_cdc,
       |    v.simpson_ppm <= 55000 AS pass_div
       |  FROM documents d
       |  LEFT JOIN share s ON s.doc_id = d.doc_id
       |  JOIN div v ON v.doc_id = d.doc_id)
       |SELECT lang, source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN pass_gopher AND pass_bow AND pass_cdc AND pass_div
       |        THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN NOT pass_gopher THEN 1 ELSE 0 END) AS BIGINT) AS drop_gopher,
       |  CAST(SUM(CASE WHEN NOT pass_bow THEN 1 ELSE 0 END) AS BIGINT) AS drop_bow_dup,
       |  CAST(SUM(CASE WHEN NOT pass_cdc THEN 1 ELSE 0 END) AS BIGINT) AS drop_cdc_dup,
       |  CAST(SUM(CASE WHEN NOT pass_div THEN 1 ELSE 0 END) AS BIGINT) AS drop_diversity
       |FROM flags GROUP BY 1, 2""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> (run _),
    "pipeline_curate_v2" -> (runV2 _))

  val oracles: Map[String, String] = Map(
    "pipeline_curate" -> oracleSql,
    "pipeline_curate_v2" -> oracleV2Sql)
}
