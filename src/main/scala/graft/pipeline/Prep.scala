package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-data preparation operators — the steps between "curated corpus"
  * and "tensors on a trainer": sequence packing, deterministic sampling and
  * sharding, normalization, and eval-set decontamination. Everything is
  * codegen'd builtins (no UDFs), each with an exact DuckDB oracle.
  *
  * Determinism is load-bearing here: a training run must be able to
  * reproduce its exact data order and membership from the inputs alone, so
  * sampling/sharding derive from md5(doc_id) — stable across engines,
  * executors, and retries — never from rand() or partition layout.
  */
object Prep {

  private val nTokens =
    (length(col("text")) - length(expr("replace(text, ' ', '')")) + 1).cast("bigint")
  private val nTokensSql = "(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)"

  /** First hex byte of md5(doc_id) as 0..255 — engine-portable (strpos walk
    * over the hex alphabet; DuckDB has no hex→int cast that Spark mirrors).
    */
  private val md5Byte0 = expr(
    """(instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 1, 1)) - 1) * 16
      | + instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 2, 1)) - 1""".stripMargin)
  private val md5Byte0Sql =
    """(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      | + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1""".stripMargin

  /** Sequence packing: assign documents to fixed token-budget training
    * sequences. Documents pack in deterministic (source, doc_id) order; a
    * doc whose tokens cross the boundary opens the next sequence (seq_id =
    * tokens-before-me div budget).
    *
    * 100 TB shape: the window is partitioned by `source` (a corpus shard key
    * with bounded per-key volume), so the running sum is a per-shard sort —
    * NOT a global single-partition window. Packing across a whole corpus
    * always needs some per-shard key; a global pack order would serialize
    * the world on one task in any engine.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val budget = 256L
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), nTokens.as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"cum_before div $budget"))
      .groupBy(col("source"), col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  val packSequencesSql: String =
    s"""WITH t AS (
       |  SELECT source, doc_id, $nTokensSql AS n_tokens FROM documents
       |), c AS (
       |  SELECT source, doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM t
       |)
       |SELECT source, cum_before // 256 AS seq_id, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1, 2""".stripMargin

  /** Deterministic stratified sampling: per-language keep rates applied via
    * an md5(doc_id) hex-prefix threshold — the same document set survives on
    * any engine/cluster/retry (unlike rand()-based sampleBy). Rates: en 50%
    * ('80'/256), zh ~10% ('1a'), other langs ~30% ('4d').
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val thr = when(col("lang") === "en", "80")
      .when(col("lang") === "zh", "1a").otherwise("4d")
    Tables.documents(spark, dir)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < thr)
      .select(col("doc_id"), col("lang"), col("source"))
  }

  val sampleStratifiedSql: String =
    """SELECT doc_id, lang, source FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      |  CASE lang WHEN 'en' THEN '80' WHEN 'zh' THEN '1a' ELSE '4d' END""".stripMargin

  /** Text normalization: lowercase, strip non-alphanumerics, collapse
    * whitespace — the canonical form fed to tokenizers and near-dup
    * hashing. One codegen pass; regexes avoid Java/RE2 divergence.
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      norm.as("norm_text"),
      length(norm).cast("bigint").as("n_chars_norm"))
  }

  val textNormalizeSql: String =
    """SELECT doc_id,
      | trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
      | LENGTH(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS n_chars_norm
      |FROM documents""".stripMargin

  /** Deterministic shard assignment + per-shard manifest: shard =
    * md5(doc_id) byte 0 mod 32 (decorrelated from doc_id order, stable
    * across engines), aggregated to the per-shard doc/token manifest a
    * trainer's data loader consumes. At scale this is one hash-partition
    * shuffle — exactly the repartition(shard) write that precedes a
    * training job.
    */
  def shardAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), nTokens.as("n_tokens"), (md5Byte0 % 32).as("shard"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))

  val shardAssignSql: String =
    s"""SELECT ($md5Byte0Sql) % 32 AS shard,
       | COUNT(*) AS n_docs, CAST(SUM($nTokensSql) AS BIGINT) AS shard_tokens,
       | MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM documents GROUP BY 1""".stripMargin

  /** Deterministic train/val/test split + per-(split, lang) audit. The
    * split derives from md5(doc_id) — reproducible across engines, retries,
    * and re-partitioning, and uncorrelated with ingestion order (a doc_id
    * range split would inherit temporal drift). Byte thresholds 245/250 of
    * 256 ≈ 95.7% / 2% / 2.3%. One map stage + one bounded-cardinality agg.
    */
  def docSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), nTokens.as("n_tokens"),
        when(md5Byte0 < 245, "train").when(md5Byte0 < 250, "val")
          .otherwise("test").as("split"))
      .groupBy(col("split"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("split_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))

  val docSplitSql: String =
    s"""SELECT CASE WHEN b < 245 THEN 'train' WHEN b < 250 THEN 'val'
       |  ELSE 'test' END AS split, lang,
       | COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS split_tokens,
       | MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM (SELECT doc_id, lang, ($md5Byte0Sql) AS b, $nTokensSql AS nt
       |      FROM documents)
       |GROUP BY 1, 2""".stripMargin

  /** Eval-set contamination check: which training documents share a word
    * 3-gram with a held-out eval split (here doc_id % 97 == 0)? The
    * decontamination step every serious pretraining pipeline runs before
    * training.
    *
    * Shape: the doc_id split filters push to the parquet scan BEFORE any
    * explode, the tiny eval side is made distinct and broadcast, and the
    * train side is joined raw — no full-corpus gram shuffle anywhere. The
    * final countDistinct dedups per train doc, so only rows that actually
    * matched an eval gram (a sliver of the corpus) ever reach a shuffle;
    * at 100 TB the eval set is still MBs and the broadcast still holds.
    * (An earlier shape ran distinct() over ALL corpus grams before the
    * split — a full-corpus shuffle that cost 6s at sf0.1 and would be the
    * job-killer at scale.)
    *
    * Both engines emit i in [1, max(len-2, 1)] and a 3-slice at i — the
    * greatest(...,1) floor keeps <3-word docs as one short gram on both
    * sides (Spark's sequence(1,0) would yield a DESCENDING [1,0], not
    * empty, so the floor is also a correctness guard).
    */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)),
          |  i -> array_join(slice(split(text, ' '), i, 3), ' '))""".stripMargin)).as("gram"))
    val docs = Tables.documents(spark, dir)
    val eval = grams(docs.filter(col("doc_id") % 97 === 0))
      .select(col("doc_id").as("eval_doc"), col("gram")).distinct()
    val train = grams(docs.filter(col("doc_id") % 97 =!= 0))
    // the eval panel is a fixed holdout in production but the oracle
    // variant samples 1/97 of the corpus — SF-proportional, so the hint
    // is size-gated (r15): forced at test SF, AQE's runtime call above
    train.join(Tables.dimHint(eval), "gram")
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("eval_doc")).as("n_eval_docs"))
  }

  val contaminationSql: String =
    """WITH grams AS (
      |  SELECT DISTINCT doc_id, g AS gram FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
      |        i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS g
      |    FROM documents)
      |)
      |SELECT t.doc_id, COUNT(DISTINCT t.gram) AS n_shared_grams,
      |  COUNT(DISTINCT e.doc_id) AS n_eval_docs
      |FROM grams t JOIN grams e ON t.gram = e.gram
      |WHERE t.doc_id % 97 <> 0 AND e.doc_id % 97 = 0
      |GROUP BY 1""".stripMargin

  /** Source mixture re-weighting: per-source token share and the up/down-
    * sampling weight that equalizes the training mix (weight =
    * equal-share ÷ actual-share). The over-() window runs on the
    * source-level aggregate — a relation bounded by source cardinality
    * (tens of rows at any corpus size), so the single-partition total is
    * deliberate, not a scale hazard.
    */
  def mixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(nTokens).as("src_tokens"))
    val w = Window.partitionBy()
    perSource
      .withColumn("total_tokens", sum(col("src_tokens")).over(w))
      .withColumn("n_sources", count(lit(1)).over(w))
      .select(
        col("source"), col("n_docs"), col("src_tokens"),
        (col("src_tokens").cast("double") / col("total_tokens")).as("token_share"),
        (col("total_tokens").cast("double") / col("n_sources") / col("src_tokens"))
          .as("balance_weight"))
  }

  val mixtureWeightsSql: String =
    s"""WITH s AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM($nTokensSql) AS BIGINT) AS src_tokens
       |  FROM documents GROUP BY 1
       |)
       |SELECT source, n_docs, src_tokens,
       |  CAST(src_tokens AS DOUBLE) / CAST(SUM(src_tokens) OVER () AS BIGINT) AS token_share,
       |  CAST(CAST(SUM(src_tokens) OVER () AS BIGINT) AS DOUBLE) / COUNT(*) OVER () / src_tokens AS balance_weight
       |FROM s""".stripMargin

  /** Materialize the balance mixture that [[mixtureWeights]] only
    * computes: keep each document of source s with probability
    * min(1, balance_weight(s)) via a deterministic md5 coin, so every
    * source contributes ~equal tokens downstream. The test is EXACT
    * integer arithmetic end to end — keep iff h·n_sources·src_tokens <
    * total_tokens·2⁴⁸, where h is the first 6 md5 bytes (a 48-bit coin;
    * no float rate, so the sample is engine-, retry- and partitioning-
    * stable, and a source with balance_weight ≥ 1 passes every h
    * automatically since n_sources·src_tokens ≤ total_tokens). Products
    * run in decimal(38,0)/HUGEINT (2⁴⁸·n_sources·src_tokens passes 2⁶³
    * long before any real corpus does).
    *
    * Scale shape: per-source stats are a bounded broadcast; the coin is
    * row-local — ONE corpus scan, zero shuffles of document rows.
    */
  /** First 6 md5(doc_id) bytes as a 48-bit integer — the deterministic
    * Bernoulli coin shared by [[mixtureApply]] and [[repeatUpsample]]
    * (Spark expression + DuckDB mirror).
    */
  private val coin48: String = (0 until 6).map(i =>
    s"""((instr('0123456789abcdef', substr(md5(cast(doc_id as string)), ${i * 2 + 1}, 1)) - 1) * 16
       | + instr('0123456789abcdef', substr(md5(cast(doc_id as string)), ${i * 2 + 2}, 1)) - 1)""".stripMargin)
    .zipWithIndex.map { case (b, i) => s"$b * ${1L << ((5 - i) * 8)}L" }
    .mkString(" + ")

  private val coin48Sql: String = (0 until 6).map(i =>
    s"""((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), ${i * 2 + 1}, 1)) - 1) * 16
       | + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), ${i * 2 + 2}, 1)) - 1)""".stripMargin)
    .zipWithIndex.map { case (b, i) => s"$b * ${1L << ((5 - i) * 8)}" }
    .mkString(" + ")

  /** Per-source token sums + corpus totals (bounded: |sources| rows). */
  private def mixtureStats(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val stats = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(sum(nTokens).as("src_tokens"))
    val tot = stats.agg(sum(col("src_tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    (stats, tot)
  }

  def mixtureApply(spark: SparkSession, dir: String): DataFrame = {
    val (stats, tot) = mixtureStats(spark, dir)
    val h48 = expr(coin48)
    Tables.documents(spark, dir)
      .join(broadcast(stats), "source")
      .crossJoin(broadcast(tot))
      .withColumn("h", h48)
      .filter(expr(
        "cast(h as decimal(38,0)) * n_sources * src_tokens < cast(total_tokens as decimal(38,0)) * 281474976710656"))
      .select(col("doc_id"), col("source"), nTokens.as("n_tokens"))
  }

  val mixtureApplySql: String =
    s"""WITH s AS (
       |  SELECT source, CAST(SUM($nTokensSql) AS BIGINT) AS src_tokens
       |  FROM documents GROUP BY 1),
       |t AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
       |             COUNT(*) AS n_sources FROM s)
       |SELECT d.doc_id, d.source, CAST($nTokensSql AS BIGINT) AS n_tokens
       |FROM documents d JOIN s USING (source), t
       |WHERE CAST($coin48Sql AS HUGEINT) * n_sources * src_tokens
       |      < CAST(total_tokens AS HUGEINT) * 281474976710656""".stripMargin

  /** Up-sampling counterpart of [[mixtureApply]]: replicate each document
    * to its source's balance point (DoReMi/epoching shape). With
    * w = balance_weight = total/(S·src), a doc is emitted floor(w) times
    * plus one extra epoch with probability frac(w) — so E[epochs] = w
    * exactly, and under-represented sources are repeated up to parity
    * while w < 1 sources degenerate to [[mixtureApply]]'s Bernoulli keep.
    * Same 48-bit md5 coin, same decimal(38,0)/HUGEINT exactness: the
    * fractional test is h·S·src < (total mod S·src)·2⁴⁸.
    *
    * Scale shape: stats are bounded broadcasts; epoch fan-out happens
    * IN-ROW (explode over sequence — no join against an epoch table), and
    * output size is ≈ n_docs · 1 token-balanced corpus, by construction.
    */
  def repeatUpsample(spark: SparkSession, dir: String): DataFrame = {
    val (stats, tot) = mixtureStats(spark, dir)
    Tables.documents(spark, dir)
      .join(broadcast(stats), "source")
      .crossJoin(broadcast(tot))
      .withColumn("h", expr(coin48))
      .withColumn("n_rep", expr(
        """total_tokens div (n_sources * src_tokens)
          | + if(cast(h as decimal(38,0)) * n_sources * src_tokens
          |      < cast(total_tokens % (n_sources * src_tokens) as decimal(38,0)) * 281474976710656, 1, 0)""".stripMargin))
      .filter(col("n_rep") > 0)
      .select(col("doc_id"), col("source"),
        explode(expr("sequence(bigint(0), n_rep - 1)")).as("epoch"))
  }

  val repeatUpsampleSql: String =
    s"""WITH s AS (
       |  SELECT source, CAST(SUM($nTokensSql) AS BIGINT) AS src_tokens
       |  FROM documents GROUP BY 1),
       |t AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
       |             COUNT(*) AS n_sources FROM s),
       |r AS (
       |  SELECT d.doc_id, d.source,
       |    total_tokens // (n_sources * src_tokens)
       |    + CASE WHEN CAST($coin48Sql AS HUGEINT) * n_sources * src_tokens
       |           < CAST(total_tokens % (n_sources * src_tokens) AS HUGEINT) * 281474976710656
       |      THEN 1 ELSE 0 END AS n_rep
       |  FROM documents d JOIN s USING (source), t)
       |SELECT doc_id, source, CAST(unnest(generate_series(0, n_rep - 1)) AS BIGINT) AS epoch
       |FROM r WHERE n_rep > 0""".stripMargin

  /** Exactly-k uniform sample — the eval-/holdout-set extraction
    * primitive. [[sampleStratified]] keeps a RATE (size varies with the
    * corpus); this draws a FIXED k = 200 by ranking on md5(doc_id) and
    * taking the k smallest — equivalent to a uniform draw without
    * replacement, deterministic across engines, retries, and partition
    * layouts (no RNG, no seed drift).
    *
    * Scale shape: plans as TakeOrderedAndProject — each partition keeps
    * its local top-k, the driver merges k·n_partitions hashes, and NO
    * global sort of the corpus ever materializes. At 100 TB this is one
    * scan plus a k-row merge.
    */
  def sampleExactK(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        md5(col("doc_id").cast("string")).as("h"))
      .orderBy(col("h"))
      .limit(200)

  val sampleExactKSql: String =
    """SELECT doc_id, source, lang, md5(CAST(doc_id AS VARCHAR)) AS h
      |FROM documents
      |ORDER BY h
      |LIMIT 200""".stripMargin

  /** Robust length-outlier trim: keep documents inside the [p01, p99]
    * character-length band. The percentiles are exact (integral input, the
    * q_percentiles trick), computed in one tiny aggregate that broadcasts
    * back over the corpus scan — two passes over the data, no shuffle of
    * document rows at all.
    */
  def lengthTrim(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bounds = docs.agg(
      expr("percentile(n_chars, 0.01d)").as("p01"),
      expr("percentile(n_chars, 0.99d)").as("p99"))
    docs.crossJoin(broadcast(bounds))
      .filter(col("n_chars") >= col("p01") && col("n_chars") <= col("p99"))
      .select(col("doc_id"), col("n_chars"), col("p01"), col("p99"))
  }

  val lengthTrimSql: String =
    """WITH b AS (
      |  SELECT percentile_cont(0.01) WITHIN GROUP (ORDER BY n_chars) AS p01,
      |         percentile_cont(0.99) WITHIN GROUP (ORDER BY n_chars) AS p99
      |  FROM documents
      |)
      |SELECT doc_id, n_chars, p01, p99 FROM documents, b
      |WHERE n_chars >= p01 AND n_chars <= p99""".stripMargin

  /** Overlapping-window document chunking — the context-window prep stage
    * (RAG indexing, long-doc training samples): fixed `ChunkSize`-char
    * windows at `ChunkStride` steps, so consecutive chunks overlap by
    * size − stride chars and no text is lost. n_chunks = 1 + ⌈(len −
    * size)/stride⌉ — the LAST window is the only short one, and a doc at
    * most `size` long is exactly one chunk (no redundant tail window).
    * Chunks are generated in-row (transform + explode: map-only, no
    * shuffle) and fingerprinted so the oracle hash-checks every chunk
    * boundary without shipping chunk text. Both engines slice by
    * CHARACTER position (substring is codepoint-indexed in each), so the
    * boundaries agree on non-ASCII text too.
    */
  private val ChunkSize = 200
  private val ChunkStride = 150

  def docChunk(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("len", length(col("text")))
      .withColumn("n_chunks",
        (lit(1) + greatest(lit(0),
          expr(s"cast(ceil((len - $ChunkSize) / cast($ChunkStride as double)) as int)")))
          .cast("int"))
      .select(col("doc_id"), col("n_chunks"), explode(expr(
        s"""transform(sequence(0, n_chunks - 1), i -> named_struct(
           |  'chunk_idx', i,
           |  'chunk_len', length(substring(text, i * $ChunkStride + 1, $ChunkSize)),
           |  'chunk_md5', md5(substring(text, i * $ChunkStride + 1, $ChunkSize))))""".stripMargin)).as("c"))
      .select(col("doc_id"), col("n_chunks"),
        col("c.chunk_idx").cast("bigint").as("chunk_idx"),
        col("c.chunk_len").cast("bigint").as("chunk_len"),
        col("c.chunk_md5").as("chunk_md5"))

  val docChunkSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |         CAST(1 + greatest(0,
       |           CAST(ceil((length(text) - $ChunkSize) / CAST($ChunkStride AS DOUBLE)) AS INT)) AS INT) AS n_chunks
       |  FROM documents)
       |SELECT doc_id, n_chunks,
       |       CAST(i AS BIGINT) AS chunk_idx,
       |       CAST(length(substring(text, CAST(i * $ChunkStride + 1 AS INT), $ChunkSize)) AS BIGINT) AS chunk_len,
       |       md5(substring(text, CAST(i * $ChunkStride + 1 AS INT), $ChunkSize)) AS chunk_md5
       |FROM (SELECT doc_id, text, n_chunks,
       |        unnest(generate_series(0, n_chunks - 1)) AS i FROM d) t""".stripMargin

  /** Curriculum manifest: the (stage, shard, order_key) triple a training
    * loader sorts by to realize easy→hard ordering WITHOUT any global
    * sort. Stage 1–4 = exact token-count quartile (short docs first — the
    * standard length curriculum; thresholds are ONE broadcast percentile
    * row, the q_rfm recipe); shard = md5(doc_id) byte 0 mod 8 (the
    * doc_shard_assign hash, so curriculum sharding and storage sharding
    * agree); order_key = md5("c:" ‖ doc_id ‖ ":" ‖ stage) prefix — a
    * deterministic within-(stage, shard) shuffle, so no loader sees docs
    * in ingestion order, and re-keying per stage decorrelates the
    * stage-internal orders.
    *
    * Scale shape: pure map over the corpus plus a 1-row threshold
    * broadcast — producing the SORT KEY instead of a global rank is
    * exactly what keeps this linear at 100 TB (a row_number curriculum
    * would funnel the corpus through per-stage windows).
    */
  def curriculum(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), nTokens.as("n_tokens"))
    val th = base.agg(
      expr("percentile(n_tokens, 0.25)").as("t25"),
      expr("percentile(n_tokens, 0.5)").as("t50"),
      expr("percentile(n_tokens, 0.75)").as("t75"))
    base.crossJoin(broadcast(th))
      .withColumn("stage", expr(
        "1 + if(n_tokens > t25, 1, 0) + if(n_tokens > t50, 1, 0) + if(n_tokens > t75, 1, 0)").cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("stage"),
        (md5Byte0 % 8).as("shard"),
        substring(md5(concat(lit("c:"), col("doc_id").cast("string"),
          lit(":"), col("stage").cast("string"))), 1, 16).as("order_key"))
  }

  val curriculumSql: String =
    s"""WITH b AS (SELECT doc_id, $nTokensSql AS n_tokens FROM documents),
       |t AS (SELECT quantile_cont(n_tokens, 0.25) AS t25,
       |             quantile_cont(n_tokens, 0.5) AS t50,
       |             quantile_cont(n_tokens, 0.75) AS t75 FROM b),
       |s AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(1 + CASE WHEN n_tokens > t25 THEN 1 ELSE 0 END
       |           + CASE WHEN n_tokens > t50 THEN 1 ELSE 0 END
       |           + CASE WHEN n_tokens > t75 THEN 1 ELSE 0 END AS BIGINT) AS stage
       |  FROM b, t)
       |SELECT doc_id, n_tokens, stage,
       |  ($md5Byte0Sql) % 8 AS shard,
       |  substr(md5('c:' || CAST(doc_id AS VARCHAR) || ':' || CAST(stage AS VARCHAR)), 1, 16) AS order_key
       |FROM s""".stripMargin

  /** Dataset profile — the "data card" aggregate a training-data pipeline
    * publishes per (source, lang) stratum: document count, total chars and
    * whitespace tokens, the exact median document length, and the exact
    * duplicate-excess rate. The numbers a mixture designer reads before
    * choosing weights, as one Catalyst plan.
    *
    * Scale shapes: the median is the q_mad histogram trick — aggregate to
    * per-(source, lang, n_chars) counts first, so the cumulative window
    * runs over DISTINCT LENGTHS per stratum (bounded by the length domain,
    * not the corpus); lower-median = smallest length whose cumulative count
    * reaches half the stratum (2·cum ≥ n). The dup rate counts distinct
    * md5(text) next to COUNT(*) — exact, and the 32-hex digest (not the
    * document) is what shuffles. ppm in integral arithmetic end to end.
    */
  def datasetProfile(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val h = d.groupBy(col("source"), col("lang"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
    val cum = h.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("source"), col("lang"))
        .orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agg = d.groupBy(col("source"), col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).cast("bigint").as("total_chars"),
      sum(nTokens).cast("bigint").as("total_tokens"),
      countDistinct(md5(col("text"))).as("n_distinct"))
    val med = cum.join(agg.select(col("source"), col("lang"), col("n_docs")),
        Seq("source", "lang"))
      .filter(col("cum") * 2 >= col("n_docs"))
      .groupBy(col("source"), col("lang"))
      .agg(min(col("n_chars")).cast("bigint").as("median_chars"))
    agg.join(med, Seq("source", "lang"))
      .select(col("source"), col("lang"), col("n_docs"), col("total_chars"),
        col("total_tokens"), col("median_chars"),
        expr("CAST((n_docs - n_distinct) * 1000000 div n_docs AS BIGINT)")
          .as("dup_excess_ppm"))
  }

  val datasetProfileSql: String =
    s"""WITH h AS (
       |  SELECT source, lang, n_chars, COUNT(*) AS c
       |  FROM documents GROUP BY source, lang, n_chars),
       |cum AS (
       |  SELECT source, lang, n_chars,
       |    SUM(c) OVER (PARTITION BY source, lang ORDER BY n_chars
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM h),
       |agg AS (
       |  SELECT source, lang, COUNT(*) AS n_docs,
       |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |    CAST(SUM($nTokensSql) AS BIGINT) AS total_tokens,
       |    COUNT(DISTINCT md5(text)) AS n_distinct
       |  FROM documents GROUP BY source, lang),
       |med AS (
       |  SELECT c.source, c.lang, CAST(MIN(c.n_chars) AS BIGINT) AS median_chars
       |  FROM cum c JOIN agg a ON c.source = a.source AND c.lang = a.lang
       |  WHERE c.cum * 2 >= a.n_docs GROUP BY c.source, c.lang)
       |SELECT a.source, a.lang, a.n_docs, a.total_chars, a.total_tokens,
       |  m.median_chars,
       |  CAST((a.n_docs - a.n_distinct) * 1000000 // a.n_docs AS BIGINT)
       |    AS dup_excess_ppm
       |FROM agg a JOIN med m ON a.source = m.source AND a.lang = m.lang""".stripMargin

  /** k-anonymity audit — the re-identification risk check a privacy review
    * runs before a corpus ships: bucket documents by quasi-identifiers
    * (lang, source, length-bucket) and report, for each k threshold, how
    * many buckets (and how many documents) sit below k members. A document
    * alone in its quasi-identifier bucket is linkable even with the text
    * scrubbed — [[textanalysis.Text.scrubPii]] removes direct identifiers,
    * this measures the indirect ones.
    *
    * Scale shape: one aggregation to bucket counts (|lang|·|source|·
    * |length buckets| rows — bounded by the attribute domain, not the
    * corpus), cross joined with the 4-row threshold table; output is 4
    * rows.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val groups = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
      .agg(count(lit(1)).as("c"))
    val ks = spark.sql("SELECT explode(array(bigint(2), bigint(5), bigint(10), bigint(20))) AS k")
    groups.crossJoin(broadcast(ks))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("c") < col("k"), 1L).otherwise(0L)).cast("bigint")
          .as("n_groups_below"),
        sum(when(col("c") < col("k"), col("c")).otherwise(0L)).cast("bigint")
          .as("n_docs_below"))
  }

  val kAnonymitySql: String =
    """WITH g AS (
      |  SELECT lang, source, n_chars // 100 AS len_bucket, COUNT(*) AS c
      |  FROM documents GROUP BY lang, source, len_bucket),
      |ks AS (SELECT unnest([2, 5, 10, 20]) AS k)
      |SELECT CAST(k AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_groups,
      |  CAST(SUM(CASE WHEN c < k THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_groups_below,
      |  CAST(SUM(CASE WHEN c < k THEN c ELSE 0 END) AS BIGINT)
      |    AS n_docs_below
      |FROM g, ks GROUP BY k""".stripMargin

  /** Deterministic training-order interleave — the "global shuffle" a
    * training run needs WITHOUT a global sort: hash docs to 16 shards
    * (md5, the shard-assign convention), order WITHIN each shard by a
    * second independent md5 (so within-shard order is uncorrelated with
    * doc_id), and give row i of shard s global position i·16 + s — the
    * round-robin reader order across shard files. Reproducible across
    * engines, retries, and re-partitionings; output is the per-shard
    * position audit (count, min/max position, exact position sum) that
    * pins the full assignment without materializing corpus rows.
    *
    * Scale shape: the ONLY ordering is a per-shard window (16
    * corpus/16-sized partitions — never a global sort); positions are
    * map-side arithmetic after it; output 16 rows.
    */
  def interleave(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("ord"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), (md5Byte0 % 16).as("shard"),
        expr("md5(concat(cast(doc_id as string), ':order'))").as("ord"))
      .withColumn("pos",
        (row_number().over(w).cast("bigint") - 1L) * 16L + col("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("pos")).as("min_pos"),
        max(col("pos")).as("max_pos"),
        // Summed in decimal(38,0) (overflow-proof at 100 TB: Σpos ≤ n²·16)
        // but EMITTED as a canonical digit string — Spark decimal128 and
        // DuckDB HUGEINT print identically, while their binary/arrow
        // representations hash differently at the driver (r10 verdict).
        sum(col("pos").cast("decimal(38,0)")).cast("decimal(38,0)")
          .cast("string").as("sum_pos"))
      .orderBy(col("shard"))
  }

  val interleaveSql: String =
    s"""WITH a AS (
       |  SELECT doc_id, ($md5Byte0Sql) % 16 AS shard,
       |    md5(CAST(doc_id AS VARCHAR) || ':order') AS ord
       |  FROM documents),
       |p AS (
       |  SELECT shard,
       |    (ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord, doc_id) - 1)
       |      * 16 + shard AS pos
       |  FROM a)
       |SELECT shard, COUNT(*) AS n_docs,
       |  MIN(pos) AS min_pos, MAX(pos) AS max_pos,
       |  CAST(SUM(CAST(pos AS HUGEINT)) AS VARCHAR) AS sum_pos
       |FROM p GROUP BY shard ORDER BY shard""".stripMargin

  /** l-diversity audit — k-anonymity's complement (Machanavajjhala et
    * al., ICDE'06): a quasi-identifier group can be large (k-anonymous)
    * yet still leak if every member shares the same SENSITIVE value.
    * Groups customers by the quasi-identifiers (nation, market segment)
    * and reports each group's distinct count of account-balance bands
    * ($1000 buckets) plus whether it meets l=3. The band uses a
    * shift-then-divide (+10⁸ cents) so the negative-balance rows floor
    * identically in both engines (Spark `div` truncates toward zero,
    * DuckDB `//` floors — positive operands make them agree).
    *
    * Scale shape: one aggregation to (|nations|·|segments|) groups —
    * bounded by the attribute domain — with countDistinct over the
    * ≤ ~11-band sensitive domain; map-side partial aggregation bounds
    * the shuffle at groups × bands rows.
    */
  def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        (expr("(cast(round(c_acctbal*100) as bigint) + 100000000)" +
          " div 100000") - 1000L).as("band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("band")).as("l_distinct"))
      .withColumn("meets_l3", col("l_distinct") >= 3L)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  val lDiversitySql: String =
    """SELECT c_nationkey, c_mktsegment,
      |  COUNT(*) AS n_rows,
      |  CAST(COUNT(DISTINCT
      |    (CAST(ROUND(c_acctbal*100) AS BIGINT) + 100000000) // 100000
      |      - 1000) AS BIGINT) AS l_distinct,
      |  COUNT(DISTINCT
      |    (CAST(ROUND(c_acctbal*100) AS BIGINT) + 100000000) // 100000
      |      - 1000) >= 3 AS meets_l3
      |FROM customer
      |GROUP BY c_nationkey, c_mktsegment
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  /** DSIR-style domain-importance weighting (Xie et al. 2302.03169,
    * simplified to exact unigram ratios): each document scores by how
    * much its token distribution resembles a TARGET domain (here the
    * `lang='en'` slice) relative to the raw corpus — the importance
    * weight a data-selection pass resamples by when it wants "more data
    * that looks like the target" without training a classifier. Per
    * token g the weight is the relative-frequency ratio
    * (c_target(g)/N_target) / (c_all(g)/N_all) in exact ppm (one integer
    * division of decimal(38,0) products — c·N·10⁶ stays inside 38 digits
    * at web scale), and a document's score is the integer mean of its
    * token weights.
    *
    * Scale shape: two token-keyed counting aggregates (map-side
    * combined), the corpus totals as a broadcast 1-row aggregate, then
    * ONE vocab-sized weight table joined back to the token stream on the
    * token key — the tfidf join shape; nothing corpus-sized is ever
    * broadcast or windowed.
    */
  def domainWeight(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
    val counts = tok.groupBy(col("w")).agg(
      count(lit(1)).as("c_all"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_t"))
    val totals = tok.agg(
      count(lit(1)).as("n_all"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_t"))
    val wts = counts.crossJoin(broadcast(totals))
      .select(col("w"), expr(
        "cast(c_t as decimal(38,0)) * n_all * 1000000 div (cast(c_all as decimal(38,0)) * n_t)")
        .as("w_ppm"))
    // the weight table is vocab-sized — small at test SF but unbounded at
    // corpus scale, so pin the shuffle join (Catalyst would broadcast on
    // tiny stats and that plan dies at 100 TB)
    tok.join(wts.hint("shuffle_merge"), Seq("w"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w_ppm")).as("sum_ppm"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr("sum_ppm div n_tokens").as("score_ppm"))
      .orderBy(col("doc_id"))
  }

  val domainWeightSql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS w
      |  FROM documents),
      |counts AS (
      |  SELECT w, COUNT(*) AS c_all,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_t
      |  FROM tok GROUP BY 1),
      |totals AS (
      |  SELECT COUNT(*) AS n_all,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_t
      |  FROM tok),
      |wts AS (
      |  SELECT w,
      |    CAST(CAST(c_t AS HUGEINT) * n_all * 1000000
      |      // (CAST(c_all AS HUGEINT) * n_t) AS BIGINT) AS w_ppm
      |  FROM counts CROSS JOIN totals)
      |SELECT doc_id, lang, COUNT(*) AS n_tokens,
      |  CAST(SUM(w_ppm) AS BIGINT) // COUNT(*) AS score_ppm
      |FROM tok JOIN wts USING (w)
      |GROUP BY doc_id, lang
      |ORDER BY doc_id""".stripMargin

  /** Temperature-scaled mixture weights at α = 1/2 — the canonical
    * multilingual/multi-source mixing rule (sample source s ∝ wₛᵃ,
    * UNICODE-LM / mT5 convention): upweights the tail without flattening
    * the head the way pure balancing does. α = 1/2 is the one
    * temperature that stays ENGINE-EXACT — wₛ^0.5 is floor(sqrt(·)) of
    * the exact integer token count (IEEE sqrt is correctly rounded, the
    * count is < 2⁵³ per source, so the floor is bit-identical in both
    * engines and all downstream sums are integer sums; a general pow()
    * has no cross-engine rounding guarantee). Shares emitted in exact
    * ppm plus the upsample factor vs the raw share.
    *
    * Scale shape: one map-side-combined per-source aggregate, then a
    * |sources|-row window — bounded by the mixture config at any corpus
    * size (the mixture_weights shape).
    */
  def mixtureTemperature(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(nTokens).as("src_tokens"))
      .withColumn("sq", expr("cast(floor(sqrt(cast(src_tokens as double))) as bigint)"))
    val w = Window.partitionBy()
    perSource
      .withColumn("total_tokens", sum(col("src_tokens")).over(w))
      .withColumn("total_sq", sum(col("sq")).over(w))
      .select(col("source"), col("n_docs"), col("src_tokens"),
        expr("src_tokens * 1000000 div total_tokens").as("raw_share_ppm"),
        expr("sq * 1000000 div total_sq").as("temp_share_ppm"))
      .withColumn("boost_ppm", expr(
        "temp_share_ppm * 1000000 div greatest(raw_share_ppm, 1L)"))
      .orderBy(col("source"))
  }

  val mixtureTemperatureSql: String =
    s"""WITH s AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM($nTokensSql) AS BIGINT) AS src_tokens
       |  FROM documents GROUP BY 1),
       |q AS (
       |  SELECT source, n_docs, src_tokens,
       |    CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS sq
       |  FROM s),
       |t AS (
       |  SELECT *, CAST(SUM(src_tokens) OVER () AS BIGINT) AS total_tokens,
       |    CAST(SUM(sq) OVER () AS BIGINT) AS total_sq
       |  FROM q)
       |SELECT source, n_docs, src_tokens,
       |  src_tokens * 1000000 // total_tokens AS raw_share_ppm,
       |  sq * 1000000 // total_sq AS temp_share_ppm,
       |  (sq * 1000000 // total_sq) * 1000000
       |    // greatest(src_tokens * 1000000 // total_tokens, 1) AS boost_ppm
       |FROM t ORDER BY source""".stripMargin

  /** Greedy token-budget curation: each source gets a budget of 60% of
    * its own token mass, filled greedily down a deterministic quality
    * ordering (information-density proxy: chars-per-token, doc_id
    * tie-break) — the "keep the best N tokens per domain" step between
    * scoring and mixture in a training-data pipeline (quality-pruning a
    * la curriculum corpus selection, but BUDGETED in tokens, which is
    * what the training run actually consumes, not in documents).
    *
    * Keep rule is the exact prefix knapsack: a doc survives iff the
    * RUNNING token total through it (inclusive, in quality order) still
    * fits the budget — all integer arithmetic (budget = tot·6 div 10),
    * so the cut point is engine-exact. The window is source-partitioned
    * (the documents-table prep discipline); the greedy prefix is
    * inherently sequential per source, and at corpus scale the same
    * plan holds per source-shard with budgets split proportionally.
    */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), nTokens.as("n_tokens"),
        expr("n_chars div " +
          "(length(text) - length(replace(text, ' ', '')) + 1)")
          .cast("bigint").as("density"))
    val budgets = base.groupBy(col("source"))
      .agg(expr("sum(n_tokens) * 6 div 10").cast("bigint").as("budget"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("density").desc, col("doc_id"))
    base
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("bigint"))
      .join(broadcast(budgets), Seq("source"))
      .filter(col("cum_tokens") <= col("budget"))
      .select(col("source"), col("doc_id"), col("rk"), col("density"),
        col("n_tokens"), col("cum_tokens"), col("budget"))
  }

  val tokenBudgetSql: String =
    s"""WITH base AS (
      |  SELECT source, doc_id, $nTokensSql AS n_tokens,
      |    CAST(n_chars // $nTokensSql AS BIGINT) AS density
      |  FROM documents),
      |budgets AS (
      |  SELECT source,
      |    CAST(SUM(n_tokens) * 6 // 10 AS BIGINT) AS budget
      |  FROM base GROUP BY 1),
      |walked AS (
      |  SELECT source, doc_id, density, n_tokens,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY density DESC, doc_id) AS BIGINT) AS rk,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY source
      |      ORDER BY density DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_tokens
      |  FROM base)
      |SELECT w.source, doc_id, rk, density,
      |  CAST(n_tokens AS BIGINT) AS n_tokens, cum_tokens, budget
      |FROM walked w JOIN budgets b ON w.source = b.source
      |WHERE cum_tokens <= budget""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_token_budget" -> (tokenBudget _),
    "mixture_temperature" -> (mixtureTemperature _),
    "doc_domain_weight" -> (domainWeight _),
    "dataset_profile" -> (datasetProfile _),
    "q_kanon" -> (kAnonymity _),
    "q_ldiversity" -> (lDiversity _),
    "doc_interleave" -> (interleave _),
    "doc_curriculum" -> (curriculum _),
    "doc_chunk" -> (docChunk _),
    "pack_sequences" -> (packSequences _),
    "sample_stratified" -> (sampleStratified _),
    "text_normalize" -> (textNormalize _),
    "doc_shard_assign" -> (shardAssign _),
    "doc_split" -> (docSplit _),
    "text_contamination" -> (contamination _),
    "mixture_weights" -> (mixtureWeights _),
    "mixture_apply" -> (mixtureApply _),
    "doc_repeat_upsample" -> (repeatUpsample _),
    "doc_sample_exact_k" -> (sampleExactK _),
    "doc_length_trim" -> (lengthTrim _))

  val oracles: Map[String, String] = Map(
    "doc_token_budget" -> tokenBudgetSql,
    "mixture_temperature" -> mixtureTemperatureSql,
    "doc_domain_weight" -> domainWeightSql,
    "dataset_profile" -> datasetProfileSql,
    "q_kanon" -> kAnonymitySql,
    "q_ldiversity" -> lDiversitySql,
    "doc_interleave" -> interleaveSql,
    "doc_curriculum" -> curriculumSql,
    "doc_chunk" -> docChunkSql,
    "pack_sequences" -> packSequencesSql,
    "sample_stratified" -> sampleStratifiedSql,
    "text_normalize" -> textNormalizeSql,
    "doc_shard_assign" -> shardAssignSql,
    "doc_split" -> docSplitSql,
    "text_contamination" -> contaminationSql,
    "mixture_weights" -> mixtureWeightsSql,
    "mixture_apply" -> mixtureApplySql,
    "doc_repeat_upsample" -> repeatUpsampleSql,
    "doc_sample_exact_k" -> sampleExactKSql,
    "doc_length_trim" -> lengthTrimSql)
}
