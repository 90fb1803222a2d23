package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * The testdata has no binary table, so payloads are derived (text → utf8
  * bytes); what matters — and is real and tested — is the Spark-side shape:
  * binary columns kept separate from metadata (so column pruning skips
  * payload IO when only metadata is read), per-partition batch processing
  * with typed Encoders, and bounded frame sampling. `fakeDecode` remains a
  * clearly-marked deterministic STUB (its header-parse arithmetic is what
  * the oracle mirrors), but since round 11 the plumbing ALSO carries real
  * codecs — the JDK's own PNG/JPEG (javax.imageio) and RIFF/WAVE
  * (javax.sound.sampled) implementations in [[codecRoundtrip]] and
  * [[wavStats]], and a real multi-frame container (animated GIF) in
  * [[gifFrames]]. True video codecs (H.264 etc.) stay stubbed — none
  * exists in the JDK and this container has no native media libs.
  */
object Blobs {

  case class BlobMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      channels: Int, mean_byte: Double)

  /** STUB decoder — deterministic fake "header parse". Replace with a real
    * codec (e.g. JNI image lib) in production; signature stays identical.
    */
  private def fakeDecode(id: Long, bytes: Array[Byte]): BlobMeta = {
    // payloads shorter than the 4-byte "header" decode to a default frame;
    // empty payloads get mean 0 (no divide-by-zero)
    def b(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else 0
    val w = 64 + ((b(0) << 8 | b(1)) % 960)
    val h = 64 + ((b(2) << 8 | b(3)) % 960)
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
    val mean = if (bytes.length == 0) 0.0 else s.toDouble / bytes.length
    BlobMeta(id, bytes.length, w, h, 3, mean)
  }

  /** Binary decode + feature extraction over partition-local batches.
    * `mapPartitions` (not per-row UDF) so a real codec could amortize
    * init cost per partition; output is a typed Dataset with a flat schema.
    */
  def decodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => fakeDecode(id, bytes) })
      .toDF()
  }

  /** DuckDB mirror of `decodeStats` — byte arithmetic over hex-string
    * windows (the `frameSampleSql` trick, round-4 verdict item 1): byte i
    * of the utf-8 payload decodes from its 2 hex chars via strpos on the
    * hex alphabet. Header bytes beyond the payload read as 0, exactly like
    * `fakeDecode`'s `b(i)`; the empty payload means 0.0, not NULL. The
    * mean is one IEEE division of an exact integer sum by an exact length,
    * so doubles match bit-for-bit.
    */
  val decodeStatsSql: String = {
    def byteAt(i: Int): String =
      s"CASE WHEN nb > $i THEN (strpos('0123456789ABCDEF', substring(hx, ${i * 2 + 1}, 1)) - 1) * 16" +
        s" + (strpos('0123456789ABCDEF', substring(hx, ${i * 2 + 2}, 1)) - 1) ELSE 0 END"
    s"""WITH d AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |         octet_length(encode(text)) AS nb
       |  FROM documents),
       |hdr AS (
       |  SELECT doc_id, nb,
       |         ${byteAt(0)} AS b0, ${byteAt(1)} AS b1,
       |         ${byteAt(2)} AS b2, ${byteAt(3)} AS b3
       |  FROM d),
       |s AS (
       |  SELECT doc_id,
       |         SUM((strpos('0123456789ABCDEF', substring(hx, i*2+1, 1)) - 1) * 16
       |           + (strpos('0123456789ABCDEF', substring(hx, i*2+2, 1)) - 1)) AS sumb
       |  FROM (SELECT doc_id, hx, unnest(generate_series(0, nb-1)) AS i FROM d) t
       |  GROUP BY doc_id)
       |SELECT h.doc_id, CAST(h.nb AS INT) AS n_bytes,
       |       CAST(64 + ((h.b0 * 256 + h.b1) % 960) AS INT) AS width,
       |       CAST(64 + ((h.b2 * 256 + h.b3) % 960) AS INT) AS height,
       |       CAST(3 AS INT) AS channels,
       |       CASE WHEN h.nb = 0 THEN 0.0 ELSE CAST(s.sumb AS DOUBLE) / h.nb END AS mean_byte
       |FROM hdr h LEFT JOIN s ON h.doc_id = s.doc_id""".stripMargin
  }

  /** Frame sampling shape: stride-16 BYTE slices of the payload, at most 8
    * frames per blob, each fingerprinted — all inside codegen'd builtins
    * (binary substring + hex + md5), no decode needed for sampling.
    *
    * The fingerprint is md5 over the frame's hex encoding rather than a
    * native 64-bit hash so the whole operator is oracle-checkable: DuckDB
    * cannot substring a BLOB, but `substring(hex(encode(text)), i*32+1, 32)`
    * slices the SAME bytes as Spark's binary `substring(payload, i*16+1,
    * 16)` (both engines emit uppercase hex), byte-faithful for non-ASCII
    * text where char-based slicing would diverge.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("n_frames", greatest((length(col("payload")) / 16).cast("int"), lit(1)))
      .select(col("doc_id"), col("n_frames"), explode(expr(
        """transform(sequence(0, least(n_frames - 1, 7)),
          |  i -> named_struct('frame_idx', i, 'frame_hash', md5(hex(substring(payload, i*16+1, 16)))))""".stripMargin))
        .as("f"))
      .select(col("doc_id"), col("n_frames"),
        col("f.frame_idx").as("frame_idx"), col("f.frame_hash").as("frame_hash"))

  /** DuckDB mirror of `frameSample` — byte slicing via hex-string windows
    * (2 hex chars per byte, so frame i = 32 chars at offset i*32).
    * `//` floors like Spark's cast-to-int on a positive double; plain
    * DuckDB CAST would round-to-nearest and disagree on 24-byte docs.
    */
  val frameSampleSql: String =
    """WITH d AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |         greatest(CAST(octet_length(encode(text)) // 16 AS INT), 1) AS n_frames
      |  FROM documents
      |)
      |SELECT doc_id, n_frames,
      |       CAST(frame_idx AS INT) AS frame_idx,
      |       md5(substring(hx, frame_idx * 32 + 1, 32)) AS frame_hash
      |FROM (SELECT doc_id, hx, n_frames,
      |        unnest(generate_series(0, least(n_frames - 1, 7))) AS frame_idx
      |      FROM d) t""".stripMargin

  /** Blob → embedding feature extraction (stub): a 16-dim byte-histogram
    * embedding, L2-normalized, produced per partition. The output column is
    * `array<float>` with the same shape as the `embeddings` table, so the
    * ANN/dedup operators compose directly on top — the real pipeline would
    * only swap the histogram for a model forward pass.
    */
  def embed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val h = new Array[Float](16)
        var i = 0
        while (i < bytes.length) { h((bytes(i) & 0xff) % 16) += 1f; i += 1 }
        var n = 0.0
        var j = 0
        while (j < 16) { n += h(j) * h(j); j += 1 }
        val inv = if (n == 0) 0f else (1.0 / math.sqrt(n)).toFloat
        var k = 0
        while (k < 16) { h(k) *= inv; k += 1 }
        (id, h)
      })
      .toDF("doc_id", "embedding")
  }

  /** Driver-verifiable view of `embed`: one row per (doc, dim) with the raw
    * histogram count (exact integer) and the L2-normalized weight rounded to
    * 6 decimals — scalar sortable columns, fully recomputable in ANSI SQL.
    * The histogram is over Unicode CODEPOINTS (`String.codePoints`), exactly
    * what the oracle's per-character ord() computes — so parity holds for
    * non-ASCII text too, where UTF-8 bytes would diverge (one multi-byte
    * char = several bytes but one codepoint). Division — not
    * multiply-by-reciprocal — to match the oracle's IEEE op sequence.
    */
  def embedExploded(spark: SparkSession, dir: String): DataFrame =
    embedExplodedOf(spark, Tables.documents(spark, dir))

  private[graft] def embedExplodedOf(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val h = new Array[Long](16)
        val cps = text.codePoints().iterator()
        while (cps.hasNext) h(cps.nextInt() % 16) += 1L
        var n = 0.0
        var j = 0
        while (j < 16) { n += h(j).toDouble * h(j); j += 1 }
        val nrm = math.sqrt(n)
        (0 until 16).map { d =>
          val w = if (nrm == 0) 0.0 else h(d) / nrm
          (id, d.toLong, h(d), w)
        }
      })
      .toDF("doc_id", "dim", "cnt", "weight")
      .withColumn("weight", round(col("weight"), 6))
  }

  val embedExplodedSql: String =
    """WITH c AS (
      |  SELECT doc_id, ord(u.ch) % 16 AS dim
      |  FROM documents, unnest(string_split(text, '')) AS u(ch)
      |), h AS (
      |  SELECT doc_id, dim, count(*) AS cnt FROM c GROUP BY 1, 2
      |), dims AS (
      |  SELECT d.doc_id, r.range AS dim
      |  FROM (SELECT DISTINCT doc_id FROM documents) d CROSS JOIN range(16) r
      |), f AS (
      |  SELECT dims.doc_id, CAST(dims.dim AS BIGINT) AS dim,
      |         CAST(coalesce(h.cnt, 0) AS BIGINT) AS cnt
      |  FROM dims LEFT JOIN h ON dims.doc_id = h.doc_id AND dims.dim = h.dim
      |)
      |SELECT doc_id, dim, cnt,
      |  round(CASE WHEN nrm = 0 THEN 0.0 ELSE cnt / nrm END, 6) AS weight
      |FROM (SELECT doc_id, dim, cnt,
      |        sqrt(sum(cnt*cnt) OVER (PARTITION BY doc_id)) AS nrm FROM f) t""".stripMargin

  /** Perceptual-hash near-dup over blob payloads (round 6) — the dedup
    * family extended to the multimodal column. The hash is average-hash
    * (aHash, public): partition the payload into 64 byte buckets (the 8×8
    * grid of the image version), bit i = bucket-sum i above the mean —
    * computed as the integer comparison s·64 > total so there is no
    * division anywhere. On real images the buckets are downsampled
    * pixels; with the stub decode they are raw byte windows — swapping in
    * a codec changes ONE mapPartitions stage, never the banding/verify
    * plan. Blocking + verify is exactly the dedup_simhash machinery:
    * 4×16-bit bands (Hamming ≤ 3 ⇒ shared band by pigeonhole), hot-bucket
    * cap, exact Hamming ≤ 8 verify, best candidate per doc.
    *
    * Fully deterministic — the oracle replays hash, banding, AND verify
    * with HUGEINT bit arithmetic (the dedup_simhash idioms).
    */
  def phashDedup(spark: SparkSession, dir: String, maxBucket: Int = 10000): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hashed = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val n = bytes.length
        val sums = new Array[Long](64)
        var i = 0
        while (i < n) { sums(((i.toLong * 64) / n).toInt) += (bytes(i) & 0xff); i += 1 }
        var total = 0L
        var j = 0
        while (j < 64) { total += sums(j); j += 1 }
        var h = 0L
        j = 0
        while (j < 64) { if (sums(j) * 64 > total) h |= (1L << j); j += 1 }
        (id, h)
      }).toDF("doc_id", "phash")
    val bands = graft.dedup.Dedup.capBuckets(
      hashed.select(col("doc_id"), col("phash"), explode(expr(
        "transform(sequence(0, 3), b -> named_struct('band', b, 'bv', shiftright(phash, 16*b) & 65535))")).as("bb"))
        .select(col("doc_id"), col("phash"), col("bb.band").as("band"), col("bb.bv").as("bv")),
      Seq("band", "bv"), maxBucket, "phash_bucket_cap")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("bit_count(a.phash ^ b.phash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
    val directed = cand.select(col("id_a").as("doc_id"), col("id_b").as("cand_id"), col("hamming"))
      .unionAll(cand.select(col("id_b").as("doc_id"), col("id_a").as("cand_id"), col("hamming")))
    val best = directed.withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("hamming"), col("cand_id"))))
      .filter(col("rn") === 1).drop("rn")
    hashed.select(col("doc_id"), col("phash"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("phash"), col("cand_id").as("dup_candidate"), col("hamming"))
  }

  /** DuckDB replay of [[phashDedup]]: hex-window byte extraction (the
    * decodeStats trick), integer bucket sums, HUGEINT bit assembly with
    * the signed-64 wrap before Hamming (the dedup_simhash idioms).
    */
  val phashDedupSql: String =
    """WITH d0 AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |         octet_length(encode(text)) AS n
      |  FROM documents),
      |by AS (
      |  SELECT doc_id, CAST((CAST(i AS BIGINT) * 64) // n AS INT) AS bucket,
      |    (strpos('0123456789ABCDEF', substr(hx, i*2+1, 1)) - 1) * 16
      |    + strpos('0123456789ABCDEF', substr(hx, i*2+2, 1)) - 1 AS bv
      |  FROM d0, unnest(generate_series(0, n-1)) t(i)
      |  WHERE n > 0),
      |bs AS (SELECT doc_id, bucket, CAST(SUM(bv) AS BIGINT) AS s FROM by GROUP BY 1, 2),
      |grid AS (SELECT d0.doc_id, r.range AS bucket FROM d0 CROSS JOIN range(64) r),
      |bsum AS (
      |  SELECT g.doc_id, g.bucket, coalesce(bs.s, 0) AS s
      |  FROM grid g LEFT JOIN bs ON bs.doc_id = g.doc_id AND bs.bucket = g.bucket),
      |tot AS (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS total FROM bsum GROUP BY 1),
      |hu0 AS (
      |  SELECT b.doc_id,
      |    SUM(CASE WHEN b.s * 64 > t.total THEN CAST(power(2, b.bucket) AS HUGEINT)
      |          ELSE CAST(0 AS HUGEINT) END) AS hu
      |  FROM bsum b JOIN tot t USING (doc_id) GROUP BY 1),
      |d AS (
      |  SELECT doc_id, hu,
      |    CAST(CASE WHEN hu >= CAST('9223372036854775808' AS HUGEINT)
      |      THEN hu - CAST('18446744073709551616' AS HUGEINT) ELSE hu END AS BIGINT) AS phash
      |  FROM hu0),
      |bands AS (
      |  SELECT doc_id, b.range AS band,
      |         (hu // CAST(power(2, 16 * b.range) AS HUGEINT)) % 65536 AS bv
      |  FROM d CROSS JOIN range(4) b),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT c.id_a, c.id_b, bit_count(xor(da.phash, db.phash)) AS hamming
      |  FROM cand c
      |  JOIN d da ON da.doc_id = c.id_a
      |  JOIN d db ON db.doc_id = c.id_b
      |  WHERE bit_count(xor(da.phash, db.phash)) <= 8),
      |directed AS (
      |  SELECT id_a AS doc_id, id_b AS cand_id, hamming FROM pairs
      |  UNION ALL
      |  SELECT id_b AS doc_id, id_a AS cand_id, hamming FROM pairs),
      |best AS (
      |  SELECT doc_id, cand_id, hamming
      |  FROM (SELECT doc_id, cand_id, hamming,
      |          row_number() OVER (PARTITION BY doc_id
      |                             ORDER BY hamming, cand_id) AS rn
      |        FROM directed) t
      |  WHERE rn = 1)
      |SELECT d.doc_id, d.phash, best.cand_id AS dup_candidate,
      |       CAST(best.hamming AS INT) AS hamming
      |FROM d LEFT JOIN best ON d.doc_id = best.doc_id""".stripMargin

  /** Resize shape — the remaining multimodal verb next to decode /
    * feature-extract / frame-sample: aspect-fit target dims from the
    * decoded header (longest side → 224, exact integer division) plus a
    * THUMBNAIL FINGERPRINT — md5 over 64 stride-sampled bytes of the
    * payload, the "did the downsample see the same pixels" check a real
    * resize kernel would be validated against. Pure map stage over
    * codegen'd builtins (hex window slicing — no decode, no UDF); the
    * DuckDB mirror samples the identical hex windows, so both dims and
    * fingerprint are hash-checked. Samples past the payload end read as
    * empty on both engines (the frameSample convention).
    */
  def resize(spark: SparkSession, dir: String): DataFrame = {
    def b(i: Int): String =
      s"if(nb > $i, cast(conv(substring(hx, ${i * 2 + 1}, 2), 16, 10) as int), 0)"
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("nb", length(col("payload")).cast("int"))
      .withColumn("hx", hex(col("payload")))
      .withColumn("width", expr(s"64 + ((${b(0)} * 256 + ${b(1)}) % 960)"))
      .withColumn("height", expr(s"64 + ((${b(2)} * 256 + ${b(3)}) % 960)"))
      .withColumn("stride", expr("greatest(nb div 64, 1)"))
      .select(col("doc_id"), col("width"), col("height"),
        expr("cast(width * 224 div greatest(width, height) as int)").as("out_w"),
        expr("cast(height * 224 div greatest(width, height) as int)").as("out_h"),
        expr("md5(concat_ws('', transform(sequence(0, 63), i -> substring(hx, i * stride * 2 + 1, 2))))")
          .as("thumb_hash"))
  }

  /** DuckDB mirror of [[resize]] — header bytes via the [[decodeStatsSql]]
    * hex-strpos trick, dims by the same integer divisions, and the
    * thumbnail fingerprint over the identical 64 hex windows.
    */
  val resizeSql: String = {
    def byteAt(i: Int): String =
      s"CASE WHEN nb > $i THEN (strpos('0123456789ABCDEF', substring(hx, ${i * 2 + 1}, 1)) - 1) * 16" +
        s" + (strpos('0123456789ABCDEF', substring(hx, ${i * 2 + 2}, 1)) - 1) ELSE 0 END"
    s"""WITH d AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |         octet_length(encode(text)) AS nb
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, hx, nb, greatest(nb // 64, 1) AS stride,
       |         64 + ((${byteAt(0)} * 256 + ${byteAt(1)}) % 960) AS width,
       |         64 + ((${byteAt(2)} * 256 + ${byteAt(3)}) % 960) AS height
       |  FROM d)
       |SELECT doc_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       |  CAST(width * 224 // greatest(width, height) AS INT) AS out_w,
       |  CAST(height * 224 // greatest(width, height) AS INT) AS out_h,
       |  md5(list_aggregate(list_transform(generate_series(0, 63),
       |    i -> substring(hx, i * stride * 2 + 1, 2)), 'string_agg', '')) AS thumb_hash
       |FROM h""".stripMargin
  }

  /** Video scene-cut detection over the sampled frame stream: per frame a
    * 16-bit signature (byte-vs-frame-mean threshold — the [[phashDedup]]
    * scheme at frame granularity, but in PURE codegen SQL: bytes decode
    * from hex-string windows, no mapPartitions), then a per-video lag
    * compares consecutive signatures and flags a cut when the Hamming
    * distance ≥ 6 of 16 bits. Real plumbing, stub pixels: swapping the
    * hex-byte signature for a real frame histogram touches ONE expression.
    * Output: per-video frame count, cut count, max inter-frame distance.
    *
    * Scale shape: explode is bounded (≤ 16 frames/video), the window
    * partitions by doc_id (bounded frames per partition key), one
    * aggregation back to videos — linear in corpus, no corpus window.
    */
  def sceneCuts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b: Int => String = k =>
      s"coalesce(cast(conv(substring(hx, frame_idx*32 + ${2 * k + 1}, 2), 16, 10) as bigint), 0L)"
    val totalExpr = (0 until 16).map(b).mkString(" + ")
    val sigExpr = (0 until 16)
      .map(k => s"if(${b(k)} * 16 > total, ${1L << k}L, 0L)").mkString(" + ")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    // spread BEFORE the per-frame signature projection (guide §2.5/§2.6 +
    // the Tables.spread defect class): documents is a single-row-group
    // file at test SFs, and the ~32 conv() calls per exploded frame row
    // sit BELOW the window's exchange, so they inherited the scan's 1-2
    // input splits and serialized ~2.5M hex-byte parses on one core. The
    // round-robin moves only (doc_id, text) — KB-scale here, and on a
    // well-laid-out corpus the scan has enough splits that this exchange
    // is AQE-coalesced noise next to the per-row decode it parallelizes.
    // (A fully row-local rewrite — 16 literal-index signatures + adjacent
    // hamming in ONE projection, no explode/window/agg — was tried and
    // measured 2x WORSE: the 512-conv expressions exceed the JIT's huge-
    // method limit and the generated code runs interpreted. Small
    // per-row expressions + one narrow exchange is the faster shape.)
    Tables.spread(Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), hex(col("text").cast("binary")).as("hx"),
        greatest((length(col("text").cast("binary")) / 16).cast("int"), lit(1)).as("n_frames"))
      .select(col("doc_id"), col("hx"),
        explode(expr("sequence(0, least(n_frames - 1, 15))")).as("frame_idx"))
      .withColumn("total", expr(totalExpr))
      .withColumn("sig", expr(sigExpr))
      .withColumn("prev_sig", lag(col("sig"), 1).over(w))
      .withColumn("hamming",
        when(col("prev_sig").isNull, lit(null))
          .otherwise(expr("bit_count(sig ^ prev_sig)").cast("long")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames_sampled"),
        sum(when(col("hamming") >= 6, 1L).otherwise(0L)).as("n_cuts"),
        max(col("hamming")).as("max_hamming"))
  }

  /** DuckDB replay of [[sceneCuts]] — bytes via the uppercase-hex strpos
    * walk (substr past the payload end is guarded to 0, matching Spark's
    * conv('') → NULL → coalesce 0).
    */
  val sceneCutsSql: String = {
    val hex = "'0123456789ABCDEF'"
    val b: Int => String = k => {
      val sub = s"substr(hx, frame_idx*32 + ${2 * k + 1}, 2)"
      s"(CASE WHEN length($sub) = 2 THEN (strpos($hex, substr($sub, 1, 1)) - 1) * 16" +
        s" + strpos($hex, substr($sub, 2, 1)) - 1 ELSE 0 END)"
    }
    val totalExpr = (0 until 16).map(b).mkString(" + ")
    val sigExpr = (0 until 16)
      .map(k => s"(CASE WHEN ${b(k)} * 16 > total THEN ${1L << k} ELSE 0 END)").mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |         greatest(CAST(octet_length(encode(text)) // 16 AS INT), 1) AS n_frames
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, hx, CAST(unnest(generate_series(0, least(n_frames - 1, 15))) AS INT) AS frame_idx
       |  FROM d),
       |t AS (SELECT doc_id, frame_idx, $totalExpr AS total, hx FROM f),
       |s AS (SELECT doc_id, frame_idx, $sigExpr AS sig FROM t),
       |l AS (
       |  SELECT doc_id, sig,
       |    lag(sig) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_sig
       |  FROM s)
       |SELECT doc_id, COUNT(*) AS n_frames_sampled,
       |  CAST(SUM(CASE WHEN prev_sig IS NOT NULL AND bit_count(CAST(xor(sig, prev_sig) AS BIGINT)) >= 6
       |       THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       |  CAST(MAX(CASE WHEN prev_sig IS NULL THEN NULL
       |       ELSE bit_count(CAST(xor(sig, prev_sig) AS BIGINT)) END) AS BIGINT) AS max_hamming
       |FROM l GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------------------
  // REAL codecs (round 11). The container has no native image/audio libs,
  // but the JDK itself ships genuine codecs: javax.imageio (PNG, JPEG) and
  // javax.sound.sampled (RIFF/WAVE). These two operators run them through
  // the same mapPartitions plumbing as the stubbed decode — so the
  // "decode stubbed" caveat no longer covers the whole family: a real
  // lossless PNG round-trip, a real lossy JPEG decode, and a real WAV
  // header parse execute inside Spark tasks, and the DuckDB oracle checks
  // the DECODED output against the closed-form generator (the oracle never
  // touches a codec — if ImageIO/AudioSystem misparsed a byte, the hash
  // fails).
  //
  // Generator: each doc's payload seeds a deterministic pixel/sample
  // stream via chained md5 (seed = md5(payload); block k = md5(seed +
  // ":png:" + k)) — the same engine-portable md5-hex arithmetic used by
  // doc_split / emb_pq, so DuckDB reproduces the EXPECTED bytes with
  // md5(md5(text) || ':png:' || k) and never needs the image itself.

  private val HexAlphabet = "0123456789abcdef"

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  private def md5Bytes(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** 64-byte deterministic stream: 4 chained-md5 blocks off a seed. */
  private def pixelStream(seedHex: String, tag: String): Array[Byte] =
    (0 until 4).flatMap(k => md5Bytes(s"$seedHex:$tag:$k")).toArray

  case class CodecStats(doc_id: Long, width: Int, height: Int,
      px_sum: Long, px_min: Int, px_max: Int,
      png_ok: Boolean, jpeg_ok: Boolean)

  /** Real PNG + JPEG codec round-trip (javax.imageio) over a
    * payload-seeded 8×8 grayscale raster, per partition batch.
    *
    * PNG leg: encode the noise raster with the JDK PNG writer, decode it
    * back with the JDK PNG reader, and emit the DECODED pixel stats —
    * PNG is lossless, so they must equal the generator's closed form
    * (the DuckDB oracle), and `png_ok` asserts the byte-exact round-trip
    * in-task. JPEG leg: a flat raster (DC-only block) through the JDK
    * JPEG writer/reader; lossy, but a constant block survives the DCT
    * within ±3, which `jpeg_ok` asserts (emitting a bounded boolean, not
    * the platform-shaped error surface — the mm_decode_stats convention).
    *
    * Scale shape: map-only over (doc_id, payload); codec objects are
    * JVM-static, `ImageIO.setUseCache(false)` keeps the encode in-heap
    * (no temp-file IO per blob); 64-byte rasters bound per-row work.
    */
  def codecRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    codecStatsOf(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])])
      .toDF()
  }

  /** The codec transformation itself, over any (doc_id, payload) Dataset —
    * a STATELESS typed mapPartitions, so the identical code path runs in a
    * batch plan and inside Structured Streaming micro-batches (proven
    * equivalent in CodecSpec's streaming case).
    */
  private[graft] def codecStatsOf(
      ds: org.apache.spark.sql.Dataset[(Long, Array[Byte])]):
      org.apache.spark.sql.Dataset[CodecStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val seed = md5Hex(payload)
          val px = pixelStream(seed, "png")
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          img.getRaster.setDataElements(0, 0, 8, 8, px)
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          val dec = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(baos.toByteArray))
          val back = new Array[Byte](64)
          dec.getRaster.getDataElements(0, 0, 8, 8, back)
          var sum = 0L; var mn = 255; var mx = 0
          var i = 0
          while (i < 64) {
            val v = back(i) & 0xff
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          val pngOk = dec.getWidth == 8 && dec.getHeight == 8 &&
            java.util.Arrays.equals(px, back)
          // JPEG: flat value = first byte of a distinct chained digest
          val flat = md5Bytes(s"$seed:jpg")(0)
          val jimg = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          jimg.getRaster.setDataElements(0, 0, 8, 8, Array.fill(64)(flat))
          val jb = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(jimg, "jpg", jb)
          val jdec = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(jb.toByteArray))
          val jback = new Array[Byte](64)
          jdec.getRaster.getDataElements(0, 0, 8, 8, jback)
          val flatV = flat & 0xff
          var jerr = 0
          var j = 0
          while (j < 64) {
            val e = math.abs((jback(j) & 0xff) - flatV)
            if (e > jerr) jerr = e
            j += 1
          }
          val jpegOk = jdec.getWidth == 8 && jdec.getHeight == 8 && jerr <= 3
          CodecStats(id, dec.getWidth, dec.getHeight, sum, mn, mx, pngOk, jpegOk)
        }
      }
  }

  /** DuckDB mirror of [[codecRoundtrip]]: the generator's closed form —
    * byte j of chained digest k via lowercase-hex strpos arithmetic; the
    * codec booleans are literal TRUE (Spark computes them from the real
    * decode, so a misbehaving codec breaks the hash). SUM over the 64
    * pixel grid is cast to BIGINT (≤ 64·255, nowhere near overflow; the
    * cast avoids DuckDB's HUGEINT sum type — the r10 decimal128 lesson).
    */
  val codecRoundtripSql: String =
    """WITH d AS (SELECT doc_id, md5(text) AS seed FROM documents),
      |grid AS (SELECT k, j
      |         FROM (SELECT unnest(generate_series(0, 3)) AS k),
      |              (SELECT unnest(generate_series(0, 15)) AS j)),
      |px AS (
      |  SELECT d.doc_id,
      |         (strpos('0123456789abcdef',
      |            substring(md5(d.seed || ':png:' || g.k), g.j*2+1, 1)) - 1) * 16
      |       + (strpos('0123456789abcdef',
      |            substring(md5(d.seed || ':png:' || g.k), g.j*2+2, 1)) - 1) AS v
      |  FROM d, grid g)
      |SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
      |       CAST(SUM(v) AS BIGINT) AS px_sum,
      |       CAST(MIN(v) AS INT) AS px_min, CAST(MAX(v) AS INT) AS px_max,
      |       TRUE AS png_ok, TRUE AS jpeg_ok
      |FROM px GROUP BY doc_id""".stripMargin

  case class WavStats(doc_id: Long, sample_rate: Int, bits: Int,
      channels: Int, n_frames: Long, smp_sum: Long, smp_min: Int,
      smp_max: Int, wav_ok: Boolean)

  /** Real RIFF/WAVE codec path (javax.sound.sampled): write a 64-sample
    * 8-bit-unsigned-PCM mono stream through the JDK WAV writer, re-parse
    * the container with AudioSystem, and emit the format fields the
    * DECODER reports (sample rate, bit depth, channel count, frame count)
    * plus the decoded-sample stats — all checked against the closed-form
    * generator by the oracle. A misread fmt-chunk field or sample byte
    * breaks the hash; `wav_ok` additionally asserts the byte-exact PCM
    * round-trip in-task.
    */
  def wavStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val seed = md5Hex(payload)
          val samples = pixelStream(seed, "wav")
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1,
            /* signed = */ false, /* bigEndian = */ false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
          val baos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
          val dec = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(baos.toByteArray))
          val df = dec.getFormat
          val back = dec.readAllBytes()
          var sum = 0L; var mn = 255; var mx = 0
          var i = 0
          while (i < back.length) {
            val v = back(i) & 0xff
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          WavStats(id, df.getSampleRate.toInt, df.getSampleSizeInBits,
            df.getChannels, dec.getFrameLength, sum, mn, mx,
            java.util.Arrays.equals(samples, back))
        }
      }
      .toDF()
  }

  /** DuckDB mirror of [[wavStats]] — generator closed form + the WAV
    * format literals the decoder must report back. */
  val wavStatsSql: String =
    """WITH d AS (SELECT doc_id, md5(text) AS seed FROM documents),
      |grid AS (SELECT k, j
      |         FROM (SELECT unnest(generate_series(0, 3)) AS k),
      |              (SELECT unnest(generate_series(0, 15)) AS j)),
      |smp AS (
      |  SELECT d.doc_id,
      |         (strpos('0123456789abcdef',
      |            substring(md5(d.seed || ':wav:' || g.k), g.j*2+1, 1)) - 1) * 16
      |       + (strpos('0123456789abcdef',
      |            substring(md5(d.seed || ':wav:' || g.k), g.j*2+2, 1)) - 1) AS v
      |  FROM d, grid g)
      |SELECT doc_id, CAST(8000 AS INT) AS sample_rate, CAST(8 AS INT) AS bits,
      |       CAST(1 AS INT) AS channels, CAST(64 AS BIGINT) AS n_frames,
      |       CAST(SUM(v) AS BIGINT) AS smp_sum,
      |       CAST(MIN(v) AS INT) AS smp_min, CAST(MAX(v) AS INT) AS smp_max,
      |       TRUE AS wav_ok
      |FROM smp GROUP BY doc_id""".stripMargin

  case class GifFrame(doc_id: Long, n_frames: Int, frame_idx: Int,
      fr_sum: Long, fr_min: Int, fr_max: Int, gif_ok: Boolean)

  /** Real multi-frame container (animated GIF, javax.imageio): the video
    * frame-sampling pipeline shape with a GENUINE codec. Per doc, four
    * payload-seeded 8×8 grayscale frames are written as one animated GIF
    * by the JDK GIF writer (`prepareWriteSequence`/`writeToSequence`),
    * then the container is re-parsed: `getNumImages(true)` walks the
    * frame directory and each frame decodes through the LZW/palette path.
    * GIF's 256-entry palette holds 8-bit grayscale exactly, so the
    * round-trip is lossless and the DECODED per-frame stats hash-check
    * against the closed-form generator (one row per (doc, frame)).
    *
    * Scale shape: map-only; writer/reader instances are created once per
    * partition and reused per row (the codec-amortization argument the
    * mapPartitions plumbing exists for); ~1 KB container per doc bounds
    * the transient allocation.
    */
  def gifFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nFrames = 4
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        it.flatMap { case (id, payload) =>
          val seed = md5Hex(payload)
          val frames = (0 until nFrames).map(f => pixelStream(seed, s"gif$f"))
          val baos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          frames.foreach { px =>
            val img = new java.awt.image.BufferedImage(
              8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            img.getRaster.setDataElements(0, 0, 8, 8, px)
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          }
          writer.endWriteSequence()
          ios.close()
          reader.setInput(javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(baos.toByteArray)))
          val n = reader.getNumImages(true)
          (0 until n).map { f =>
            val dec = reader.read(f)
            // read raw raster samples and map through the palette
            // explicitly (not getRGB): getRGB goes through the full
            // ColorModel sRGB conversion, so exactness would hinge on the
            // JDK writer emitting an identity gray palette; the direct
            // IndexColorModel lookup is lossless for any palette
            val raster = dec.getRaster
            val palette = dec.getColorModel match {
              case icm: java.awt.image.IndexColorModel => Some(icm)
              case _ => None
            }
            var sum = 0L; var mn = 255; var mx = 0; var exact = true
            val exp = frames(f)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val s = raster.getSample(x, y, 0)
                val v = palette.fold(s & 0xff)(_.getRed(s) & 0xff)
                sum += v; if (v < mn) mn = v; if (v > mx) mx = v
                if (v != (exp(y * 8 + x) & 0xff)) exact = false
                x += 1
              }
              y += 1
            }
            GifFrame(id, n, f, sum, mn, mx,
              exact && dec.getWidth == 8 && dec.getHeight == 8)
          }
        }
      }
      .toDF()
  }

  /** DuckDB mirror of [[gifFrames]] — closed-form generator per (doc,
    * frame); `n_frames` is a literal 4 the DECODER must agree with (a
    * frame-directory misparse changes Spark's row count → hash fail). */
  val gifFramesSql: String =
    """WITH d AS (SELECT doc_id, md5(text) AS seed FROM documents),
      |grid AS (SELECT f, k, j
      |         FROM (SELECT unnest(generate_series(0, 3)) AS f),
      |              (SELECT unnest(generate_series(0, 3)) AS k),
      |              (SELECT unnest(generate_series(0, 15)) AS j)),
      |px AS (
      |  SELECT d.doc_id, g.f,
      |         (strpos('0123456789abcdef',
      |            substring(md5(d.seed || ':gif' || g.f || ':' || g.k), g.j*2+1, 1)) - 1) * 16
      |       + (strpos('0123456789abcdef',
      |            substring(md5(d.seed || ':gif' || g.f || ':' || g.k), g.j*2+2, 1)) - 1) AS v
      |  FROM d, grid g)
      |SELECT doc_id, CAST(4 AS INT) AS n_frames, CAST(f AS INT) AS frame_idx,
      |       CAST(SUM(v) AS BIGINT) AS fr_sum,
      |       CAST(MIN(v) AS INT) AS fr_min, CAST(MAX(v) AS INT) AS fr_max,
      |       TRUE AS gif_ok
      |FROM px GROUP BY doc_id, f""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_scene_cuts" -> (sceneCuts _),
    "mm_embed" -> (embedExploded _),
    "mm_decode_stats" -> (decodeStats _),
    "mm_phash" -> ((s, d) => phashDedup(s, d)),
    "mm_resize" -> (resize _),
    "mm_frame_sample" -> (frameSample _),
    "mm_codec_roundtrip" -> (codecRoundtrip _),
    "mm_wav_stats" -> (wavStats _),
    "mm_gif_frames" -> (gifFrames _))

  val oracles: Map[String, String] = Map(
    "mm_scene_cuts" -> sceneCutsSql,
    "mm_embed" -> embedExplodedSql,
    "mm_decode_stats" -> decodeStatsSql,
    "mm_phash" -> phashDedupSql,
    "mm_resize" -> resizeSql,
    "mm_frame_sample" -> frameSampleSql,
    "mm_codec_roundtrip" -> codecRoundtripSql,
    "mm_wav_stats" -> wavStatsSql,
    "mm_gif_frames" -> gifFramesSql)
}
