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
  * with typed Encoders, and bounded frame sampling. The decode itself is a
  * clearly-marked deterministic STUB: this container has no image/audio
  * codecs; a real deployment swaps `fakeDecode` for a codec call without
  * touching the plumbing.
  */
object Blobs {

  case class BlobMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      channels: Int, mean_byte: Double)

  /** STUB decoder — deterministic fake "header parse". Replace with a real
    * codec (e.g. JNI image lib) in production; signature stays identical.
    */
  private def fakeDecode(id: Long, bytes: Array[Byte]): BlobMeta = {
    val w = 64 + (((bytes(0) & 0xff) << 8 | (bytes(1) & 0xff)) % 960)
    val h = 64 + (((bytes(2) & 0xff) << 8 | (bytes(3) & 0xff)) % 960)
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
    BlobMeta(id, bytes.length, w, h, 3, s.toDouble / bytes.length)
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

  /** Frame sampling shape: stride-16 slices of the payload, at most 8
    * frames per blob, each fingerprinted — all inside codegen'd builtins
    * (binary substring + xxhash64), no decode needed for sampling.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("n_frames", greatest((length(col("payload")) / 16).cast("int"), lit(1)))
      .select(col("doc_id"), col("n_frames"), explode(expr(
        """transform(sequence(0, least(n_frames - 1, 7)),
          |  i -> named_struct('frame_idx', i, 'frame_hash', xxhash64(substring(payload, i*16+1, 16))))""".stripMargin))
        .as("f"))
      .select(col("doc_id"), col("n_frames"),
        col("f.frame_idx").as("frame_idx"), col("f.frame_hash").as("frame_hash"))

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_embed" -> (embed _),
    "mm_decode_stats" -> (decodeStats _),
    "mm_frame_sample" -> (frameSample _))

  val oracles: Map[String, String] = Map.empty
}
