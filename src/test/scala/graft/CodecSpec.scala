package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.multimodal.Blobs

/** Real-codec multimodal path (round 11): the JDK's own PNG/JPEG
  * (javax.imageio) and RIFF/WAVE (javax.sound.sampled) codecs run inside
  * Spark tasks over payload-seeded rasters/streams, and the outputs are
  * checked here against a from-scratch recompute of the deterministic
  * md5 generator — the same closed form the DuckDB oracle evaluates, so
  * a local pass means the driver's hash compare sees identical values.
  *
  * What this buys beyond mm_decode_stats' stub: an actual container
  * format is encoded and parsed per row (PNG chunk structure, JPEG DCT,
  * WAV fmt-chunk, animated-GIF frame directory + LZW), so the
  * mapPartitions plumbing has carried REAL codecs, not only byte
  * arithmetic. True video codecs (H.264 …) remain stubbed — none exists
  * in the JDK — which keeps the honesty line where it was.
  */
class CodecSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  private def md5Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b).map(x => f"${x & 0xff}%02x").mkString

  /** The generator's closed form, recomputed independently of Blobs. */
  private def expectedStream(text: String, tag: String): Array[Int] = {
    val seed = md5Hex(text.getBytes(StandardCharsets.UTF_8))
    (0 until 4).flatMap { k =>
      MessageDigest.getInstance("MD5")
        .digest(s"$seed:$tag:$k".getBytes(StandardCharsets.UTF_8))
        .map(_ & 0xff)
    }.toArray
  }

  test("mm_codec_roundtrip: PNG round-trip is byte-exact and JPEG decodes within bound") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Blobs.codecRoundtrip(spark, sf).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val exp = expectedStream(docs(id), "png")
      assert(r.getInt(1) == 8 && r.getInt(2) == 8, s"dims for $id")
      assert(r.getLong(3) == exp.map(_.toLong).sum, s"px_sum for $id")
      assert(r.getInt(4) == exp.min, s"px_min for $id")
      assert(r.getInt(5) == exp.max, s"px_max for $id")
      assert(r.getBoolean(6), s"png_ok for $id — lossless round-trip broke")
      assert(r.getBoolean(7), s"jpeg_ok for $id — flat-block error above bound")
    }
  }

  test("mm_wav_stats: WAV container parse reports the written format and samples") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Blobs.wavStats(spark, sf).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val exp = expectedStream(docs(id), "wav")
      assert(r.getInt(1) == 8000 && r.getInt(2) == 8 && r.getInt(3) == 1,
        s"decoded format fields for $id")
      assert(r.getLong(4) == 64L, s"frame length for $id")
      assert(r.getLong(5) == exp.map(_.toLong).sum, s"smp_sum for $id")
      assert(r.getInt(6) == exp.min && r.getInt(7) == exp.max, s"smp min/max for $id")
      assert(r.getBoolean(8), s"wav_ok for $id — PCM round-trip broke")
    }
  }

  test("mm_gif_frames: animated-GIF container round-trips 4 frames losslessly") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Blobs.gifFrames(spark, sf).collect()
    assert(out.length == docs.size * 4, "one row per (doc, frame)")
    out.foreach { r =>
      val id = r.getLong(0)
      val f = r.getInt(2)
      val exp = expectedStream(docs(id), s"gif$f")
      assert(r.getInt(1) == 4, s"decoder frame count for $id")
      assert(r.getLong(3) == exp.map(_.toLong).sum, s"fr_sum for $id/$f")
      assert(r.getInt(4) == exp.min && r.getInt(5) == exp.max, s"fr min/max for $id/$f")
      assert(r.getBoolean(6), s"gif_ok for $id/$f — palette round-trip broke")
    }
  }

  test("streaming codec decode equals batch decode on the same documents") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().take(50)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val streamed = Blobs.codecStatsOf(
      input.toDF().toDF("doc_id", "text")
        .selectExpr("doc_id", "cast(text as binary) as payload")
        .as[(Long, Array[Byte])])
    val q = streamed.writeStream.format("memory")
      .queryName("codec_stream").outputMode("append").start()
    try {
      // two micro-batches, so the per-partition codec init runs per batch
      input.addData(docs.take(25).toIndexedSeq)
      q.processAllAvailable()
      input.addData(docs.drop(25).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("codec_stream").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getInt(4), r.getInt(5),
          r.getBoolean(6), r.getBoolean(7))).toSet
      val batch = Blobs.codecRoundtrip(spark, sf)
        .filter(col("doc_id").isin(docs.map(_._1): _*)).collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getInt(4), r.getInt(5),
          r.getBoolean(6), r.getBoolean(7))).toSet
      assert(got == batch, "streaming micro-batch decode diverged from the batch plan")
      assert(got.size == 50 && got.forall(t => t._5 && t._6))
    } finally q.stop()
  }

  test("real-codec queries register with oracle SQL and pass the no-decimal lint") {
    Seq("mm_codec_roundtrip", "mm_wav_stats", "mm_gif_frames").foreach { q =>
      assert(SparkEntry.queries.contains(q), s"$q not registered")
      assert(SparkEntry.oracleSql.contains(q), s"$q has no oracle")
      val schema = SparkEntry.queries(q)(spark, sf).schema
      assert(!schema.exists(_.dataType.typeName.startsWith("decimal")),
        s"$q emits a decimal column — the r10 HUGEINT hash trap")
    }
  }
}
