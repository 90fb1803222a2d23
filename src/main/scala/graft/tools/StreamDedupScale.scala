package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.streaming.DocStreams

/** Corpus-scale streaming-dedup frontier (round 16 — r15 verdict item 2):
  * the Bench keeper legs run 5k docs through MemoryStream and measure
  * per-micro-batch overhead, not throughput. This drives the keepers and
  * the banded near-dup over a CORPUS-sized feed the way production would
  * — a file stream of parquet shards, maxFilesPerTrigger batches, RocksDB
  * state — and records rows/s, per-batch latency, and state size from
  * the query progress (the state gates: keepers hold ONE long per
  * distinct key, bands one list entry per (band, doc) — O(keys) /
  * O(16·docs), never text or signatures).
  *
  *   sbt "runMain graft.tools.StreamDedupScale /tmp/k1000_docs [nShards] [bandDocs]"
  */
object StreamDedupScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nShards = if (args.length > 1) args(1).toInt else 20
    val bandDocs = if (args.length > 2) args(2).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val tmp = java.nio.file.Files.createTempDirectory("stream_dedup_scale").toString
    val docs = graft.Tables.documents(spark, dir)
    val n = docs.count()
    // the feed: Doc-shaped shards; ts derived from doc_id (the keepers
    // key on content, ts is carried but not consulted)
    def writeFeed(path: String, src: org.apache.spark.sql.DataFrame, shards: Int): Unit =
      src.select(col("doc_id"),
          (lit(86400000L) + col("doc_id")).cast("timestamp").as("ts"),
          col("text"), col("lang"))
        .repartition(shards)
        .write.parquet(path)
    writeFeed(tmp + "/feed", docs, nShards)
    val bandN = math.min(bandDocs, n)
    writeFeed(tmp + "/feed_band", docs.filter(col("doc_id") % (n / bandN) === 0), nShards)

    def leg(name: String, feed: String, outMode: String, rowsIn: Long)(
        mk: Dataset[DocStreams.Doc] => Dataset[_]): Unit = {
      val src = spark.readStream
        .schema("doc_id LONG, ts TIMESTAMP, text STRING, lang STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed).as[DocStreams.Doc]
      val q = mk(src).writeStream.format("noop").outputMode(outMode)
        .option("checkpointLocation", s"$tmp/ckpt_$name").start()
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val secs = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      val batchMs = prog.map(_.batchDuration).sorted
      val p50 = if (batchMs.nonEmpty) batchMs(batchMs.length / 2) else -1L
      val pMax = if (batchMs.nonEmpty) batchMs.last else -1L
      val state = prog.lastOption.flatMap(_.stateOperators.headOption)
      val stateRows = state.map(_.numRowsTotal).getOrElse(-1L)
      val stateBytes = state.map(_.memoryUsedBytes).getOrElse(-1L)
      q.stop()
      println(f"""{"leg":"$name","rows":$rowsIn,"sec":$secs%.1f,"rows_per_sec":${rowsIn / secs}%.0f,"batches":${prog.length},"batch_ms_p50":$p50,"batch_ms_max":$pMax,"state_rows":$stateRows,"state_bytes":$stateBytes}""")
    }

    leg("first_keeper", tmp + "/feed", "append", n)(DocStreams.bowDedupStream)
    leg("min_keeper", tmp + "/feed", "update", n)(DocStreams.bowDedupStreamUnordered)
    leg("band_cands", tmp + "/feed_band", "append", bandN)(
      ds => DocStreams.bandCandidatesStream(ds))
    // the state gate's denominators, batch-side: distinct bow keys and
    // distinct (band, doc) entries — printed so the addendum can assert
    // state_rows == keys (keepers) and == 16*docs (bands)
    val keys = docs.select(sha2(array_join(array_sort(array_distinct(
      split(col("text"), " "))), " "), 256)).distinct().count()
    println(s"""{"distinct_bow_keys":$keys,"band_docs":$bandN}""")
    spark.stop()
  }
}
