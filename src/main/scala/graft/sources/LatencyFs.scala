package graft.sources

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FSDataInputStream, Path, PositionedReadable, RawLocalFileSystem, Seekable}

/** `graft://` — a local-disk Hadoop FileSystem that behaves like an object
  * store: every open and every positioned (ranged) read pays a configurable
  * first-byte latency, and both are counted.
  *
  * The reference engine's specialty is scheduling exactly these ranged
  * reads (`src/object_store/file.rs:1-321` hand-schedules io_uring
  * byte-range requests; `src/object_store/s3/mod.rs` maps them to ranged
  * GETs). Spark's seam for the same concern is the Hadoop FileSystem API —
  * parquet footer reads, column-chunk fetches, and row-group skips all
  * arrive here as `open` + positioned `read(pos, buf, off, len)` calls. A
  * sandbox with zero egress can't exercise a real S3AFileSystem, but it
  * CAN measure how plan shape (column pruning, predicate pushdown,
  * clustering) changes the NUMBER and SIZE of ranged reads — which is the
  * entire game when each read costs a network round trip. This shim makes
  * that measurable: `graft://` URIs resolve to local files with injected
  * per-operation latency, so SourcesSpec can assert (not argue) that a
  * pruned scan issues fewer ranged reads than a full scan, and BENCH_NOTES
  * can report wall-clock under synthetic object-store latency.
  *
  * Config (Hadoop conf, settable per session):
  *   - `graft.latency.open.ms`  — injected once per file open (TTFB of the
  *     first GET; default 0)
  *   - `graft.latency.read.ms`  — injected once per positioned read (one
  *     ranged GET; default 0)
  *
  * Register with [[LatencyFs.install]]; counters are process-global
  * (executors are in-process under local[*]) and reset via
  * [[LatencyFs.resetCounters]].
  */
class LatencyFs extends RawLocalFileSystem {
  private var openMs = 0L
  private var readMs = 0L

  override def getScheme: String = "graft"

  override def getUri: URI = URI.create("graft:///")

  override def initialize(uri: URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(uri, conf)
    openMs = conf.getLong("graft.latency.open.ms", 0L)
    readMs = conf.getLong("graft.latency.read.ms", 0L)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    LatencyFs.opens.incrementAndGet()
    if (openMs > 0) Thread.sleep(openMs)
    val inner = super.open(f, bufferSize)
    new FSDataInputStream(new LatencyFs.CountingStream(inner, readMs))
  }
}

object LatencyFs {
  val opens = new AtomicLong(0)
  val positionedReads = new AtomicLong(0)
  val bytesRead = new AtomicLong(0)

  def resetCounters(): Unit = { opens.set(0); positionedReads.set(0); bytesRead.set(0) }

  def snapshot(): (Long, Long, Long) =
    (opens.get(), positionedReads.get(), bytesRead.get())

  /** Wire `graft://` into a session's Hadoop conf with the given injected
    * latencies. Idempotent; pass 0s to measure pure operation counts.
    */
  def install(spark: org.apache.spark.sql.SparkSession,
      openLatencyMs: Long = 0L, readLatencyMs: Long = 0L): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.graft.impl", classOf[LatencyFs].getName)
    // one FS instance per (scheme, conf) is cached by Hadoop; disable the
    // cache so latency changes within a session take effect
    c.set("fs.graft.impl.disable.cache", "true")
    c.setLong("graft.latency.open.ms", openLatencyMs)
    c.setLong("graft.latency.read.ms", readLatencyMs)
  }

  /** Delegating stream that counts + delays positioned reads — the calls
    * that map 1:1 to ranged GETs on an object store. Sequential `read`
    * passes through untouched (a streaming GET pays TTFB once, at open).
    */
  private class CountingStream(inner: FSDataInputStream, readMs: Long)
      extends java.io.InputStream with Seekable with PositionedReadable {
    override def read(): Int = {
      val v = inner.read()
      if (v >= 0) bytesRead.incrementAndGet()
      v
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = inner.read(b, off, len)
      if (n > 0) bytesRead.addAndGet(n)
      n
    }
    override def read(pos: Long, buf: Array[Byte], off: Int, len: Int): Int = {
      positionedReads.incrementAndGet()
      if (readMs > 0) Thread.sleep(readMs)
      val n = inner.read(pos, buf, off, len)
      if (n > 0) bytesRead.addAndGet(n)
      n
    }
    override def readFully(pos: Long, buf: Array[Byte], off: Int, len: Int): Unit = {
      positionedReads.incrementAndGet()
      if (readMs > 0) Thread.sleep(readMs)
      inner.readFully(pos, buf, off, len)
      bytesRead.addAndGet(len)
    }
    override def readFully(pos: Long, buf: Array[Byte]): Unit =
      readFully(pos, buf, 0, buf.length)
    override def seek(pos: Long): Unit = inner.seek(pos)
    override def getPos: Long = inner.getPos
    override def seekToNewSource(targetPos: Long): Boolean =
      inner.seekToNewSource(targetPos)
    override def close(): Unit = inner.close()
  }
}
