package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, Tables}
import graft.sources.Sources

/** Rewrite a testdata SF dir as a MULTI-FILE clustered fixture — the
  * reference's register-a-file-set table shape (`benches/query.rs:37-41`
  * registers parquet paths, not single files) and the layout every
  * single-split defect class so far has been blind to (r10 verdict
  * "What's missing" #2: all testdata tables are single files).
  *
  * Each table becomes a DIRECTORY `<dst>/<name>.parquet/` of `nFiles`
  * zstd files range-clustered on its natural sort key (dates for the
  * fact tables — the layout that makes min/max row-group skipping work
  * on time-range predicates; primary keys for dims). Tables are written
  * from the RAW physical schema (no events ts normalization) so the
  * fixture preserves whatever encoding the generator used and the
  * loaders' dtype branches are exercised identically.
  *
  * Usage: sbt "runMain graft.tools.MakeFixture /root/testdata/sf0.01 /tmp/fixture_sf0.01 8"
  */
object MakeFixture {
  /** Natural cluster key per table: time for facts, key for dims. */
  val clusterKeys: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderdate", "o_orderkey"),
    "lineitem" -> Seq("l_shipdate", "l_orderkey"),
    "events" -> Seq("ts", "event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def write(spark: SparkSession, srcDir: String, dstDir: String,
      nFiles: Int): Unit =
    Tables.all.foreach { name =>
      val raw = spark.read.parquet(s"$srcDir/$name.parquet")
      // tiny dims stay 1 file (an 5-row region in 8 files is all footer)
      val n = if (raw.count() < 1000) 1 else nFiles
      Sources.writeClustered(raw, s"$dstDir/$name.parquet",
        clusterKeys(name), n)
    }

  def main(args: Array[String]): Unit = {
    if (args.length != 3) {
      System.err.println(
        "usage: graft.tools.MakeFixture <srcSfDir> <dstDir> <nFiles>")
      sys.exit(2)
    }
    val spark = GraftSession.local(8)
    write(spark, args(0), args(1), args(2).toInt)
    spark.stop()
  }
}
