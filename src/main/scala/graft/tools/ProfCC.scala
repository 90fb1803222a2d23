package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Checkpoints.CheckpointOps

import graft.GraftSession
import graft.dedup.Dedup

// throwaway profiling main (not part of the library surface)
object ProfCC {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val pairs = Dedup.embedding(spark, dir)
      .select(col("vec_a").as("id_a"), col("vec_b").as("id_b")).cutLineage()
    println(f"pairs: ${(System.nanoTime() - t0) / 1e9}%.2f s n=${pairs.count()}")
    val verts = pairs.select(col("id_a").as("doc_id"))
      .unionAll(pairs.select(col("id_b").as("doc_id"))).distinct()
    for (i <- 1 to 3) {
      val t1 = System.nanoTime()
      val (lbl, rounds) = Dedup.connectedComponentsWithRounds(verts, pairs, 20)
      println(f"cc$i: ${(System.nanoTime() - t1) / 1e9}%.2f s rounds=$rounds n=${lbl.count()}")
    }
    spark.stop()
  }
}
