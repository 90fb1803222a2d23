package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** Measurement harness for the coarse-quantizer BUILD alone (round 15 —
  * r14 verdict item 3): times `Ann.coarseCells` end-to-end (bisecting
  * rounds + leaf-moment pass + beam descent) on a given embeddings dir,
  * plus a checksum of the assignment so an optimized formulation can be
  * proven value-identical, not just faster.
  *
  *   sbt "runMain graft.tools.QuantBuild /tmp/k1000_emb [reps]"
  */
object QuantBuild {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    // stage-duration profile: where the build actually spends its time
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(0L)
        stages.add((s"stage ${i.stageId}: ${i.name.take(90)}", ms))
      }
    })
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val cells = graft.similarity.Ann.coarseCells(spark, dir, maxRn = 2)
      val row = cells.agg(count(lit(1)).as("n"),
        sum(expr("cell * 1000003 + rn")).as("chk"),
        countDistinct(col("cell")).as("n_cells")).head
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"rep":$r,"sec":$secs%.1f,"rows":${row.getLong(0)},"cells":${row.getLong(2)},"checksum":${row.getLong(1)}}""")
      if (r == reps) {
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(-_._2).take(20).foreach { case (n, ms) =>
          println(f"PROFILE $ms%7d ms  $n")
        }
      }
      stages.clear()
      graft.Checkpoints.releaseAll()
    }
    spark.stop()
  }
}
