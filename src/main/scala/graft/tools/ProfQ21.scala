package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.{GraftSession, SparkEntry}

/** Dev-loop profiler: run one query, print per-stage wall/task metrics so a
  * slow toy-SF capture can be attributed to a stage rather than guessed at.
  *
  *   sbt "runMain graft.tools.ProfQ21 q21_waiting_suppliers /root/testdata/sf0.1"
  */
object ProfQ21 {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // listener-bus events arrive on their own thread; a synchronized
    // buffer + waitUntilEmpty drains deterministically so warm-run stages
    // never leak into (nor measured stages drop from) the printed profile
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
        // shuffle record counts answer the partial-aggregation question
        // directly: a map-side combine that works shows write-records ≪
        // input-records; one that degenerates shows ~1:1 (r15 verdict
        // item 6 asks this of q18/q11's fact-cardinality GROUP BYs)
        val m = i.taskMetrics
        val sw = m.shuffleWriteMetrics.recordsWritten
        val sr = m.shuffleReadMetrics.recordsRead
        val in = m.inputMetrics.recordsRead
        lines.add(f"stage ${i.stageId}%3d tasks=${i.numTasks}%4d wall=$wall%6.2fs in=$in%,13d shufR=$sr%,13d shufW=$sw%,13d  ${i.name.split('\n').head.take(70)}")
      }
    })
    // warm run then measured run, per-stage print for the measured one
    SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    graft.Checkpoints.releaseAll()
    org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
    lines.clear()
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    println(f"total ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
    lines.forEach(println)
    spark.stop()
  }
}
