package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Dev profiling main (not part of the library surface): run named queries
  * through the noop sink with a listener that counts Spark jobs / stages /
  * tasks and sums task time, so the per-query cost can be split into
  * "job-scheduling floor" (many tiny jobs from eager checkpoints and driver
  * actions) vs real executor compute. Guide §1: decide WHERE the time goes
  * before touching anything.
  *
  *   sbt "runMain graft.tools.ProfJobs graph_sssp,dedup_cc /root/testdata/sf0.1 2"
  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.tools.ProfJobs <q1,q2,...> <sfDir> [runs]")
      sys.exit(2)
    }
    val names = args(0).split(",").toSeq
    val sfDir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskTimeMs = 0L
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobWall = new java.util.concurrent.atomic.AtomicLong(0L)
    // per-callsite totals: (n jobs, wall ns) — which code line spawns the
    // jobs and where their wall goes
    val bySite = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    val stageBySite = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs += 1
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobStart.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(je.jobId)).foreach { case (t0, site) =>
          val w = System.nanoTime() - t0
          jobWall.addAndGet(w)
          bySite.merge(site, (1, w),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += sc.stageInfo.numTasks
        taskTimeMs += sc.stageInfo.taskMetrics.executorRunTime
        val site = sc.stageInfo.details.linesIterator.toSeq.headOption.getOrElse("?")
        stageBySite.merge(site, sc.stageInfo.taskMetrics.executorRunTime,
          (a, b) => Long.box(a + b))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- names) {
      val q = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query '$name'"))
      for (i <- 1 to runs) {
        jobs = 0; stages = 0; tasks = 0L; taskTimeMs = 0L; jobWall.set(0L)
        bySite.clear(); stageBySite.clear()
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
        println(f"$name run$i: wall=$wall%.2fs jobs=$jobs stages=$stages " +
          f"tasks=$tasks taskTime=${taskTimeMs / 1000.0}%.2fs jobWall=${jobWall.get() / 1e9}%.2fs")
        if (i == runs) {
          import scala.jdk.CollectionConverters._
          bySite.asScala.toSeq.sortBy(-_._2._2).take(12).foreach {
            case (site, (n, w)) =>
              println(f"    jobsite $site%-55s n=$n%-3d wall=${w / 1e9}%.2fs")
          }
          stageBySite.asScala.toSeq.sortBy(-_._2).take(12).foreach {
            case (site, ms) =>
              println(f"    stagesite $site%-55s taskTime=${ms / 1000.0}%.2fs")
          }
        }
        spark.catalog.clearCache()
        graft.Checkpoints.releaseAll()
      }
    }
    spark.stop()
  }
}
