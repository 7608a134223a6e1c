package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Dev tool: per-job breakdown of one declared query — which Spark jobs a
  * query launches, how long each takes, and the stage-level input/shuffle
  * volumes. `runMain graft.JProf <sfDir> <queryName> [reps]`. Optimization
  * companion to [[QTime]]: QTime says HOW SLOW, this says WHERE.
  */
object JProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.attach(GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    case class J(id: Int, var desc: String = "", var t0: Long = 0L, var t1: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var inBytes: Long = 0L,
      var shWrite: Long = 0L, var shRead: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val j = J(e.jobId); j.t0 = e.time
        def prop(k: String) = Option(e.properties).flatMap(p => Option(p.getProperty(k)))
        // description when set, else a best-effort graft frame from the
        // submitting thread's stack (it is blocked in runJob while the job
        // runs, so the listener usually catches it mid-action) — the only
        // way to tell 15 anonymous ~40 ms table-op jobs apart
        def graftFrame: Option[String] = {
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.values.flatMap { st =>
            st.find { f =>
              f.getClassName.startsWith("graft.") &&
                !f.getClassName.contains("JProf")
            }
          }.headOption.map(f =>
            s"@${f.getClassName.stripPrefix("graft.")}.${f.getMethodName}:${f.getLineNumber}")
        }
        j.desc = prop("spark.job.description")
          .orElse(prop("callSite.short")).orElse(graftFrame).getOrElse("").take(90)
        jobs(e.jobId) = j
        // jobStart carries the job's stage ids: exact attribution even when
        // jobs overlap (AQE re-optimization, broadcast jobs)
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val si = e.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get)
          .orElse(jobs.values.lastOption).foreach { j =>
          j.stages += 1; j.tasks += si.numTasks
          j.inBytes += si.taskMetrics.inputMetrics.bytesRead
          j.shWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
          j.shRead += si.taskMetrics.shuffleReadMetrics.remoteBytesRead +
            si.taskMetrics.shuffleReadMetrics.localBytesRead
        }
      }
    }
    for (i <- 1 to reps) {
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      if (i == reps) spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"== $name rep $i: $wall%.2f s")
      if (i == reps) {
        Thread.sleep(300) // let listener drain
        jobs.synchronized {
          val tot = jobs.values.map(j => j.t1 - j.t0).sum / 1e3
          println(f"   jobs=${jobs.size} sum_job_time=$tot%.2f s")
          jobs.values.toSeq.sortBy(j => -(j.t1 - j.t0)).take(25).foreach { j =>
            println(f"   job ${j.id}%3d ${(j.t1 - j.t0) / 1e3}%6.2f s stages=${j.stages}%2d tasks=${j.tasks}%4d in=${j.inBytes / 1e6}%8.1fMB shW=${j.shWrite / 1e6}%7.1fMB shR=${j.shRead / 1e6}%7.1fMB  ${j.desc}")
          }
        }
      }
    }
    spark.stop()
  }
}
