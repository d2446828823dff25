package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Dev profiler: run named queries (Bench session config) and decompose the
  * wall time into Spark-job execution vs driver-side gaps (planning,
  * manifest IO, commit protocol). `runMain graft.ProfileQ <sfDir> <q...>`.
  *
  * For each query pass it prints: total wall, number of jobs, summed job
  * wall, the driver gap (wall - job wall), and the top jobs by duration
  * with their descriptions — the measurement §1 of the optimization guide
  * asks for before touching anything. A second pass per query is profiled
  * (the first pays codegen compile; the second is what Bench's min-of-2
  * reports).
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.lance", "graft.sources.lance.LanceCatalog")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "16m"))
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(id: Int, start: Long, var end: Long = -1L,
                            desc: String, var stages: Int = 0,
                            var tasks: Int = 0, var taskTimeMs: Long = 0L,
                            var stageNames: List[String] = Nil)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, e.time, desc = d)
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          for (j <- stageToJob.get(e.stageInfo.stageId); r <- jobs.get(j)) {
            r.stages += 1
            r.tasks += e.stageInfo.numTasks
            r.stageNames = (e.stageInfo.name.takeWhile(_ != '(') +
              s"[${e.stageInfo.numTasks}]") :: r.stageNames
            for (s <- e.stageInfo.submissionTime; c <- e.stageInfo.completionTime)
              r.taskTimeMs += c - s
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    Tables.register(spark, sfDir)
    Tables.names.foreach(n => spark.table(n).limit(1).collect())

    names.foreach { n =>
      (0 until 2).foreach { pass =>
        jobs.synchronized { jobs.clear(); stageToJob.clear() }
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // drain listener events before reading (listenerBus is
        // private[spark]; a short sleep suffices for a dev profiler)
        Thread.sleep(250)
        val js = jobs.synchronized { jobs.values.toSeq }
        val jobWall = js.map(j => math.max(0L, j.end - j.start)).sum / 1e3
        println(f"[prof] $n pass=$pass wall=$wall%.3f s build=$tBuild%.3f s " +
          f"jobs=${js.size} jobWall=$jobWall%.3f s driverGap=${wall - jobWall}%.3f s")
        if (pass == 1) {
          js.sortBy(j => -(j.end - j.start)).take(14).foreach { j =>
            println(f"[prof]   job ${j.id}%3d ${(j.end - j.start) / 1e3}%7.3f s " +
              f"stages=${j.stages}%2d tasks=${j.tasks}%4d  " +
              j.stageNames.reverse.mkString(" <- ").take(120))
          }
        }
      }
    }
    spark.stop()
  }
}
