package graft

import org.apache.spark.sql.functions._

/** Dev-only profilers (test tree — never in the shipped jar):
  * `Test/runMain graft.Scratch <sfDir>` profiles the matview lifecycle
  * (GRAFT_MV_TIMING=1 for phase timings, GRAFT_JOB_TIMING=1 for
  * per-job splits); `... <sfDir> commits` micro-benches tiny lance
  * append commits. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.lance", "graft.sources.lance.LanceCatalog")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables.register(spark, dir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    if (args.contains("commits")) {
      // micro-benchmark: fixed cost of a tiny lance append commit, and
      // whether it grows with version count
      val ds = java.nio.file.Files.createTempDirectory("scratch-commit")
        .toString + "/tiny.lance"
      import spark.implicits._
      val tiny = (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
      tiny.write.format("lance").mode("overwrite").save(ds)
      tiny.write.format("lance").mode("append").save(ds) // warm plans
      (1 to 3).foreach { round =>
        val t0 = System.nanoTime()
        (1 to 20).foreach(_ =>
          tiny.write.format("lance").mode("append").save(ds))
        println(f"[scratch] 20 appends (round $round) ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }
      val t1 = System.nanoTime()
      (1 to 20).foreach(_ => spark.read.format("lance").load(ds).count())
      println(f"[scratch] 20 count reads          ${(System.nanoTime() - t1) / 1e9}%8.3f s")
      spark.stop(); return
    }
    // per-job wall times (job id, duration, first stage name) — shows how
    // a phase's wall splits across scheduled jobs
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStarts.put(j.jobId, (System.nanoTime(),
          j.stageInfos.headOption.map(_.name.takeWhile(_ != '\n').take(60)).getOrElse("?")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = jobStarts.remove(j.jobId)
        if (s != null && sys.env.contains("GRAFT_JOB_TIMING"))
          println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - s._1) / 1e9}%7.3f s  ${s._2}")
      }
    })
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val workDir = java.nio.file.Files.createTempDirectory("scratch-mv").toString
      val ds = s"$workDir/orders_mv_src.lance"
      val mv = s"$workDir/orders_mv.lance"
      val ord = t("orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
      time("write source") {
        ord.filter(col("o_orderkey") % 3 =!= 0)
          .write.format("lance").option("stableRowIds", "true")
          .mode("overwrite").save(ds)
      }
      time("create") {
        graft.operators.MatView.create(spark, ds, mv,
          Seq("o_orderpriority"), Seq("o_totalprice"))
      }
      time("deleteWhere") {
        graft.sources.lance.LanceMaintenance.deleteWhere(spark, ds,
          "o_totalprice > 400000")
      }
      time("append") {
        ord.filter(col("o_orderkey") % 3 === 0)
          .write.format("lance").mode("append").save(ds)
      }
      time("refresh") {
        graft.operators.MatView.refresh(spark, mv)
      }
      time("read+noop") {
        graft.operators.MatView.read(spark, mv)
          .select(col("o_orderpriority"), col("cnt"),
            col("sum_o_totalprice").cast("double").as("total"))
          .orderBy("o_orderpriority")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
