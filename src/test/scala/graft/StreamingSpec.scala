package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming correctness via batch-replay equivalence (SURVEY §5.2-5):
  * run each streaming transform over the finite events fixture as a file
  * stream, and compare against the same transform applied in batch. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** events fixture re-written with µs timestamps so the file source can
    * stream it; prepared once per suite. */
  lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
    Tables.load(spark, TestSpark.sfDir, "events")
      .repartition(4) // several files => several micro-batch splits
      .write.mode("overwrite").parquet(dir)
    dir
  }

  /** Append-mode streams only emit windows the final watermark has
    * closed; equivalence therefore compares against the batch result
    * restricted to closed windows (end <= max event time - delay). */
  lazy val maxTs: java.sql.Timestamp =
    spark.read.parquet(streamDir).agg(max(col("ts"))).head().getTimestamp(0)
  def closedBefore(delayMin: Int) =
    new java.sql.Timestamp(maxTs.getTime - delayMin * 60000L)

  test("tumbling window counts: stream equals batch on closed windows") {
    val streamed = Streams.runToCompletion(
      Streams.tumblingCounts(Streams.readEventsStream(spark, streamDir)), "tumbling")
    val batch = Streams.tumblingCounts(spark.read.parquet(streamDir))
      .filter(col("win_end") <= lit(closedBefore(10)))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty, "stream emitted rows batch doesn't have")
    assert(batch.exceptAll(streamed).isEmpty, "closed windows missing from stream")
  }

  test("sliding window counts: stream equals batch on closed windows") {
    val streamed = Streams.runToCompletion(
      Streams.slidingCounts(Streams.readEventsStream(spark, streamDir)), "sliding")
    val batch = Streams.slidingCounts(spark.read.parquet(streamDir))
      .filter(col("win_end") <= lit(closedBefore(10)))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("session windows: stream equals batch on closed sessions") {
    val streamed = Streams.runToCompletion(
      Streams.sessionWindows(Streams.readEventsStream(spark, streamDir)), "sessions")
    val batch = Streams.sessionWindows(spark.read.parquet(streamDir))
      .filter(col("session_end") <= lit(closedBefore(30)))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stateful sessionization matches the ev01 batch query") {
    import spark.implicits._
    val events = spark.read.parquet(streamDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streams.Event]
    // single batch => flatMapGroupsWithState sees each user's full history
    val stateful = Streams.sessionizeStateful(events)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
                              sum("n_events").as("n_events"))
    val batch = SparkEntry.queries("ev01_sessionize")(spark, TestSpark.sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
                              sum("n_events").as("n_events"))
    assert(batch.exceptAll(stateful).isEmpty && stateful.exceptAll(batch).isEmpty)
  }

  test("transformWithState running user profile matches batch totals") {
    import spark.implicits._
    val stream = Streams.readEventsStream(spark, streamDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Streams.Event]
    // transformWithState needs a multi-column-family store (RocksDB)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val out = try Streams.runToCompletion(
      Streams.userStats(stream).toDF(), "userstats")
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    // keep each user's LAST emitted row (cumulative across micro-batches)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("n_events").desc)
    val finalRows = out.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "n_events")
    val batch = spark.read.parquet(streamDir)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(finalRows.exceptAll(batch).isEmpty && batch.exceptAll(finalRows).isEmpty)
  }

  test("streaming dedup drops duplicate event ids") {
    // duplicate the stream source: each event appears twice across files
    val dupDir = java.nio.file.Files.createTempDirectory("graft-dup").toString
    val once = spark.read.parquet(streamDir)
    once.unionAll(once).repartition(4).write.mode("overwrite").parquet(dupDir)
    val streamed = Streams.runToCompletion(
      Streams.dedupStream(Streams.readEventsStream(spark, dupDir)), "dedup")
    assert(streamed.count() == 1000, s"got ${streamed.count()}")
    assert(streamed.select("event_id").distinct().count() == 1000)
  }

  test("stream-stream interval join equals the batch twin") {
    val streamed = Streams.runToCompletion(
      Streams.purchaseViewJoin(Streams.readEventsStream(spark, streamDir)), "ssjoin")
    val batch = Streams.purchaseViewJoin(spark.read.parquet(streamDir))
    assert(streamed.count() > 0)
    // inner interval join emits only watermark-safe matches; every emitted
    // row must be correct and the batch result must cover it
    assert(streamed.exceptAll(batch).isEmpty,
      "stream emitted rows the batch join doesn't have")
    // and nearly all matches should have been emitted (only pairs in the
    // final unclosed watermark window may be missing)
    assert(streamed.count() >= batch.count() * 8 / 10,
      s"too few: ${streamed.count()} vs ${batch.count()}")
  }

  test("lance streaming sink: each micro-batch appends a dataset version") {
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/events.lance"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val stream = Streams.readEventsStream(spark, streamDir)
      .select("event_id", "user_id", "event_type", "value")
    val q = Streams.lanceSink(stream, sinkDir, ckpt)
    q.processAllAvailable()
    q.stop()
    val back = spark.read.format("lance").load(sinkDir)
    assert(back.count() == 1000)
    val batch = spark.read.parquet(streamDir)
      .select("event_id", "user_id", "event_type", "value")
    assert(back.exceptAll(batch).isEmpty && batch.exceptAll(back).isEmpty)
    // at least one committed version exists and v1 is readable
    assert(spark.read.format("lance").option("versionAsOf", "1").load(sinkDir).count() > 0)
  }

  test("partitioned lance sink: streaming appends keep the SPJ-ready layout") {
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-psink").toString + "/events.lance"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pckpt").toString
    val stream = Streams.readEventsStream(spark, streamDir)
      .select("event_id", "user_id", "event_type", "value")
    val q = Streams.lanceSink(stream, sinkDir, ckpt, Seq("event_type"))
    q.processAllAvailable()
    q.stop()
    val (fs, p) = graft.sources.lance.LanceFormat.fileSystem(
      sinkDir, spark.sessionState.newHadoopConf())
    val m = graft.sources.lance.LanceFormat.readManifest(
      fs, graft.sources.lance.LanceFormat.latestManifestPath(fs, p, None))
    assert(m.partitionCols == Seq("event_type"))
    assert(m.fragments.forall(_.partValues.length == 1),
      "every streamed fragment must carry its partition value")
    // the landed dataset aggregates on the partition key with no exchange
    val agg = spark.read.format("lance").load(sinkDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    assert(!plan.toString.linesIterator.exists(_.contains("Exchange hashpartitioning")),
      s"partition-key agg over the streamed dataset must not exchange:\n$plan")
    val batch = spark.read.parquet(streamDir)
      .select("event_id", "user_id", "event_type", "value")
    val back = spark.read.format("lance").load(sinkDir)
    assert(back.exceptAll(batch).isEmpty && batch.exceptAll(back).isEmpty)
  }

  test("streaming sink + per-epoch matview refresh stays consistent with the table") {
    val sinkDir = java.nio.file.Files.createTempDirectory("graft-mvsink").toString + "/events.lance"
    val mvDir = java.nio.file.Files.createTempDirectory("graft-mvsink").toString + "/mv.lance"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mvckpt").toString
    val stream = Streams.readEventsStream(spark, streamDir)
      .select("event_id", "user_id", "event_type", "value")
    val q = Streams.lanceSinkWithMatView(stream, sinkDir, ckpt, mvDir,
      Seq("event_type"), Seq("value"))
    q.processAllAvailable()
    q.stop()
    val landed = spark.read.format("lance").load(sinkDir)
    assert(landed.count() == 1000)
    val expect = landed.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        coalesce(sum(col("value").cast("decimal(38,6)")),
          lit(BigDecimal(0)).cast("decimal(38,6)")).as("sum_value"),
        count(col("value")).as("cntnn_value"))
      .orderBy("event_type").collect().map(_.mkString("|")).toSeq
    val got = graft.operators.MatView.read(spark, mvDir)
      .orderBy("event_type").collect().map(_.mkString("|")).toSeq
    assert(got == expect)
  }

  test("lance streaming source tails appended versions exactly once") {
    val ds = java.nio.file.Files.createTempDirectory("graft-src").toString + "/tail.lance"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-src-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-src-out").toString
    def sunk() = spark.read.parquet(out)
    def tail() = spark.readStream.format("lance").load(ds)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()

    spark.range(0, 100).selectExpr("id", "id % 5 AS grp")
      .coalesce(2).write.format("lance").mode("append").save(ds)
    val q = tail()
    try {
      q.processAllAvailable()
      assert(sunk().count() == 100)
      // append a version: only the new fragments arrive (no re-emission)
      spark.range(100, 160).selectExpr("id", "id % 5 AS grp")
        .coalesce(1).write.format("lance").mode("append").save(ds)
      q.processAllAvailable()
      assert(sunk().count() == 160)
      assert(sunk().select("id").distinct().count() == 160)
    } finally q.stop()
    // restart from the checkpoint: offsets recover, and a version whose
    // new fragments carry deletion vectors by the time they're FIRST
    // planned is masked (deletes are not retroactive — the append and
    // delete land while no query is polling)
    spark.range(200, 260).selectExpr("id", "id % 5 AS grp")
      .coalesce(1).write.format("lance").mode("append").save(ds)
    graft.sources.lance.LanceMaintenance.deleteWhere(spark, ds, "id >= 250")
    val q2 = tail()
    try {
      q2.processAllAvailable()
      assert(sunk().count() == 210) // 160 prior + 50 live new, none re-emitted
      assert(sunk().filter("id >= 250").count() == 0)
      assert(sunk().select("id").distinct().count() == 210)
    } finally q2.stop()
  }

  test("lance streaming source refuses overwritten history") {
    val ds = java.nio.file.Files.createTempDirectory("graft-src2").toString + "/tail.lance"
    spark.range(0, 50).selectExpr("id").coalesce(2)
      .write.format("lance").mode("append").save(ds)
    val stream = new graft.sources.lance.LanceMicroBatchStream(ds, Array.empty, "")
    val v1 = stream.latestOffset()
    spark.range(0, 10).selectExpr("id").coalesce(1)
      .write.format("lance").mode("overwrite").save(ds)
    val v2 = stream.latestOffset()
    val e = intercept[IllegalArgumentException] {
      stream.planInputPartitions(v1, v2)
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("late data beyond the watermark is dropped in append mode") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = ms.toDF().toDF("ts", "event_type", "value")
    val agg = Streams.tumblingCounts(df)
    val q = agg.writeStream.outputMode("append").format("memory").queryName("late").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    ms.addData((t(0), "a", 1.0), (t(4), "a", 1.0))   // window [0,5)
    q.processAllAvailable()
    ms.addData((t(30), "a", 1.0))                     // advances watermark to :20
    q.processAllAvailable()
    ms.addData((t(2), "a", 99.0))                     // late: before watermark, dropped
    ms.addData((t(60), "a", 1.0))                     // flushes remaining windows
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("late")
      .select(date_format(col("win_start"), "HH:mm").as("w"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(rows("00:00") == 2L, s"late row must not count: $rows")
  }
}
