package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hidden date-transform partitioning (`option("partitionBy", "days(ts)")`)
  * + the catalog's `days` V2 function: day-cut fragments, epoch-day
  * partition values, storage-partitioned joins on the RAW timestamp, and
  * time-range fragment pruning. */
class LanceDaysSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-lance-days").toString + s"/$name.lance"

  /** 6 days x 50 events, timestamps scattered within each day. */
  private def eventsDf: DataFrame =
    (0 until 300).map { i =>
      val day = i % 6
      val micros = day.toLong * 86400000000L + (i * 977L % 86400L) * 1000000L
      (new java.sql.Timestamp(micros / 1000L), i.toLong, s"e$i")
    }.toDF("ts", "uid", "tag")

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def withConf[T](kv: (String, String)*)(f: => T): T = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("days write: manifest spec, single-day fragments, epoch-day values, exact round-trip") {
    val ds = tmp("rt")
    eventsDf.write.format("lance").option("partitionBy", "days(ts)")
      .mode("overwrite").save(ds)
    val back = spark.read.format("lance").load(ds)
    assert(back.exceptAll(eventsDf).isEmpty && eventsDf.exceptAll(back).isEmpty)
    val (fs, p) = graft.sources.lance.LanceFormat.fileSystem(
      ds, spark.sessionState.newHadoopConf())
    val m = graft.sources.lance.LanceFormat.readManifest(
      fs, graft.sources.lance.LanceFormat.latestManifestPath(fs, p, None))
    assert(m.partitionCols == Seq("days(ts)"))
    assert(m.fragments.nonEmpty)
    assert(m.fragments.forall(_.partValues.length == 1))
    // every fragment's rows all fall inside the fragment's recorded day
    val spans = back.select(
        expr("CAST(floor(unix_timestamp(ts) / 86400) AS INT)").as("day"))
      .distinct().as[Int].collect().toSet
    assert(m.fragments.map(_.partValues.head.toInt).toSet == spans)
    assert(spans == (0 until 6).toSet)
  }

  test("bound days function agrees with the writer on timestamps and dates") {
    import org.apache.spark.sql.types._
    val f = new graft.sources.lance.LanceDaysFunction
    val bTs = f.bind(StructType(Seq(StructField("ts", TimestampType))))
      .asInstanceOf[graft.sources.lance.LanceDaysBound]
    for (micros <- Seq(0L, 1L, 86400000000L - 1, 86400000000L, -1L, -86400000000L)) {
      val viaFn = bTs.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(micros))
      assert(viaFn == graft.sources.lance.LanceDays.daysOf(micros, TimestampType))
    }
    // floor semantics pre-epoch: -1 micro is day -1, not day 0
    assert(graft.sources.lance.LanceDays.daysOf(-1L, TimestampType) == -1)
    val bD = f.bind(StructType(Seq(StructField("d", DateType))))
      .asInstanceOf[graft.sources.lance.LanceDaysBound]
    assert(bD.produceResult(org.apache.spark.sql.catalyst.InternalRow(123)) == 123)
  }

  test("catalog-read SPJ on the raw timestamp: no join shuffle, exact") {
    val l = tmp("jl"); val r = tmp("jr")
    val left = eventsDf.filter($"uid" % 2 === 0)
    val right = eventsDf.filter($"uid" % 3 === 0)
      .select($"ts", $"uid".as("ruid"))
    left.write.format("lance").option("partitionBy", "days(ts)")
      .mode("overwrite").save(l)
    right.write.format("lance").option("partitionBy", "days(ts)")
      .mode("overwrite").save(r)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
             "spark.sql.requireAllClusterKeysForCoPartition" -> "false") {
      val j = spark.sql(
        s"""SELECT a.ts, a.uid, b.ruid
            FROM lance.`$l` a JOIN lance.`$r` b ON a.ts = b.ts
            ORDER BY a.ts, a.uid, b.ruid""")
      val plan = finalPlan(j)
      val joinShuffles = plan.toString.linesIterator
        .count(s => s.contains("Exchange hashpartitioning(ts#"))
      assert(joinShuffles == 0, s"expected no join shuffle:\n$plan")
      val expected = left.join(right, Seq("ts"))
        .select($"ts", $"uid", $"ruid").orderBy("ts", "uid", "ruid")
      assert(j.exceptAll(expected).isEmpty && expected.exceptAll(j).isEmpty)
    }
  }

  test("time-range predicates prune day fragments from manifest stats") {
    val ds = tmp("prune")
    eventsDf.write.format("lance").option("partitionBy", "days(ts)")
      .mode("overwrite").save(ds)
    def parts(df: DataFrame): Int = {
      df.collect()
      df.rdd.getNumPartitions
    }
    val all = spark.read.format("lance").load(ds)
    val full = parts(all)
    assert(full >= 6, s"expected >= 6 day fragments, got $full")
    val oneDay = spark.read.format("lance").load(ds)
      .filter($"ts" >= lit("1970-01-03 00:00:00").cast("timestamp") &&
              $"ts" < lit("1970-01-04 00:00:00").cast("timestamp"))
    assert(parts(oneDay) <= 2, "one-day filter should plan ~1 fragment")
    assert(oneDay.count() == 50)
  }

  test("plain append degrades reporting; partition-preserving compact repairs it") {
    val ds = tmp("degrade")
    eventsDf.write.format("lance").option("partitionBy", "days(ts)")
      .mode("overwrite").save(ds)
    def reportable: Boolean = spark.sql(s"CALL lance.describe('$ds')")
      .select("partitioning_reportable").as[Boolean].head()
    assert(reportable)
    eventsDf.limit(10).write.format("lance").mode("append").save(ds)
    assert(!reportable)
    graft.sources.lance.LanceMaintenance.compact(spark, ds)
    assert(reportable)
    assert(spark.read.format("lance").load(ds).count() == 310)
  }

  test("months/years layouts: month-cut fragments, month-since-epoch values") {
    val ds = tmp("months")
    // 90 days of data spanning 3 months of 1970
    val df = (0 until 90).map { d =>
      (new java.sql.Timestamp(d.toLong * 86400000L), d.toLong)
    }.toDF("ts", "i")
    df.write.format("lance").option("partitionBy", "months(ts)")
      .mode("overwrite").save(ds)
    val (fs, p) = graft.sources.lance.LanceFormat.fileSystem(
      ds, spark.sessionState.newHadoopConf())
    val m = graft.sources.lance.LanceFormat.readManifest(
      fs, graft.sources.lance.LanceFormat.latestManifestPath(fs, p, None))
    assert(m.partitionCols == Seq("months(ts)"))
    assert(m.fragments.map(_.partValues.head.toInt).toSet == Set(0, 1, 2))
    val back = spark.read.format("lance").load(ds)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // unit arithmetic: months/years since epoch, floor pre-1970
    import org.apache.spark.sql.types._
    val D = graft.sources.lance.LanceDays
    assert(D.unitOf("months", 0L, TimestampType) == 0)
    assert(D.unitOf("months", 31L * 86400000000L, TimestampType) == 1)
    assert(D.unitOf("months", -1L, TimestampType) == -1) // Dec 1969
    assert(D.unitOf("years", 365L * 86400000000L, TimestampType) == 1)
    assert(D.unitOf("years", -1L, TimestampType) == -1)
    // the catalog function binds for every unit
    for (u <- Seq("days", "months", "years")) {
      val f = new graft.sources.lance.LanceDaysFunction(u)
      val b = f.bind(StructType(Seq(StructField("ts", TimestampType))))
      assert(b.name() == u)
    }
  }

  test("days(col) on a non-temporal column is refused") {
    val ds = tmp("badcol")
    val e = intercept[Exception] {
      eventsDf.write.format("lance").option("partitionBy", "days(uid)")
        .mode("overwrite").save(ds)
    }
    assert(e.getMessage.contains("days(uid)"))
  }
}
