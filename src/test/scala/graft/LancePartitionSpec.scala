package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-partitioned lance layout (`option("partitionBy", cols)`) and the
  * scan's KeyGroupedPartitioning / SortOrder reporting:
  *
  *  - storage-partitioned join: two datasets partitioned on the same
  *    columns join with ZERO shuffle (the 100 TB fact⋈fact story);
  *  - partition-key aggregation: no exchange;
  *  - partitioned + sortBy: the join also plans with NO SortExec
  *    (shuffle-free AND sort-free merge join);
  *  - graceful degrade: an unpartitioned append disables reporting but
  *    keeps results exact; compaction likewise;
  *  - metadata survives deleteWhere; NULL partition values refuse. */
class LancePartitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-lance-part").toString + s"/$name.lance"

  private def leftDf: DataFrame =
    (0 until 2000).map(i => (i % 10, i.toLong, s"l$i")).toDF("bkt", "k", "lv")
  private def rightDf: DataFrame =
    (0 until 1500).map(i => (i % 10, (i * 2).toLong, s"r$i")).toDF("bkt", "k", "rv")

  private def collectPlan(df: DataFrame): SparkPlan = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }
  // AQE hides materialized exchanges inside leaf QueryStageExec nodes that
  // tree collection does not descend into — but toString renders the full
  // stage tree, so count plan LINES (the PlanSpec convention).
  private def countShuffles(p: SparkPlan): Int =
    p.toString.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") ||
      l.contains("Exchange rangepartitioning") ||
      l.contains("Exchange SinglePartition"))
  private def countSorts(p: SparkPlan): Int =
    p.toString.linesIterator.count(_.contains(" Sort ["))

  // requireAllClusterKeysForCoPartition=false: partition keys may be a
  // SUBSET of the join keys (join on (bkt, k), partitioned by bkt) — the
  // standard setting for storage-partitioned joins
  private def noBroadcast[T](f: => T): T =
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
             "spark.sql.requireAllClusterKeysForCoPartition" -> "false")(f)
  private def withConf[T](kv: (String, String)*)(f: => T): T = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("partitioned write: round-trip exact, one fragment per value, manifest metadata") {
    val ds = tmp("rt")
    leftDf.write.format("lance").option("partitionBy", "bkt")
      .mode("overwrite").save(ds)
    val back = spark.read.format("lance").load(ds)
    assert(back.exceptAll(leftDf).isEmpty && leftDf.exceptAll(back).isEmpty)
    val (fs, p) = graft.sources.lance.LanceFormat.fileSystem(
      ds, spark.sessionState.newHadoopConf())
    val m = graft.sources.lance.LanceFormat.readManifest(
      fs, graft.sources.lance.LanceFormat.latestManifestPath(fs, p, None))
    assert(m.partitionCols == Seq("bkt"))
    assert(m.sortCols == Seq("bkt"))
    assert(m.fragments.size == 10) // one per value
    assert(m.fragments.flatMap(_.partValues).toSet == (0 until 10).map(_.toString).toSet)
  }

  test("storage-partitioned join: zero shuffles, exact result") {
    val l = tmp("jl"); val r = tmp("jr")
    leftDf.write.format("lance").option("partitionBy", "bkt").mode("overwrite").save(l)
    rightDf.write.format("lance").option("partitionBy", "bkt").mode("overwrite").save(r)
    noBroadcast {
      val lj = spark.read.format("lance").load(l)
      val rj = spark.read.format("lance").load(r)
      val j = lj.join(rj, Seq("bkt", "k")).groupBy("bkt")
        .agg(count(lit(1)).as("n"), sum("k").as("sk"))
      val plan = collectPlan(j)
      assert(countShuffles(plan) == 0, s"expected no shuffle:\n$plan")
      val expected = leftDf.join(rightDf, Seq("bkt", "k")).groupBy("bkt")
        .agg(count(lit(1)).as("n"), sum("k").as("sk"))
      assert(j.exceptAll(expected).isEmpty && expected.exceptAll(j).isEmpty)
    }
  }

  test("partition-key aggregation: no exchange") {
    val ds = tmp("agg")
    leftDf.write.format("lance").option("partitionBy", "bkt").mode("overwrite").save(ds)
    val a = spark.read.format("lance").load(ds)
      .groupBy("bkt").agg(sum("k").as("sk"))
    val plan = collectPlan(a)
    assert(countShuffles(plan) == 0, s"expected no shuffle:\n$plan")
    val expected = leftDf.groupBy("bkt").agg(sum("k").as("sk"))
    assert(a.exceptAll(expected).isEmpty && expected.exceptAll(a).isEmpty)
  }

  test("partitioned + sortBy: join plans with zero shuffles AND zero sorts") {
    val l = tmp("sl"); val r = tmp("sr")
    leftDf.write.format("lance").option("partitionBy", "bkt")
      .option("sortBy", "k").mode("overwrite").save(l)
    rightDf.write.format("lance").option("partitionBy", "bkt")
      .option("sortBy", "k").mode("overwrite").save(r)
    noBroadcast {
      withConf("spark.sql.join.preferSortMergeJoin" -> "true") {
        val lj = spark.read.format("lance").load(l)
        val rj = spark.read.format("lance").load(r)
        val j = lj.join(rj, Seq("bkt", "k")).select("bkt", "k", "lv", "rv")
        val plan = collectPlan(j)
        assert(countShuffles(plan) == 0, s"expected no shuffle:\n$plan")
        assert(countSorts(plan) == 0, s"expected no sort:\n$plan")
        val expected = leftDf.join(rightDf, Seq("bkt", "k")).select("bkt", "k", "lv", "rv")
        assert(j.exceptAll(expected).isEmpty && expected.exceptAll(j).isEmpty)
      }
    }
  }

  test("unpartitioned append degrades: shuffle returns, results stay exact") {
    val ds = tmp("deg")
    leftDf.write.format("lance").option("partitionBy", "bkt").mode("overwrite").save(ds)
    val extra = Seq((3, 9999L, "x")).toDF("bkt", "k", "lv")
    extra.write.format("lance").mode("append").save(ds)
    val (fs, p) = graft.sources.lance.LanceFormat.fileSystem(
      ds, spark.sessionState.newHadoopConf())
    val m = graft.sources.lance.LanceFormat.readManifest(
      fs, graft.sources.lance.LanceFormat.latestManifestPath(fs, p, None))
    assert(m.partitionCols == Seq("bkt"), s"cols=${m.partitionCols}")
    assert(m.fragments.size == 11, s"frags=${m.fragments.size}")
    assert(m.fragments.count(_.partValues.isEmpty) == 1,
      s"partValues=${m.fragments.map(_.partValues)}")
    val a = spark.read.format("lance").load(ds).groupBy("bkt").agg(sum("k").as("sk"))
    val plan = collectPlan(a)
    assert(countShuffles(plan) > 0, s"value-less fragment must disable the report:\n$plan")
    val expected = leftDf.unionAll(extra).groupBy("bkt").agg(sum("k").as("sk"))
    assert(a.exceptAll(expected).isEmpty && expected.exceptAll(a).isEmpty)
  }

  test("partitioned append keeps reporting; mismatched partitionBy append refuses") {
    val ds = tmp("app")
    leftDf.write.format("lance").option("partitionBy", "bkt").mode("overwrite").save(ds)
    Seq((10, 777L, "n")).toDF("bkt", "k", "lv")
      .write.format("lance").option("partitionBy", "bkt").mode("append").save(ds)
    val a = spark.read.format("lance").load(ds).groupBy("bkt").agg(count(lit(1)).as("n"))
    assert(countShuffles(collectPlan(a)) == 0)
    assert(a.count() == 11)
    val e = intercept[Exception] {
      Seq((1, 1L, "z")).toDF("bkt", "k", "lv")
        .write.format("lance").option("partitionBy", "k").mode("append").save(ds)
    }
    assert(e.getMessage.contains("overwrite to repartition"))
  }

  test("deleteWhere preserves partition metadata and exactness") {
    val ds = tmp("del")
    leftDf.write.format("lance").option("partitionBy", "bkt").mode("overwrite").save(ds)
    graft.sources.lance.LanceMaintenance.deleteWhere(spark, ds, "k % 3 = 0")
    val a = spark.read.format("lance").load(ds).groupBy("bkt").agg(sum("k").as("sk"))
    assert(countShuffles(collectPlan(a)) == 0)
    val expected = leftDf.filter(!($"k" % 3 === 0)).groupBy("bkt").agg(sum("k").as("sk"))
    assert(a.exceptAll(expected).isEmpty && expected.exceptAll(a).isEmpty)
  }

  test("NULL partition value refuses loudly; unsupported type refuses driver-side") {
    val ds = tmp("nulls")
    val withNull = Seq((Some(1), 1L), (None, 2L)).toDF("bkt", "k")
    val e = intercept[Exception] {
      withNull.write.format("lance").option("partitionBy", "bkt")
        .mode("overwrite").save(ds)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("non-null")))
    val dbl = Seq((1.5, 1L)).toDF("bkt", "k")
    val e2 = intercept[IllegalArgumentException] {
      dbl.write.format("lance").option("partitionBy", "bkt")
        .mode("overwrite").save(ds)
    }
    assert(e2.getMessage.contains("partition columns must be"))
  }

  test("date partition column round-trips and reports (raw epoch-day codec)") {
    val ds = tmp("date")
    val df = (0 until 400).map(i =>
      (java.sql.Date.valueOf(s"2026-01-${1 + i % 9}"), i.toLong)).toDF("d", "v")
    df.write.format("lance").option("partitionBy", "d").mode("overwrite").save(ds)
    val a = spark.read.format("lance").load(ds).groupBy("d").agg(sum("v").as("sv"))
    assert(countShuffles(collectPlan(a)) == 0)
    val expected = df.groupBy("d").agg(sum("v").as("sv"))
    assert(a.exceptAll(expected).isEmpty && expected.exceptAll(a).isEmpty)
  }

  test("string partition column round-trips and reports") {
    val ds = tmp("str")
    val df = (0 until 300).map(i => (s"lang${i % 4}", i.toLong)).toDF("lang", "v")
    df.write.format("lance").option("partitionBy", "lang").mode("overwrite").save(ds)
    val a = spark.read.format("lance").load(ds).groupBy("lang").agg(sum("v").as("sv"))
    assert(countShuffles(collectPlan(a)) == 0)
    val expected = df.groupBy("lang").agg(sum("v").as("sv"))
    assert(a.exceptAll(expected).isEmpty && expected.exceptAll(a).isEmpty)
  }

  test("runtime (DPP) filtering coexists with the partitioning report") {
    // a selective broadcast-dim join installs runtime zone filters on the
    // scan (l20 path) WHILE the scan also reports KeyGroupedPartitioning
    // for the downstream partition-key aggregation — dropping fragments
    // (and thus whole key groups) at runtime must not break grouping or
    // results (Spark recomputes groups from the filtered partitions)
    val ds = tmp("dpp")
    leftDf.write.format("lance").option("partitionBy", "bkt")
      .option("sortBy", "k").mode("overwrite").save(ds)
    val dim = Seq((2, "keep"), (7, "keep")).toDF("dbkt", "tag")
    val fact = spark.read.format("lance").load(ds)
    val q = fact.join(broadcast(dim), fact("bkt") === dim("dbkt"))
      .groupBy("bkt").agg(sum("k").as("sk"))
    val expected = leftDf.filter($"bkt".isin(2, 7)).groupBy("bkt").agg(sum("k").as("sk"))
    assert(q.exceptAll(expected).isEmpty && expected.exceptAll(q).isEmpty)
    // and under an SPJ join in the same query: partitioned⋈partitioned
    // with one side runtime-filtered by a broadcast dim
    noBroadcast {
      val r = tmp("dppr")
      rightDf.write.format("lance").option("partitionBy", "bkt").mode("overwrite").save(r)
      val rj = spark.read.format("lance").load(r)
      val lf = spark.read.format("lance").load(ds).filter($"bkt" < 5)
      val j = lf.join(rj, Seq("bkt", "k")).groupBy("bkt").agg(count(lit(1)).as("n"))
      val expected2 = leftDf.filter($"bkt" < 5).join(rightDf, Seq("bkt", "k"))
        .groupBy("bkt").agg(count(lit(1)).as("n"))
      assert(j.exceptAll(expected2).isEmpty && expected2.exceptAll(j).isEmpty)
    }
  }

  test("window over partitioned+sorted layout: no exchange, no sort") {
    // PARTITION BY the layout's partition column ORDER BY its sort column:
    // KeyGroupedPartitioning satisfies the window's clustering and the
    // reported SortOrder its ordering — the whole window runs map-side
    val ds = tmp("win")
    leftDf.write.format("lance").option("partitionBy", "bkt")
      .option("sortBy", "k").mode("overwrite").save(ds)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("bkt").orderBy("k")
    val q = spark.read.format("lance").load(ds)
      .select(col("bkt"), col("k"), sum("k").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("run"))
    val plan = collectPlan(q)
    assert(countShuffles(plan) == 0, s"expected no exchange:\n$plan")
    assert(countSorts(plan) == 0, s"expected no sort:\n$plan")
    val expected = leftDf.select(col("bkt"), col("k"), sum("k").over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("run"))
    assert(q.exceptAll(expected).isEmpty && expected.exceptAll(q).isEmpty)
  }

  test("multi-column partitioning reports and joins shuffle-free") {
    val l = tmp("ml"); val r = tmp("mr")
    val a = (0 until 1200).map(i => (i % 4, s"s${i % 3}", i.toLong, s"a$i"))
      .toDF("p1", "p2", "k", "av")
    val b = (0 until 900).map(i => (i % 4, s"s${i % 3}", (i * 2).toLong, s"b$i"))
      .toDF("p1", "p2", "k", "bv")
    a.write.format("lance").option("partitionBy", "p1,p2").mode("overwrite").save(l)
    b.write.format("lance").option("partitionBy", "p1,p2").mode("overwrite").save(r)
    noBroadcast {
      val j = spark.read.format("lance").load(l)
        .join(spark.read.format("lance").load(r), Seq("p1", "p2", "k"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("n"))
      val plan = collectPlan(j)
      assert(countShuffles(plan) == 0, s"expected no shuffle:\n$plan")
      val expected = a.join(b, Seq("p1", "p2", "k")).groupBy("p1", "p2")
        .agg(count(lit(1)).as("n"))
      assert(j.exceptAll(expected).isEmpty && expected.exceptAll(j).isEmpty)
    }
  }

  test("partially-clustered SPJ: skewed partition splits, exact join") {
    // one partition value holds ~70% of the fact side (the skew shape);
    // partiallyClusteredDistribution lets Spark split that key group
    // across tasks instead of one straggler — results must stay exact
    val l = tmp("skl"); val r = tmp("skr")
    val skewed = (0 until 4000).map { i =>
      val b = if (i < 2800) 0 else 1 + i % 9
      (b, i.toLong, s"l$i")
    }.toDF("bkt", "k", "lv")
    skewed.write.format("lance").option("partitionBy", "bkt").mode("overwrite").save(l)
    rightDf.write.format("lance").option("partitionBy", "bkt").mode("overwrite").save(r)
    noBroadcast {
      withConf(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true") {
        // the JOIN itself must be exchange-free; a downstream groupBy may
        // legitimately re-shuffle (split key groups void the clustering)
        val j = spark.read.format("lance").load(l)
          .join(spark.read.format("lance").load(r), Seq("bkt", "k"))
          .select("bkt", "k", "lv", "rv")
        val plan = collectPlan(j)
        assert(countShuffles(plan) == 0, s"expected no join shuffle:\n$plan")
        val expected = skewed.join(rightDf, Seq("bkt", "k"))
          .select("bkt", "k", "lv", "rv")
        assert(j.exceptAll(expected).isEmpty && expected.exceptAll(j).isEmpty)
      }
    }
  }

  test("asymmetric partition values: SPJ pushes missing values, exact join") {
    // left covers bkt 0..9, right only 0..4 — Spark's pushPartValues
    // aligns the key groups (empty partitions for the uncovered values);
    // results must match the shuffled plan exactly
    val l = tmp("al"); val r = tmp("ar")
    leftDf.write.format("lance").option("partitionBy", "bkt").mode("overwrite").save(l)
    val rHalf = rightDf.filter($"bkt" < 5)
    rHalf.write.format("lance").option("partitionBy", "bkt").mode("overwrite").save(r)
    noBroadcast {
      val lj = spark.read.format("lance").load(l)
      val rj = spark.read.format("lance").load(r)
      val j = lj.join(rj, Seq("bkt", "k")).groupBy("bkt").agg(count(lit(1)).as("n"))
      val plan = collectPlan(j)
      assert(countShuffles(plan) == 0, s"expected no shuffle:\n$plan")
      val expected = leftDf.join(rHalf, Seq("bkt", "k")).groupBy("bkt")
        .agg(count(lit(1)).as("n"))
      assert(j.exceptAll(expected).isEmpty && expected.exceptAll(j).isEmpty)
      // outer joins over mismatched value sets must also stay exact
      val lo = lj.join(rj, Seq("bkt", "k"), "left").select("bkt", "k", "lv", "rv")
      val expectedLo = leftDf.join(rHalf, Seq("bkt", "k"), "left")
        .select("bkt", "k", "lv", "rv")
      assert(lo.exceptAll(expectedLo).isEmpty && expectedLo.exceptAll(lo).isEmpty)
    }
  }

  test("compact preserves the partitioned layout and restores it after a degrade") {
    val ds = tmp("cmp")
    leftDf.write.format("lance").option("partitionBy", "bkt")
      .option("sortBy", "k").mode("overwrite").save(ds)
    // unpartitioned append degrades the report...
    val extra = Seq((3, 9999L, "x")).toDF("bkt", "k", "lv")
    extra.write.format("lance").mode("append").save(ds)
    assert(countShuffles(collectPlan(
      spark.read.format("lance").load(ds).groupBy("bkt").agg(sum("k")))) > 0)
    // ...and compaction IS the partitioned rewrite that restores it (the
    // degrade append cleared the sort claim, so re-declare it explicitly)
    graft.sources.lance.LanceMaintenance.compact(spark, ds, sortBy = Seq("k"))
    val (fs, p) = graft.sources.lance.LanceFormat.fileSystem(
      ds, spark.sessionState.newHadoopConf())
    val m = graft.sources.lance.LanceFormat.readManifest(
      fs, graft.sources.lance.LanceFormat.latestManifestPath(fs, p, None))
    assert(m.partitionCols == Seq("bkt") && m.sortCols == Seq("bkt", "k"))
    assert(m.fragments.size == 10 &&
           m.fragments.forall(_.partValues.length == 1))
    val a = spark.read.format("lance").load(ds).groupBy("bkt").agg(sum("k").as("sk"))
    assert(countShuffles(collectPlan(a)) == 0)
    val expected = leftDf.unionAll(extra).groupBy("bkt").agg(sum("k").as("sk"))
    assert(a.exceptAll(expected).isEmpty && expected.exceptAll(a).isEmpty)
  }

  test("compact preserves a bucketed layout") {
    val ds = tmp("cmpb")
    val df = (0 until 2000).map(i => (i.toLong * 3 % 997, s"v$i")).toDF("k", "v")
    df.write.format("lance").option("bucketBy", "4:k")
      .option("writePartitions", "4").mode("overwrite").save(ds)
    df.limit(100).write.format("lance").option("bucketBy", "4:k")
      .mode("append").save(ds)
    graft.sources.lance.LanceMaintenance.compact(spark, ds, targetFragments = 2)
    val (fs, p) = graft.sources.lance.LanceFormat.fileSystem(
      ds, spark.sessionState.newHadoopConf())
    val m = graft.sources.lance.LanceFormat.readManifest(
      fs, graft.sources.lance.LanceFormat.latestManifestPath(fs, p, None))
    assert(m.partitionCols == Seq("bucket(4,k)"))
    assert(m.fragments.forall(_.partValues.length == 1))
    val back = spark.read.format("lance").load(ds)
    val expected = df.unionAll(df.limit(100))
    assert(back.exceptAll(expected).isEmpty && expected.exceptAll(back).isEmpty)
  }

  test("partition column pruned from projection: no report, exact results") {
    val ds = tmp("prune")
    leftDf.write.format("lance").option("partitionBy", "bkt").mode("overwrite").save(ds)
    // projection drops bkt — identity transform would not resolve, so the
    // scan must fall back to UnknownPartitioning; values stay exact
    val a = spark.read.format("lance").load(ds).select("k", "lv")
      .groupBy("lv").agg(sum("k").as("sk"))
    val expected = leftDf.select("k", "lv").groupBy("lv").agg(sum("k").as("sk"))
    assert(a.exceptAll(expected).isEmpty && expected.exceptAll(a).isEmpty)
  }
}
