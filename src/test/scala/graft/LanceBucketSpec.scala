package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hash-bucket layout (`option("bucketBy", "n:col")`) + the catalog's
  * `bucket` V2 function: catalog-resolved reads of two same-bucketed
  * datasets storage-partition-join on the RAW high-cardinality key with
  * zero shuffle and no materialized bucket column. Plain-path reads (no
  * function catalog) degrade to a shuffled plan with identical results. */
class LanceBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-lance-bkt").toString + s"/$name.lance"

  private def leftDf: DataFrame =
    (0 until 3000).map(i => (i.toLong * 7 % 2011, s"l$i", i)).toDF("k", "lv", "i")
  private def rightDf: DataFrame =
    (0 until 2000).map(i => (i.toLong * 13 % 2011, s"r$i")).toDF("k", "rv")

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }
  private def countShuffles(p: SparkPlan): Int =
    p.toString.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") ||
      l.contains("Exchange rangepartitioning") ||
      l.contains("Exchange SinglePartition"))

  private def withConf[T](kv: (String, String)*)(f: => T): T = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucket hash is stable and bound function agrees with the writer") {
    val f = new graft.sources.lance.LanceBucketFunction
    val bound = f.bind(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("c", org.apache.spark.sql.types.LongType))))
      .asInstanceOf[graft.sources.lance.LanceBucketBound]
    for (v <- Seq(0L, 1L, -5L, 123456789L, Long.MaxValue)) {
      val viaFn = bound.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(16, v))
      assert(viaFn == graft.sources.lance.LanceBucket.bucketOf(v, 16))
      assert(viaFn >= 0 && viaFn < 16)
    }
    // strings too
    assert(graft.sources.lance.LanceBucket.bucketOf(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"), 8) ==
      graft.sources.lance.LanceBucket.bucketOf("abc", 8))
  }

  test("bucketed write: manifest spec + every fragment one bucket, round-trip exact") {
    val ds = tmp("rt")
    leftDf.write.format("lance").option("bucketBy", "8:k")
      .option("writePartitions", "4").mode("overwrite").save(ds)
    val back = spark.read.format("lance").load(ds)
    assert(back.exceptAll(leftDf).isEmpty && leftDf.exceptAll(back).isEmpty)
    val (fs, p) = graft.sources.lance.LanceFormat.fileSystem(
      ds, spark.sessionState.newHadoopConf())
    val m = graft.sources.lance.LanceFormat.readManifest(
      fs, graft.sources.lance.LanceFormat.latestManifestPath(fs, p, None))
    assert(m.partitionCols == Seq("bucket(8,k)"))
    assert(m.fragments.forall(_.partValues.length == 1))
    val ids = m.fragments.map(_.partValues.head.toInt)
    assert(ids.forall(b => b >= 0 && b < 8))
    // every row in a fragment hashes to the fragment's bucket
    assert(back.select("k").distinct().as[Long].collect().forall(k =>
      graft.sources.lance.LanceBucket.bucketOf(k, 8) < 8))
  }

  test("catalog-read bucketed join on the raw key: zero shuffles, exact") {
    val l = tmp("jl"); val r = tmp("jr")
    leftDf.write.format("lance").option("bucketBy", "8:k")
      .option("writePartitions", "4").mode("overwrite").save(l)
    rightDf.write.format("lance").option("bucketBy", "8:k")
      .option("writePartitions", "4").mode("overwrite").save(r)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
             "spark.sql.requireAllClusterKeysForCoPartition" -> "false") {
      val j = spark.sql(
        s"""SELECT a.k, COUNT(*) AS n, CAST(SUM(a.i) AS BIGINT) AS si
            FROM lance.`$l` a JOIN lance.`$r` b ON a.k = b.k
            GROUP BY a.k ORDER BY a.k""")
      val plan = finalPlan(j)
      // the JOIN itself must not shuffle; the groupBy(k) is key-grouped
      // too (k determines the bucket), but Spark only knows bucket(k) —
      // allow the aggregate/sort exchanges, forbid a join-side shuffle
      val joinShuffles = plan.toString.linesIterator
        .count(l => l.contains("Exchange hashpartitioning(k#"))
      assert(joinShuffles == 0, s"expected no join shuffle:\n$plan")
      val expected = leftDf.join(rightDf, Seq("k")).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("i").cast("long").as("si"))
        .orderBy("k")
      assert(j.exceptAll(expected).isEmpty && expected.exceptAll(j).isEmpty)
    }
  }

  test("plain-path read degrades to shuffle with identical results") {
    val l = tmp("pl"); val r = tmp("pr")
    leftDf.write.format("lance").option("bucketBy", "8:k")
      .option("writePartitions", "4").mode("overwrite").save(l)
    rightDf.write.format("lance").option("bucketBy", "8:k")
      .option("writePartitions", "4").mode("overwrite").save(r)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val lj = spark.read.format("lance").load(l)
      val rj = spark.read.format("lance").load(r)
      val j = lj.join(rj, Seq("k")).select("k", "lv", "rv")
      val plan = finalPlan(j)
      assert(countShuffles(plan) > 0) // no function catalog on this path
      val expected = leftDf.join(rightDf, Seq("k")).select("k", "lv", "rv")
      assert(j.exceptAll(expected).isEmpty && expected.exceptAll(j).isEmpty)
    }
  }

  test("bucketBy + sortBy: fragments sorted within; appends keep the layout") {
    val ds = tmp("srt")
    leftDf.write.format("lance").option("bucketBy", "4:k")
      .option("sortBy", "i").option("writePartitions", "2")
      .mode("overwrite").save(ds)
    val (fs, p) = graft.sources.lance.LanceFormat.fileSystem(
      ds, spark.sessionState.newHadoopConf())
    val m = graft.sources.lance.LanceFormat.readManifest(
      fs, graft.sources.lance.LanceFormat.latestManifestPath(fs, p, None))
    assert(m.sortCols == Seq("i"))
    // same-layout append keeps the spec; a different bucket count refuses
    Seq((9999L, "x", 1)).toDF("k", "lv", "i").write.format("lance")
      .option("bucketBy", "4:k").option("sortBy", "i").mode("append").save(ds)
    val e = intercept[Exception] {
      Seq((1L, "y", 2)).toDF("k", "lv", "i").write.format("lance")
        .option("bucketBy", "8:k").mode("append").save(ds)
    }
    assert(e.getMessage.contains("overwrite to repartition"))
    val back = spark.read.format("lance").load(ds)
    assert(back.count() == 3001)
  }
}
