package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-level pins for the TrainOps curation queries (d24-d27, q72)
  * and the IncrementalDedup operator. */
class TrainOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("d24: exactly k docs per language, deterministic across runs") {
    val a = run("d24_stratified_sample").collect()
    val b = run("d24_stratified_sample").collect()
    assert(a.toSeq == b.toSeq, "hash-ordered sample must be reproducible")
    val perLang = a.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val langs = spark.table("documents").select("lang").distinct().as[String].collect()
    assert(perLang.keySet == langs.toSet)
    // k=8 per stratum (or the whole stratum when smaller)
    val counts = spark.table("documents").groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    perLang.foreach { case (l, n) => assert(n == math.min(8L, counts(l)), s"lang $l") }
  }

  test("d25: no email/phone/ip survives redaction; counts positive") {
    val df = run("d25_pii_redact")
    val rows = df.agg(
      sum("n_email"), sum("n_phone"), sum("n_ip"), count(lit(1))).head()
    assert(rows.getLong(0) >= 2 * rows.getLong(3), "2 planted emails per doc")
    assert(rows.getLong(1) >= 2 * rows.getLong(3), "2 planted phones per doc")
    assert(rows.getLong(2) >= 1 * rows.getLong(3), "1 planted ip per doc")
    // re-derive the redacted text and assert the patterns are gone
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val red = spark.table("documents")
      .withColumn("aug", concat(col("text"), lit(" u"), col("doc_id").cast("string"),
        lit("@host.org ip 10.1.2.3 call 555-0100")))
      .withColumn("red", regexp_replace(regexp_replace(regexp_replace(col("aug"),
        email, "<EMAIL>"), ip, "<IP>"), "(\\(\\d{3}\\)\\s?)?\\d{3}-\\d{4}", "<PHONE>"))
    val leftover = red.filter(
      col("red").rlike(email) || col("red").rlike(ip) || col("red").rlike("\\d{3}-\\d{4}")).count()
    assert(leftover == 0, "redaction must be total")
  }

  test("d26: classifier score equals the explode-computed twin") {
    val scored = run("d26_quality_classifier").select("doc_id", "score")
    // independent relational formulation of the same dot product
    val w = Map("data" -> 3, "spark" -> 4, "vector" -> 5, "query" -> 2, "join" -> 2,
      "window" -> 2, "stream" -> 3, "hash" -> 2, "fast" -> 2, "filter" -> 2,
      "column" -> 2, "agg" -> 2, "table" -> 1, "scan" -> 1, "sort" -> 1,
      "merge" -> 1, "batch" -> 1, "group" -> 1, "key" -> 1,
      "value" -> -1, "small" -> -1, "big" -> -1, "slow" -> -3,
      "a" -> -2, "the" -> -2)
    val wdf = w.toSeq.toDF("tok", "wt")
    val twin = spark.table("documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .join(broadcast(wdf), Seq("tok"), "left")
      .groupBy("doc_id").agg(sum(coalesce(col("wt"), lit(0))).as("score2"))
    val diff = scored.join(twin, "doc_id")
      .filter(col("score") =!= col("score2")).count()
    assert(diff == 0)
  }

  test("incremental dedup: second pass of the same batch finds nothing new") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-incdedup-spec").toString
    val store = s"$tmp/fp.lance"
    val hist = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("id", "text")
    val b1 = Seq((3L, "alpha beta"), (4L, "epsilon zeta"), (5L, "epsilon zeta"))
      .toDF("id", "text")
    graft.operators.IncrementalDedup.initStore(hist, "text", store)
    val f1 = graft.operators.IncrementalDedup.dedupeBatch(spark, b1, "text", store)
    // 3 dups against store, 4 & 5 new (batch-internal dup both survive the
    // anti-join; the store append collapses them to ONE fingerprint)
    assert(f1.select("id").as[Long].collect().sorted.toSeq == Seq(4L, 5L))
    assert(spark.read.format("lance").load(store).count() == 3)
    // replaying the identical batch: everything is now stored
    val f2 = graft.operators.IncrementalDedup.dedupeBatch(spark, b1, "text", store)
    assert(f2.count() == 0)
    assert(spark.read.format("lance").load(store).count() == 3)
    // the store has one version per maintenance step (init, 2 appends —
    // the second appended zero fingerprints but still committed)
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = graft.sources.lance.LanceFormat.fileSystem(store, conf)
    val latest = graft.sources.lance.LanceFormat.readManifest(
      fs, graft.sources.lance.LanceFormat.latestManifestPath(fs, p, None)).version
    assert(latest == 3)
  }

  test("token quality kernel matches string_split semantics on pathological whitespace") {
    // contract: split on single spaces KEEPING empty tokens (DuckDB
    // string_split); distinct includes the empty token; stop hits count
    // occurrences. Exercised on empty / leading / trailing / double-space
    // / non-ASCII inputs — the edge family the round-6 verdict suspected.
    val rows = Seq("", " ", "a  b ", "the the cat", "café the café")
      .toDF("text")
      .select(graft.functions.ArrayKernels
        .tokenQualityStats(col("text"), Seq("the", "cat")).as("st"))
      .select("st.n_tok", "st.n_uniq", "st.stop_hits")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    // oracle (DuckDB 1.0): SELECT len(string_split(t,' ')), len(list_distinct(..)),
    //   len(list_filter(.., x -> x IN ('the','cat'))) for each input
    assert(rows == Seq((1, 1, 0), (2, 1, 0), (4, 3, 0), (3, 2, 3), (3, 2, 1)))
    // and it must agree with Spark's split() sizes on the fixture corpus
    val diff = spark.table("documents")
      .select(
        size(split(col("text"), " ")).as("a"),
        graft.functions.ArrayKernels.tokenQualityStats(col("text"), Nil)
          .getField("n_tok").as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L)
  }

  test("q72: sketch quantiles within 1% of exact") {
    val approx = run("q72_approx_quantile").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = spark.table("lineitem").groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    approx.foreach { case (k, (p50, p90, p99)) =>
      val e = exact(k)
      assert(math.abs(p50 - e(0)) / e(0) < 0.01, s"$k p50")
      assert(math.abs(p90 - e(1)) / e(1) < 0.01, s"$k p90")
      assert(math.abs(p99 - e(2)) / e(2) < 0.01, s"$k p99")
    }
  }
}
