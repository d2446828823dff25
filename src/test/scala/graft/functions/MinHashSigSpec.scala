package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MinHashSig / BigramBucketCounts (fused kernels) vs the declarative
  * constructions they replaced — the portable md5 recipes whose DuckDB
  * twins are the d23/d28/d33/d34 hash oracles. Any value difference on
  * any input is a kernel bug: the queries' correctness gates compare
  * downstream HASHES, so the kernels must be bit-identical, not just
  * statistically equivalent.
  */
class MinHashSigSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val P = 8

  private def corpus: Seq[String] = {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Array("tok1", "tok2", "alpha", "beta", "x", "", "é",
      "stem_3", "a b", "0", "Zz", "日本", "%", "+")
    val docs = (0 until 400).map { _ =>
      val n = rnd.nextInt(30)
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    // edges: empty doc, single token, all-duplicate doc, leading/trailing
    // and doubled spaces (empty tokens), a long doc
    docs ++ Seq("", "solo", "dup dup dup dup", " lead", "trail ", "a  b",
      "  ", (1 to 3000).map(i => s"w${i % 251}").mkString(" "))
  }

  test("minhash signature kernel ≡ declarative array_min(transform(md5)) construction") {
    val df = corpus.toDF("text")
    val declarative = df.select(
      array_distinct(split(col("text"), " ")).as("toks"), col("text"))
      .select(col("text"), array((0 until P).map(p =>
        array_min(transform(col("toks"), tk =>
          substring(md5(concat(lit(p + ":"), tk)), 1, 13)))): _*).as("sig"))
      .select("text", "sig")
    val kernel = df.select(col("text"),
      ArrayKernels.minhashSig(col("text"), P).as("sig"))
    val d = declarative.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val k = kernel.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(d.keySet == k.keySet)
    d.foreach { case (t, sig) =>
      assert(k(t) == sig, s"sig divergence on <<$t>>")
    }
  }

  test("bigram bucket kernel ≡ explode(zip_with)->md5->substring->count") {
    val df = corpus.toDF("text")
    val declarative = df
      .withColumn("t", split(col("text"), " "))
      .select(col("text"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("g"))
      .select(col("text"), substring(md5(col("g")), 1, 4).as("b"))
      .groupBy("text", "b").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val kernel = df
      .select(col("text"), explode(ArrayKernels.bigramBuckets(col("text"))).as("e"))
      .select(col("text"), col("e.b").as("b"), col("e.c").as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(kernel == declarative)
  }

  test("docs with fewer than two tokens produce no bigram buckets") {
    val df = Seq("", "solo").toDF("text")
    assert(df.select(explode(ArrayKernels.bigramBuckets(col("text")))).count() == 0)
  }

  test("SQL registration") {
    val r = spark.sql(
      "SELECT graft_minhash_sig('a b a', 4) AS s, graft_bigram_buckets('a b a') AS bb")
      .head()
    assert(r.getSeq[String](0).length == 4)
    assert(r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).sum == 2)
  }

  test("non-literal or fractional p fails analysis with a named error") {
    val colRef = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash_sig(t, CAST(length(t) AS INT)) " +
        "FROM VALUES ('a b') v(t)").collect()
    }
    assert(colRef.getMessage.contains("graft_minhash_sig"))
    assert(colRef.getMessage.contains("literal"))
    val frac = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash_sig('a b', 4.5)").collect()
    }
    assert(frac.getMessage.contains("integral"))
  }
}
