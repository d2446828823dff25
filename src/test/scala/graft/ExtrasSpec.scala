package graft

import graft.functions.ProductAgg
import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtrasSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("product UDAF multiplies exactly") {
    val out = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L)).toDF("k", "v")
      .groupBy("k").agg(ProductAgg.product_long(col("v")).as("p"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 24L, 2L -> 5L))
  }

  test("multimodal decode parses real PNG/JPEG header dims, passes through the rest") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").limit(50)
    val media = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val mime = if (id % 2 == 0) "image/png" else "image/jpeg"
        Multimodal.MediaRow(id, Multimodal.syntheticImage(mime,
          (100 + id).toInt, (50 + id).toInt, text.getBytes("UTF-8")), mime)
      }
    val a = Multimodal.decode(media).collect().sortBy(_.doc_id)
    val b = Multimodal.decode(media).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(f => f.width == 100 + f.doc_id && f.height == 50 + f.doc_id),
      "header-parsed dims must match the encoded dims exactly")
    assert(a.forall(f => f.mime ==
      (if (f.doc_id % 2 == 0) "image/png" else "image/jpeg")))
    assert(a.forall(f => f.entropy > 0.0 && f.entropy <= 8.0 && f.n_bytes > 0))
    // non-image payloads keep their mime and report unknown dims
    val raw = Multimodal.decode(Multimodal.asMedia(docs)).collect()
    assert(raw.forall(f => f.width == -1 && f.height == -1 &&
      f.mime == "application/octet-stream"))
    // GIF and BMP headers sniff too
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, 0x2c, 0x01) ++ new Array[Byte](10) // 320 x 300 LE
    assert(Multimodal.sniffDims(gif, "x") == ("image/gif", 320, 300))
    val bmp = new Array[Byte](30)
    bmp(0) = 'B'; bmp(1) = 'M'; bmp(18) = 64; bmp(22) = 32
    assert(Multimodal.sniffDims(bmp, "x") == ("image/bmp", 64, 32))
  }

  test("approx_count_distinct is within its error bound of exact") {
    val r = SparkEntry.queries("q25b_approx_distinct")(spark, TestSpark.sfDir).head()
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("top-k heap aggregate matches the window formulation") {
    import graft.functions.TopKAgg
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
    val viaAgg = orders.groupBy("o_custkey")
      .agg(TopKAgg.top_k(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_custkey"), explode(col("top")).as("t"))
      .select(col("o_custkey"), col("t.payload").as("o_orderkey"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("o_custkey", "o_orderkey")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("kernels are callable from SQL via injected functions") {
    Tables.register(spark, TestSpark.sfDir)
    val c = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM embeddings WHERE vec_id = 0")
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
    val d = spark.sql(
      "SELECT graft_long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L))").head().getLong(0)
    assert(d == 32L)
    // the full kernel surface has SQL names
    val sh = spark.sql(
      "SELECT graft_bigram_shingles('a b c').n_bigrams").head().getInt(0)
    assert(sh == 2)
    val hits = spark.sql(
      "SELECT graft_stopword_hits(array('the', 'cat'), array(array('the'), array('dog')))")
      .head().getSeq[Int](0)
    assert(hits == Seq(1, 0))
    // PQ pair: encode a 4-dim vector into 2 subspaces x 256 codes, score it
    val enc = spark.sql(
      """SELECT graft_pq_adc(
           graft_pq_encode(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT),
                                 CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)),
                           cb.books),
           lut.t) AS s
         FROM (SELECT transform(sequence(0, 511),
                 i -> array(CAST(IF(i % 256 = 0, 1.0, 0.0) AS DOUBLE),
                            CAST(IF(i % 256 = 0, 0.0, 1.0) AS DOUBLE))) AS books) cb,
              (SELECT transform(sequence(0, 1023), i -> CAST(1.0 AS DOUBLE)) AS t) lut""")
      .head().getDouble(0)
    assert(enc > 0.0)
  }

  test("unpivot produces one row per (priority, status)") {
    val n = SparkEntry.queries("q32_unpivot")(spark, TestSpark.sfDir).count()
    assert(n == 15) // 5 priorities x 3 statuses
  }
}
