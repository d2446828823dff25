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

  test("multimodal decode is deterministic and batch-shaped") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").limit(50)
    val a = Multimodal.decodeStub(Multimodal.asMedia(docs)).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeStub(Multimodal.asMedia(docs)).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(f => f.width >= 16 && f.height >= 16 && f.n_bytes > 0))
    assert(a.forall(f => f.entropy > 0.0 && f.entropy <= 8.0))
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
  }

  test("unpivot produces one row per (priority, status)") {
    val n = SparkEntry.queries("q32_unpivot")(spark, TestSpark.sfDir).count()
    assert(n == 15) // 5 priorities x 3 statuses
  }
}
