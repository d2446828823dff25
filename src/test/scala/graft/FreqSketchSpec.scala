package graft

import graft.functions.SketchAggs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries heavy-hitters aggregate: the mergeable guarantee (every
  * token above n/(cap+1) survives partial merges) and exactness of the
  * recount pipeline vs a naive full census. */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish corpus: token i appears ~N/i times, scattered over
    * partitions so map-side partials and merges are both exercised. */
  private def corpus(n: Int) = {
    val toks = (1 to n).flatMap(i => Seq.fill(2000 / i)(s"t$i"))
    scala.util.Random.shuffle(toks).toDF("tok").repartition(7)
  }

  test("every token above n/(cap+1) is present in the merged summary") {
    val df = corpus(400)
    val cap = 64
    val row = df.agg(SketchAggs.freqSketch($"tok", cap).as("mg"),
      count(lit(1)).as("n")).collect().head
    val n = row.getLong(1)
    val present = row.getSeq[org.apache.spark.sql.Row](0)
      .map(_.getString(0)).toSet
    val exact = df.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val threshold = n.toDouble / (cap + 1)
    val mustHave = exact.filter(_._2 > threshold).keySet
    assert(mustHave.subsetOf(present),
      s"missing guaranteed heavy hitters: ${(mustHave -- present).take(5)}")
  }

  test("estimates never exceed true counts and undercount by <= n/(cap+1)") {
    val df = corpus(300)
    val cap = 128
    val row = df.agg(SketchAggs.freqSketch($"tok", cap).as("mg"),
      count(lit(1)).as("n")).collect().head
    val n = row.getLong(1)
    val est = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (t, e) =>
      assert(e <= exact(t), s"$t overestimated: $e > ${exact(t)}")
      assert(exact(t) - e <= n / (cap + 1) + 1,
        s"$t undercounted past the bound: ${exact(t) - e}")
    }
  }

  test("summary + exact recount reproduces the naive top-k exactly") {
    val df = corpus(500)
    val cap = 256
    val summary = df.agg(SketchAggs.freqSketch($"tok", cap).as("mg"))
      .select(explode($"mg").as("e")).select($"e.token".as("tok"))
    val viaSketch = df.join(broadcast(summary), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok").limit(15)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val naive = df.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok").limit(15)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSketch == naive)
  }
}
