package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Fts, Hybrid}

/** Hybrid search fusion (operators/Hybrid.scala — the lancedb
  * RRF / linear-combination reranker surface). The h01/h02 oracles pin
  * exact fused values against DuckDB; these tests pin the fusion
  * ALGEBRA: rank handling of one-leg-only ids, weight degeneracy, and
  * the fuzzy expansion contract.
  */
class HybridSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def leg(rows: (Long, Double)*) =
    rows.toSeq.toDF("id", "score")

  test("rrf: a doc top-ranked in both legs beats any one-leg doc") {
    val text = leg(1L -> 5.0, 2L -> 4.0, 3L -> 3.0)
    val vec  = leg(1L -> 0.9, 4L -> 0.8, 5L -> 0.7)
    val out = Hybrid.rrfFuse(text, vec, "id", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.head._1 == 1L)
    // doc 1: 1/(60+1) + 1/(60+1); one-leg max possible: 1/(60+1)
    assert(out.head._2 > out.tail.map(_._2).max)
    // every candidate from either leg appears
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("rrf: one-leg ids score exactly the single reciprocal") {
    val text = leg(1L -> 5.0)
    val vec  = leg(2L -> 0.9)
    val out = Hybrid.rrfFuse(text, vec, "id", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val expect = math.floor(1e8 / 61.0 + 0.5) / 1e8
    assert(out(1L) == expect && out(2L) == expect)
  }

  test("linear: weight 1.0 on the vector leg reproduces the vector order") {
    val text = leg(1L -> 9.0, 2L -> 1.0, 3L -> 5.0)
    val vec  = leg(1L -> 0.1, 2L -> 0.9, 3L -> 0.5)
    val out = Hybrid.linearFuse(text, vec, "id", k = 3, wVec = 1.0, wText = 0.0)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 3L, 1L))
  }

  test("linear: fused scores live in [0, 1] and a constant leg normalizes to 1") {
    val text = leg(1L -> 7.0, 2L -> 7.0) // max == min -> both normalize to 1
    val vec  = leg(1L -> 0.2, 2L -> 0.8)
    val out = Hybrid.linearFuse(text, vec, "id", k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out.values.forall(v => v >= 0.0 && v <= 1.0))
    // doc 2: 0.7*1 + 0.3*1 = 1.0 ; doc 1: 0.7*0 + 0.3*1 = 0.3
    assert(out(2L) == 1.0 && out(1L) == 0.3)
  }

  test("fuzzy expansion: a misspelling reaches the exact term's ranking") {
    val tiny = Seq(
      (1L, "merge merge window"),
      (2L, "merge batch batch"),
      (3L, "window window window"),
      (4L, "scan filter scan")).toDF("doc_id", "text")
    val p = java.nio.file.Files.createTempDirectory("fuzzy_spec").toString
    Fts.buildIndex(tiny, "doc_id", "text", s"$p/ix")
    // "merg" is distance 1 from "merge" and >1 from every other vocab term
    val fuzzy = Fts.searchFuzzy(spark, s"$p/ix", Seq("merg"), maxDist = 1, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Fts.searchPersisted(spark, s"$p/ix", Seq("merge"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fuzzy == exact)
    assert(fuzzy.map(_._1).toSet == Set(1L, 2L))
  }

  test("fuzzy expansion: distance 0 matches only the exact vocab term") {
    val tiny = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val p = java.nio.file.Files.createTempDirectory("fuzzy0_spec").toString
    Fts.buildIndex(tiny, "doc_id", "text", s"$p/ix")
    val hit = Fts.searchFuzzy(spark, s"$p/ix", Seq("beta"), maxDist = 0, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(hit == Set(1L, 2L))
    val miss = Fts.searchFuzzy(spark, s"$p/ix", Seq("betaz"), maxDist = 0, k = 10)
      .collect()
    assert(miss.isEmpty)
  }
}
