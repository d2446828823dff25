package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.DataFrame

/** Hybrid search — fuse a full-text (BM25) ranking with a vector-similarity
  * ranking over the same id space, the lancedb `table.search(...).rerank()`
  * surface (reference: lancedb hybrid search with the RRF and
  * linear-combination rerankers; the reference repo exposes lance FTS +
  * vector search side by side — fusion is the standard retrieval composition
  * over them).
  *
  * Spark-first shape: each leg is an already-ranked DataFrame of
  * `(id, score)` — typically [[Fts.bm25]]/[[Fts.searchPersisted]] for the
  * text leg and an exact/IVF cosine top-N for the vector leg. Fusion ranks
  * each leg with a window `row_number`, full-outer-joins the two skinny
  * top-N frames on id, and combines. Both legs are LIMIT-N frames (N ≈ a few
  * hundred), so at 100 TB the fusion operates on 2·N rows regardless of
  * corpus size — the heavy lifting stays in the index probes; the join is a
  * broadcast-sized afterthought (Spark picks broadcast automatically for
  * these row counts under AQE).
  *
  * Determinism contract (oracle hash-matching): rank contributions are
  * fixed-point longs. RRF: `floor(1e8 / (kRrf + rank) + 0.5)` per leg —
  * IEEE division of identical inputs is bit-identical across engines.
  * Linear: min-max normalization `(s - min) / (max - min)` per leg in
  * doubles built from already-rounded leg scores, weighted with plain
  * decimal literals, floored to micro-units. Ties inside a leg break by id
  * ascending (the tantivy/lancedb convention of a total order).
  */
object Hybrid {

  /** Attach a dense 1-based rank to a `(id, score)` leg: score desc, id asc.
    * A single-partition window over a top-N frame — N is small by contract
    * (the leg is already LIMIT-cut), so the one-partition sort is O(N log N)
    * on one task, not a corpus sort.
    */
  def ranked(leg: DataFrame, idCol: String): DataFrame = {
    val w = Window.orderBy(col("score").desc, col(idCol).asc)
    leg.select(col(idCol), col("score"))
      .withColumn("rank", row_number().over(w).cast(LongType))
  }

  /** Reciprocal-rank fusion of two ranked legs (lancedb `RRFReranker`):
    * `rrf(id) = Σ_legs 1 / (kRrf + rank_leg(id))`, ids missing from a leg
    * contribute nothing. Returns `(idCol, rrf)` top `k` by fused score desc,
    * id asc; `rrf` is rounded to 8 digits from the micro-unit interior.
    */
  def rrfFuse(textLeg: DataFrame, vecLeg: DataFrame, idCol: String,
              k: Int, kRrf: Int = 60): DataFrame = {
    def contrib(rank: org.apache.spark.sql.Column) =
      floor(lit(1e8) / (lit(kRrf.toDouble) + rank.cast(DoubleType)) + lit(0.5))
        .cast(LongType)
    val a = ranked(textLeg, idCol).select(col(idCol), contrib(col("rank")).as("ma"))
    val b = ranked(vecLeg, idCol).select(col(idCol), contrib(col("rank")).as("mb"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
              round((coalesce(col("ma"), lit(0L)) + coalesce(col("mb"), lit(0L)))
                      / lit(1e8), 8).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** Linear-combination fusion (lancedb `LinearCombinationReranker`):
    * min-max normalize each leg's scores to [0,1] over its own candidate
    * set, then `w · norm_vec + (1 - w) · norm_text`; a missing leg
    * contributes 0, a constant leg (max = min) normalizes to 1. Returns
    * `(idCol, fused)` top `k`, `fused` in rounded micro-units.
    *
    * Both weights are passed explicitly (not `1 - w`): `1.0 - 0.7` computes
    * to `0.30000000000000004`, a DIFFERENT double from the parsed literal
    * `0.3` the oracle SQL uses — the exact 1-ulp trap the fixed-point
    * contract exists to avoid.
    */
  def linearFuse(textLeg: DataFrame, vecLeg: DataFrame, idCol: String,
                 k: Int, wVec: Double = 0.7, wText: Double = 0.3): DataFrame = {
    def norm(leg: DataFrame, out: String): DataFrame = {
      val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      leg.select(col(idCol), col("score").cast(DoubleType).as("s"))
        .withColumn("mn", min(col("s")).over(w))
        .withColumn("mx", max(col("s")).over(w))
        .select(col(idCol),
                when(col("mx") === col("mn"), lit(1.0))
                  .otherwise((col("s") - col("mn")) / (col("mx") - col("mn")))
                  .as(out))
    }
    val a = norm(textLeg, "nt")
    val b = norm(vecLeg, "nv")
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
              round(floor((lit(wVec) * coalesce(col("nv"), lit(0.0))
                           + lit(wText) * coalesce(col("nt"), lit(0.0)))
                            * lit(1e6) + lit(0.5)) / lit(1e6), 6).as("fused"))
      .orderBy(col("fused").desc, col(idCol))
      .limit(k)
  }
}
