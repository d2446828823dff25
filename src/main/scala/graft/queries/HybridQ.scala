package graft.queries

import graft.Tables
import graft.functions.ArrayKernels.longDot
import graft.operators.{Fts, Hybrid}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hybrid search queries (lancedb hybrid-search parity): BM25 text leg and
  * exact-cosine vector leg over the SAME corpus (`documents ⋈ embeddings`
  * on id), fused by [[graft.operators.Hybrid]]. Both fusions are
  * hash-oracled end-to-end — each leg's ranking is exactly SQL-expressible
  * (the f01/e01 fixed-point contracts), and the fusion arithmetic is
  * fixed-point over integer ranks, so DuckDB recomputes the identical
  * fused ordering from the raw tables.
  */
object HybridQ {

  private val TERMS = Seq("merge", "vector", "stream")
  private val N = 50 // per-leg candidate depth fed into the fusion

  /** Hybrid corpus: docs that carry an embedding (id > 0; vec 0 is the
    * query vector). At 100 TB both legs are index probes (FTS postings /
    * IVF lists) returning N rows each — this join shapes the TEST corpus;
    * production legs rank independently and only the N-row results meet.
    */
  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.register(s, dir)
    t("documents").join(t("embeddings"),
        col("doc_id") === col("vec_id"))
      .filter(col("doc_id") > 0)
      .select(col("doc_id"), col("text"), col("embedding"))
  }

  /** Text leg: index-free BM25 over the hybrid corpus, top N. */
  private def textLeg(s: SparkSession, dir: String): DataFrame =
    Fts.bm25(corpus(s, dir).select("doc_id", "text"), "doc_id", "text",
             TERMS, N)

  /** Vector leg: e01's quantized exact cosine vs vec 0, top N, renamed to
    * the fusion contract `(doc_id, score)`. */
  private def vecLeg(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.register(s, dir)
    def qv(c: org.apache.spark.sql.Column) =
      transform(c, x => round(x.cast(DoubleType) * 10000000.0).cast(LongType))
    val q = t("embeddings").filter(col("vec_id") === 0)
      .select(qv(col("embedding")).as("qvv"))
    corpus(s, dir)
      .select(col("doc_id"), qv(col("embedding")).as("v"))
      .crossJoin(broadcast(q))
      .select(col("doc_id"),
              round(longDot(col("v"), col("qvv")).cast(DoubleType) /
                (sqrt(longDot(col("v"), col("v")).cast(DoubleType)) *
                 sqrt(longDot(col("qvv"), col("qvv")).cast(DoubleType))), 9)
                .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(N)
  }

  /** Oracle CTEs shared by both fusions: `tl(doc_id, score, trank)` and
    * `vl(doc_id, score, vrank)` — the f01 BM25 spelling and the e01 cosine
    * spelling, each restricted to the hybrid corpus and rank-numbered.
    */
  private val legCtes: String = {
    val inList = TERMS.map(t => s"'$t'").mkString(", ")
    s"""
      hyb AS (SELECT d.doc_id, d.text FROM documents d
              JOIN embeddings e ON e.vec_id = d.doc_id WHERE d.doc_id > 0),
      dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM hyb),
      toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM hyb),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      dfv AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_len
             FROM hyb),
      scored AS (
        SELECT tf.doc_id,
               CAST(FLOOR(
                 ROUND(LN(1.0 + (CAST(st.n_docs AS DOUBLE) - dfv.df + 0.5) / (dfv.df + 0.5)), 8)
                 * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                     / (CAST(st.total_len AS DOUBLE) / st.n_docs))))
                 * 1e6 + 0.5) AS BIGINT) AS micro
        FROM tf JOIN dfv USING (term) JOIN dl USING (doc_id) CROSS JOIN st
        WHERE tf.term IN ($inList)),
      tl AS (SELECT doc_id, score,
                    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS trank
             FROM (SELECT doc_id, ROUND(SUM(micro) / 1e6, 6) AS score
                   FROM scored GROUP BY doc_id
                   ORDER BY score DESC, doc_id LIMIT $N)),
      dim AS (SELECT vec_id, CAST(i AS INT) AS i,
                     CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 10000000.0) AS BIGINT) AS v
              FROM (SELECT vec_id, embedding,
                           unnest(generate_series(1, len(embedding))) AS i
                    FROM embeddings)),
      qd AS (SELECT i AS qi, v AS qv FROM dim WHERE vec_id = 0),
      qn AS (SELECT CAST(SUM(qv * qv) AS BIGINT) AS qnrm FROM qd),
      dots AS (SELECT vec_id AS doc_id, CAST(SUM(v * qv) AS BIGINT) AS dot,
                      CAST(SUM(v * v) AS BIGINT) AS nrm
               FROM dim JOIN qd ON i = qi
               WHERE vec_id IN (SELECT doc_id FROM hyb) GROUP BY vec_id),
      vl AS (SELECT doc_id, score,
                    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS vrank
             FROM (SELECT doc_id,
                          ROUND(CAST(dot AS DOUBLE) / (SQRT(CAST(nrm AS DOUBLE)) * SQRT(CAST(qnrm AS DOUBLE))), 9) AS score
                   FROM dots CROSS JOIN qn
                   ORDER BY score DESC, doc_id LIMIT $N))"""
  }

  val defs: Seq[QDef] = Seq(

    // --- reciprocal-rank fusion (lancedb RRFReranker, kRrf = 60) ---------
    QDef("h01_hybrid_rrf", (s, dir) =>
      Hybrid.rrfFuse(textLeg(s, dir), vecLeg(s, dir), "doc_id", k = 15),
      Some(s"""
      WITH $legCtes
      SELECT doc_id,
             ROUND((COALESCE(CAST(FLOOR(1e8 / (60.0 + CAST(trank AS DOUBLE)) + 0.5) AS BIGINT), 0)
                  + COALESCE(CAST(FLOOR(1e8 / (60.0 + CAST(vrank AS DOUBLE)) + 0.5) AS BIGINT), 0)) / 1e8, 8) AS rrf
      FROM tl FULL OUTER JOIN vl USING (doc_id)
      ORDER BY rrf DESC, doc_id LIMIT 15""")),

    // --- linear combination (lancedb LinearCombinationReranker, 0.7/0.3) -
    QDef("h02_hybrid_linear", (s, dir) =>
      Hybrid.linearFuse(textLeg(s, dir), vecLeg(s, dir), "doc_id", k = 15),
      Some(s"""
      WITH $legCtes,
      tn AS (SELECT doc_id,
                    CASE WHEN MAX(score) OVER () = MIN(score) OVER () THEN 1.0
                         ELSE (score - MIN(score) OVER ()) / (MAX(score) OVER () - MIN(score) OVER ()) END AS nt
             FROM tl),
      vn AS (SELECT doc_id,
                    CASE WHEN MAX(score) OVER () = MIN(score) OVER () THEN 1.0
                         ELSE (score - MIN(score) OVER ()) / (MAX(score) OVER () - MIN(score) OVER ()) END AS nv
             FROM vl)
      SELECT doc_id,
             ROUND(FLOOR((0.7 * COALESCE(nv, 0.0) + 0.3 * COALESCE(nt, 0.0)) * 1e6 + 0.5) / 1e6, 6) AS fused
      FROM tn FULL OUTER JOIN vn USING (doc_id)
      ORDER BY fused DESC, doc_id LIMIT 15"""))
  )
}
