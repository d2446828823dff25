package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] Vector similarity search over `embeddings` (SURVEY §2.5).
  *
  * Oracle-checked variants compute dot products through exact DECIMAL
  * accumulation (explode dims → join → decimal sum) so both engines get
  * bit-identical cosines; the production kernels in
  * [[graft.operators.Similarity]] use codegen'd HOF folds (benched, not
  * oracled, since double fold order is engine-specific).
  */
object VectorOps {

  /** Per-(vec, dim) table with values cast float→double→DECIMAL(18,9)
    * (exact on both engines; decimal sums are order-independent). */
  private def dims(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.register(s, dir)
    t("embeddings")
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .select(col("vec_id"), col("label"), (col("pos") + 1).as("i"),
              col("col").cast(DoubleType).cast(DecimalType(18, 9)).as("v"))
      .cache() // feeds query-vector, corpus and norm branches of one plan
  }

  private val oDims =
    """SELECT vec_id, label, CAST(i AS INT) AS i,
              CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,9)) AS v
       FROM (SELECT vec_id, label, embedding,
                    unnest(generate_series(1, len(embedding))) AS i
             FROM embeddings)"""

  val defs: Seq[QDef] = Seq(

    // --- exact cosine top-k against a query vector (vec_id = 0) ----------
    QDef("e01_cosine_topk", (s, dir) => {
      val d = dims(s, dir)
      val q = d.filter(col("vec_id") === 0).select(col("i").as("qi"), col("v").as("qv"))
      val x = d.filter(col("vec_id") > 0)
      val dots = x.join(q, col("i") === col("qi"))
        .groupBy("vec_id").agg(sum(col("v") * col("qv")).as("dot"))
      val norms = d.groupBy(col("vec_id").as("nid")).agg(sum(col("v") * col("v")).as("nrm"))
      val qn = norms.filter(col("nid") === 0).select(col("nrm").as("qnrm"))
      dots.join(norms, col("vec_id") === col("nid"))
        .crossJoin(qn)
        .select(col("vec_id"),
                round(col("dot").cast(DoubleType) /
                 (sqrt(col("nrm").cast(DoubleType)) * sqrt(col("qnrm").cast(DoubleType))), 9)
                  .as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    }, Some(s"""
      WITH d AS ($oDims),
      q AS (SELECT i AS qi, v AS qv FROM d WHERE vec_id = 0),
      dots AS (SELECT vec_id, SUM(v * qv) AS dot
               FROM d JOIN q ON i = qi WHERE vec_id > 0 GROUP BY vec_id),
      norms AS (SELECT vec_id AS nid, SUM(v * v) AS nrm FROM d GROUP BY vec_id),
      qn AS (SELECT nrm AS qnrm FROM norms WHERE nid = 0)
      SELECT vec_id,
             ROUND(CAST(dot AS DOUBLE) / (SQRT(CAST(nrm AS DOUBLE)) * SQRT(CAST(qnrm AS DOUBLE))), 9) AS cos
      FROM dots JOIN norms ON vec_id = nid CROSS JOIN qn
      ORDER BY cos DESC, vec_id LIMIT 10""")),

    // --- exact L2 nearest neighbours --------------------------------------
    QDef("e04_l2_nearest", (s, dir) => {
      val d = dims(s, dir)
      val q = d.filter(col("vec_id") === 0).select(col("i").as("qi"), col("v").as("qv"))
      d.filter(col("vec_id") > 0)
        .join(q, col("i") === col("qi"))
        .groupBy("vec_id")
        .agg(sum((col("v") - col("qv")) * (col("v") - col("qv"))).as("d2"))
        .select(col("vec_id"), round(sqrt(col("d2").cast(DoubleType)), 9).as("l2_dist"))
        .orderBy(col("l2_dist"), col("vec_id"))
        .limit(10)
    }, Some(s"""
      WITH d AS ($oDims),
      q AS (SELECT i AS qi, v AS qv FROM d WHERE vec_id = 0)
      SELECT vec_id, ROUND(SQRT(CAST(SUM((v - qv) * (v - qv)) AS DOUBLE)), 9) AS l2_dist
      FROM d JOIN q ON i = qi WHERE vec_id > 0
      GROUP BY vec_id
      ORDER BY l2_dist, vec_id LIMIT 10""")),

    // --- embedding near-dup pairs (cosine >= τ, blocked by label) ---------
    QDef("e02_embedding_neardup", (s, dir) => {
      val d = dims(s, dir)
      val norms = d.groupBy(col("vec_id")).agg(sum(col("v") * col("v")).as("nrm"))
      val a = d.select(col("vec_id").as("vec_a"), col("label").as("lbl"), col("i").as("ia"), col("v").as("va"))
      val b = d.select(col("vec_id").as("vec_b"), col("label").as("lbl_b"), col("i").as("ib"), col("v").as("vb"))
      val dots = a.join(b, col("lbl") === col("lbl_b") && col("ia") === col("ib") &&
                           col("vec_a") < col("vec_b"))
        .groupBy("vec_a", "vec_b").agg(sum(col("va") * col("vb")).as("dot"))
      val na = norms.select(col("vec_id").as("vec_a"), col("nrm").as("nrm_a"))
      val nb = norms.select(col("vec_id").as("vec_b"), col("nrm").as("nrm_b"))
      dots.join(na, "vec_a").join(nb, "vec_b")
        .select(col("vec_a"), col("vec_b"),
                round(col("dot").cast(DoubleType) /
                 (sqrt(col("nrm_a").cast(DoubleType)) * sqrt(col("nrm_b").cast(DoubleType))), 9)
                  .as("cos"))
        .filter(col("cos") >= 0.3)
        .orderBy("vec_a", "vec_b")
    }, Some(s"""
      WITH d AS ($oDims),
      norms AS (SELECT vec_id, SUM(v * v) AS nrm FROM d GROUP BY vec_id),
      dots AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.v * b.v) AS dot
        FROM d a JOIN d b ON a.label = b.label AND a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY 1, 2)
      SELECT vec_a, vec_b, cos FROM (
        SELECT vec_a, vec_b,
               ROUND(CAST(dot AS DOUBLE) / (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE))), 9) AS cos
        FROM dots JOIN norms na ON vec_a = na.vec_id
                  JOIN norms nb ON vec_b = nb.vec_id)
      WHERE cos >= 0.3
      ORDER BY vec_a, vec_b""")),

    // --- production kernels: brute-force + ANN (Spark-only, benched) ------
    QDef("e03_cosine_topk_kernel", (s, dir) => {
      val t = Tables.register(s, dir)
      val query = t("embeddings").filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      Similarity.cosineTopK(t("embeddings").filter(col("vec_id") > 0),
                            "vec_id", "embedding", query, 10)
    }, None),

    QDef("e05_ann_lsh_topk", (s, dir) => {
      val t = Tables.register(s, dir)
      val query = t("embeddings").filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      Similarity.annCosineTopK(t("embeddings").filter(col("vec_id") > 0),
                               "vec_id", "embedding", query, 10)
    }, None)
  )
}
