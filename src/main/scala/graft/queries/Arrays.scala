package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** List/array/struct/HOF surface (SURVEY §2.2 "list/array", "map/struct"):
  * element access (1-based on both engines), slicing, sort/distinct,
  * transform/filter lambdas, posexplode/unnest with ordinality.
  */
object Arrays {

  val defs: Seq[QDef] = Seq(

    // --- core array ops over the embedding column -------------------------
    QDef("q30_array_ops", (s, dir) => {
      val t = Tables.register(s, dir)
      t("embeddings").filter(col("vec_id") < 50)
        .select(col("vec_id"),
                size(col("embedding")).cast(IntegerType).as("dim"),
                element_at(col("embedding"), 1).as("first_val"),
                element_at(col("embedding"), -1).as("last_val"),
                slice(col("embedding"), 1, 3).as("head3"),
                sort_array(slice(col("embedding"), 1, 5)).as("sorted5"),
                reverse(slice(col("embedding"), 1, 3)).as("rev3"),
                array_max(col("embedding")).as("max_val"),
                array_min(col("embedding")).as("min_val"),
                size(array_distinct(col("embedding"))).cast(IntegerType).as("n_distinct"))
        .orderBy("vec_id")
    }, Some("""
      SELECT vec_id,
             CAST(LEN(embedding) AS INT) AS dim,
             embedding[1] AS first_val,
             embedding[-1] AS last_val,
             embedding[1:3] AS head3,
             LIST_SORT(embedding[1:5]) AS sorted5,
             LIST_REVERSE(embedding[1:3]) AS rev3,
             LIST_AGGREGATE(embedding, 'max') AS max_val,
             LIST_AGGREGATE(embedding, 'min') AS min_val,
             CAST(LEN(LIST_DISTINCT(embedding)) AS INT) AS n_distinct
      FROM embeddings WHERE vec_id < 50
      ORDER BY vec_id""")),

    // --- lambda HOFs: transform / filter ----------------------------------
    QDef("q30b_array_hof", (s, dir) => {
      val t = Tables.register(s, dir)
      t("embeddings").filter(col("vec_id") < 50)
        .select(col("vec_id"),
                transform(slice(col("embedding"), 1, 8),
                          x => round(x.cast(DoubleType) * 2.0, 6)).as("doubled8"),
                size(filter(col("embedding"), x => x > 0.0f)).cast(IntegerType).as("n_pos"),
                size(filter(col("embedding"), x => x < 0.0f)).cast(IntegerType).as("n_neg"))
        .orderBy("vec_id")
    }, Some("""
      SELECT vec_id,
             LIST_TRANSFORM(embedding[1:8], x -> ROUND(CAST(x AS DOUBLE) * 2.0, 6)) AS doubled8,
             CAST(LEN(LIST_FILTER(embedding, x -> x > 0.0)) AS INT) AS n_pos,
             CAST(LEN(LIST_FILTER(embedding, x -> x < 0.0)) AS INT) AS n_neg
      FROM embeddings WHERE vec_id < 50
      ORDER BY vec_id""")),

    // --- posexplode / unnest WITH ORDINALITY ------------------------------
    QDef("q31_posexplode", (s, dir) => {
      val t = Tables.register(s, dir)
      t("embeddings").filter(col("vec_id") < 5)
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 8)))
        .select(col("vec_id"), (col("pos") + 1).cast(IntegerType).as("idx"), col("col").as("val"))
        .orderBy("vec_id", "idx")
    }, Some("""
      SELECT vec_id, CAST(i AS INT) AS idx, embedding[CAST(i AS INT)] AS val
      FROM embeddings, generate_series(1, 8) t(i)
      WHERE vec_id < 5
      ORDER BY vec_id, idx""")),

    // --- sequence / range generation --------------------------------------
    QDef("q31b_sequence", (s, dir) => {
      val t = Tables.register(s, dir)
      t("region")
        .select(col("r_regionkey"), explode(sequence(lit(0), col("r_regionkey"))).as("n"))
        .orderBy("r_regionkey", "n")
    }, Some("""
      SELECT r_regionkey, CAST(n AS INT) AS n
      FROM (SELECT r_regionkey, unnest(generate_series(0, r_regionkey)) AS n FROM region)
      ORDER BY r_regionkey, n""")),

    // --- struct construction + field access -------------------------------
    QDef("q45_struct", (s, dir) => {
      val t = Tables.register(s, dir)
      t("region")
        .withColumn("info", struct(col("r_regionkey").as("key"), col("r_name").as("name")))
        .select(col("r_regionkey"), col("info"), col("info.name").as("extracted"))
        .orderBy("r_regionkey")
    }, Some("""
      SELECT r_regionkey,
             {'key': r_regionkey, 'name': r_name} AS info,
             r_name AS extracted
      FROM region
      ORDER BY r_regionkey"""))
  )
}
