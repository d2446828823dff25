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
    // Array-typed outputs are stringified (scaled-long elements, ','-joined):
    // the driver's pandas-based checker cannot sort array cells.
    QDef("q30_array_ops", (s, dir) => {
      val t = Tables.register(s, dir)
      def q7s(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        array_join(transform(c,
          x => round(x.cast(DoubleType) * 10000000.0).cast(LongType).cast(StringType)), ",")
      t("embeddings").filter(col("vec_id") < 50)
        .select(col("vec_id"),
                size(col("embedding")).cast(IntegerType).as("dim"),
                element_at(col("embedding"), 1).as("first_val"),
                element_at(col("embedding"), -1).as("last_val"),
                q7s(slice(col("embedding"), 1, 3)).as("head3"),
                q7s(sort_array(slice(col("embedding"), 1, 5))).as("sorted5"),
                q7s(reverse(slice(col("embedding"), 1, 3))).as("rev3"),
                array_max(col("embedding")).as("max_val"),
                array_min(col("embedding")).as("min_val"),
                size(array_distinct(col("embedding"))).cast(IntegerType).as("n_distinct"))
        .orderBy("vec_id")
    }, Some("""
      SELECT vec_id,
             CAST(LEN(embedding) AS INT) AS dim,
             embedding[1] AS first_val,
             embedding[-1] AS last_val,
             ARRAY_TO_STRING(LIST_TRANSFORM(embedding[1:3],
               x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT) AS VARCHAR)), ',') AS head3,
             ARRAY_TO_STRING(LIST_TRANSFORM(LIST_SORT(embedding[1:5]),
               x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT) AS VARCHAR)), ',') AS sorted5,
             ARRAY_TO_STRING(LIST_TRANSFORM(LIST_REVERSE(embedding[1:3]),
               x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT) AS VARCHAR)), ',') AS rev3,
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
                array_join(transform(slice(col("embedding"), 1, 8),
                  x => round(x.cast(DoubleType) * 20000000.0).cast(LongType).cast(StringType)),
                  ",").as("doubled8"),
                size(filter(col("embedding"), x => x > 0.0f)).cast(IntegerType).as("n_pos"),
                size(filter(col("embedding"), x => x < 0.0f)).cast(IntegerType).as("n_neg"))
        .orderBy("vec_id")
    }, Some("""
      SELECT vec_id,
             ARRAY_TO_STRING(LIST_TRANSFORM(embedding[1:8],
               x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 20000000.0) AS BIGINT) AS VARCHAR)), ',') AS doubled8,
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
        .select(col("r_regionkey"), to_json(col("info")).as("info"), col("info.name").as("extracted"))
        .orderBy("r_regionkey")
    }, Some("""
      SELECT r_regionkey,
             CAST(to_json({'key': r_regionkey, 'name': r_name}) AS VARCHAR) AS info,
             r_name AS extracted
      FROM region
      ORDER BY r_regionkey"""))
  )
}
