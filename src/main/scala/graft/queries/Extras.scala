package graft.queries

import graft.Tables
import graft.functions.ProductAgg
import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._

/** Remaining §2.2 surface: UNPIVOT, LATERAL joins, map type, date
  * parse/format shims, product UDAF, approx-distinct twin, multimodal
  * decode pipeline.
  */
object Extras {

  val defs: Seq[QDef] = Seq(

    // --- UNPIVOT (wide -> long); oracle via portable UNION ALL ------------
    QDef("q32_unpivot", (s, dir) => {
      val t = Tables.register(s, dir)
      val wide = t("orders").groupBy("o_orderpriority")
        .agg(count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
             count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
             count(when(col("o_orderstatus") === "P", 1)).as("n_p"))
      wide.unpivot(Array(col("o_orderpriority")),
                   Array(col("n_f"), col("n_o"), col("n_p")), "status", "n")
        .orderBy("o_orderpriority", "status")
    }, Some("""
      WITH wide AS (
        SELECT o_orderpriority,
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
               COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders GROUP BY o_orderpriority)
      SELECT o_orderpriority, 'n_f' AS status, n_f AS n FROM wide
      UNION ALL SELECT o_orderpriority, 'n_o', n_o FROM wide
      UNION ALL SELECT o_orderpriority, 'n_p', n_p FROM wide
      ORDER BY o_orderpriority, status""")),

    // --- LATERAL join (correlated derived table) ---------------------------
    QDef("q49_lateral", (s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT r.r_name, t.n_name
        FROM region r,
        LATERAL (SELECT n_name FROM nation
                 WHERE n_regionkey = r.r_regionkey
                 ORDER BY n_nationkey LIMIT 2) t
        ORDER BY r_name, n_name""")
    }, Some("""
      SELECT r.r_name, t.n_name
      FROM region r,
      LATERAL (SELECT n_name FROM nation
               WHERE n_regionkey = r.r_regionkey
               ORDER BY n_nationkey LIMIT 2) t
      ORDER BY r_name, n_name""")),

    // --- map construction + access ----------------------------------------
    QDef("q45b_map", (s, dir) => {
      val t = Tables.register(s, dir)
      t("region")
        .select(col("r_regionkey"),
                map(lit("key"), col("r_regionkey").cast(LongType),
                    lit("len"), length(col("r_name")).cast(LongType)).as("m"))
        .select(col("r_regionkey"),
                element_at(col("m"), "key").as("from_map"),
                size(col("m")).cast(IntegerType).as("m_size"))
        .orderBy("r_regionkey")
    }, Some("""
      SELECT r_regionkey,
             CAST(list_extract(map_values(m), 1) AS BIGINT) AS from_map,
             CAST(cardinality(m) AS INT) AS m_size
      FROM (SELECT r_regionkey,
                   MAP(['key','len'], [r_regionkey, LENGTH(r_name)]) AS m
            FROM region)
      ORDER BY r_regionkey""")),

    // --- strptime/strftime + epoch shims ------------------------------------
    QDef("q50_date_parse", (s, dir) => {
      val t = Tables.register(s, dir)
      t("orders").filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
                date_format(col("o_orderdate"), "yyyy/MM/dd").as("formatted"),
                to_timestamp(date_format(col("o_orderdate"), "yyyy/MM/dd"), "yyyy/MM/dd")
                  .cast(DateType).as("reparsed"),
                unix_micros(to_utc_timestamp(col("o_orderdate"), "UTC")).as("epoch_micros"),
                make_date(year(col("o_orderdate")), month(col("o_orderdate")),
                          dayofmonth(col("o_orderdate"))).as("remade"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             STRFTIME(o_orderdate, '%Y/%m/%d') AS formatted,
             CAST(STRPTIME(STRFTIME(o_orderdate, '%Y/%m/%d'), '%Y/%m/%d') AS DATE) AS reparsed,
             epoch_us(o_orderdate) AS epoch_micros,
             MAKE_DATE(CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT),
                       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT),
                       CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT)) AS remade
      FROM orders WHERE o_orderkey < 200
      ORDER BY o_orderkey""")),

    // --- product aggregate (typed UDAF) -------------------------------------
    QDef("q51_product_agg", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem").filter(col("l_orderkey") < 2000)
        .groupBy("l_orderkey")
        .agg(ProductAgg.product_long(col("l_linenumber").cast(LongType)).as("line_product"),
             count(lit(1)).as("n"))
        .orderBy("l_orderkey")
    }, Some("""
      SELECT l_orderkey,
             CAST(ROUND(PRODUCT(CAST(l_linenumber AS DOUBLE))) AS BIGINT) AS line_product,
             COUNT(*) AS n
      FROM lineitem WHERE l_orderkey < 2000
      GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // --- approx_count_distinct (HLL twin of q25; sketches differ across
    //     engines so this is rows-only, bounded-error asserted in tests) ---
    QDef("q25b_approx_distinct", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
             countDistinct(col("l_partkey")).as("exact_parts"))
    }, None),

    // --- multimodal decode pipeline (mapPartitions batch operator) ---------
    // Deterministic synthetic media: even doc_ids wrap their text bytes in
    // a PNG container, odd ones in a JPEG; decode() recovers mime and dims
    // FROM THE HEADER BYTES (IHDR / SOF0 scan), not from metadata. Byte
    // stats cover header+body, so this stays rows-only; dims correctness
    // is pinned exactly by ExtrasSpec.
    QDef("m02_multimodal_decode", (s, dir) => {
      import s.implicits._
      val t = Tables.register(s, dir)
      val media = t("documents").select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val mime = if (id % 2 == 0) "image/png" else "image/jpeg"
          Multimodal.MediaRow(id,
            Multimodal.syntheticImage(mime, (16 + id % 1905).toInt,
              (16 + (id * 7) % 1065).toInt, text.getBytes("UTF-8")), mime)
        }
      Multimodal.decode(media).toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"),
                col("width"), col("height"),
                round(col("mean_byte"), 6).as("mean_byte"),
                round(col("entropy"), 6).as("entropy"))
        .orderBy("doc_id")
    }, None)
  )
}
