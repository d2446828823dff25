package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._

/** Aggregation surface of the contract (SURVEY §2.2 "Aggregation"):
  * hash agg, HAVING, conditional agg / manual pivot, rollup/cube/grouping
  * sets, distinct aggs, min_by/max_by, string/array agg, stats aggs.
  *
  * Scale notes: every query here is a single shuffle-by-group-key hash
  * aggregate with map-side partial aggregation (Spark plans
  * HashAggregate(partial) -> Exchange -> HashAggregate(final)); group-key
  * cardinality is tiny relative to input so the shuffle is the reduced
  * side. Decimal-interior sums (see [[Det]]) keep results order- and
  * partition-count-independent, which is what makes them reproducible on
  * a 1000-executor cluster.
  */
object CoreAgg {

  /** (supplier, part) row counts + 1, cached per sf dir — parquet
    * metadata reads, but bench runs every query twice and the counts
    * drive q25's pair-code base, so one job per session suffices. */
  private[queries] val dimCounts =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]

  val defs: Seq[QDef] = Seq(

    // --- TPC-H Q1-style pricing summary -----------------------------------
    QDef("q01_pricing_summary", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem")
        .filter(col("l_shipdate") < lit("2001-01-01").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }, Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${oSum("l_quantity")} AS sum_qty,
             ${oSum("l_extendedprice")} AS sum_base_price,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
             ${oSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
             ${oAvg("l_quantity")} AS avg_qty,
             ${oAvg("l_extendedprice")} AS avg_price,
             ${oAvg("l_discount")} AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate < TIMESTAMP '2001-01-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    // --- TPC-H Q6-style selective scan + single-row agg -------------------
    QDef("q06_forecast_revenue", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
                col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
                col("l_discount").between(0.02, 0.06) &&
                col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
             count(lit(1)).as("n_rows"))
    }, Some(s"""
      SELECT ${oSum("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""")),

    // --- GROUP BY + HAVING ------------------------------------------------
    QDef("q07_group_having", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem")
        .groupBy("l_suppkey")
        .agg(dsum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n"))
        .filter(col("total_qty") > 1000.0)
        .orderBy("l_suppkey")
    }, Some(s"""
      SELECT l_suppkey, ${oSum("l_quantity")} AS total_qty, COUNT(*) AS n
      FROM lineitem GROUP BY l_suppkey
      HAVING ${oSum("l_quantity")} > 1000.0
      ORDER BY l_suppkey""")),

    // --- conditional aggregation / manual pivot ---------------------------
    QDef("q08_conditional_agg", (s, dir) => {
      val t = Tables.register(s, dir)
      t("orders")
        .groupBy("o_orderpriority")
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
          count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
          sum(when(col("o_totalprice") > 200000.0, 1L).otherwise(0L)).as("n_big"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }, Some("""
      SELECT o_orderpriority,
             COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
             COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
             COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
             CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // --- ROLLUP + GROUPING() ---------------------------------------------
    QDef("q21_rollup_grouping", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).cast(IntegerType).as("g_rf"),
             grouping(col("l_linestatus")).cast(IntegerType).as("g_ls"),
             dsum(col("l_quantity")).as("sum_qty"),
             count(lit(1)).as("n"))
        .orderBy(col("g_rf"), col("g_ls"),
                 col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }, Some(s"""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
             CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
             ${oSum("l_quantity")} AS sum_qty, COUNT(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // --- CUBE -------------------------------------------------------------
    QDef("q21b_cube", (s, dir) => {
      val t = Tables.register(s, dir)
      t("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // --- DISTINCT aggregates ---------------------------------------------
    QDef("q25_count_distinct", (s, dir) => {
      val t = Tables.register(s, dir)
      // exact multi-distinct via bitmap aggregation: suppkey and partkey
      // are int-bounded dimension ids (roaring32 buffers), and the
      // (supp, part) pair composes injectively into one code
      // (supp * base + part) — so all three distinct counts become
      // bitmap buffers in ONE partial aggregate. The map side ors ids
      // into per-returnflag bitmaps; the shuffle carries 3 groups x 32
      // partitions of compressed bitmaps (kilobytes) instead of ~600k
      // row triples, and no Expand ever runs. The pair base is DERIVED
      // from the dimension row counts (parquet metadata — no data scan,
      // cached per dir), not a fixture constant, so the code stays
      // injective at any scale factor: int codes + roaring32 while the
      // composed domain fits int32 (through ~sf1), long codes + a
      // roaring64 buffer beyond. For truly unbounded key domains the
      // two-level groupBy decomposition remains the fallback (see
      // BitmapDistinctAgg scaladoc).
      // bases come from the dimensions' MAX keys, not their row counts:
      // injectivity of supp * base + part needs base > max(partkey), and
      // sparse id spaces (offset-replicated scale-up data, tombstoned
      // dimension rows) break the dense count==max assumption — the sf1
      // gate caught exactly that as an ANSI int overflow
      val (supps, parts) = CoreAgg.dimCounts.computeIfAbsent(dir, _ =>
        (t("supplier").agg(max(col("s_suppkey"))).head().getLong(0) + 1,
         t("part").agg(max(col("p_partkey"))).head().getLong(0) + 1))
      val pairFitsInt = supps * parts <= Int.MaxValue.toLong
      val pair =
        if (pairFitsInt)
          graft.functions.SketchAggs.bitmapDistinct(
            (col("l_suppkey").cast(IntegerType) * lit(parts.toInt) +
             col("l_partkey").cast(IntegerType)))
        else
          graft.functions.SketchAggs.bitmapDistinct64(
            (col("l_suppkey").cast(LongType) * lit(parts) +
             col("l_partkey").cast(LongType)))
      t("lineitem")
        .groupBy("l_returnflag")
        .agg(graft.functions.SketchAggs
               .bitmapDistinct(col("l_suppkey").cast(IntegerType)).as("n_supp"),
             graft.functions.SketchAggs
               .bitmapDistinct(col("l_partkey").cast(IntegerType)).as("n_part"),
             pair.as("n_sp"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT l_partkey) AS n_part,
             COUNT(DISTINCT (l_suppkey, l_partkey)) AS n_sp,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // --- min_by / max_by (arg_min/arg_max), deterministic tie-break -------
    // Tie-break: l_extendedprice has 2-decimal granularity, so distinct rows
    // can collide; add l_orderkey * 1e-9 (< any price gap) to make the
    // ordering value unique while preserving the price order.
    QDef("q23_arg_minmax", (s, dir) => {
      val t = Tables.register(s, dir)
      val tie = col("l_extendedprice") + col("l_orderkey") * lit(1e-9)
      t("lineitem")
        .groupBy("l_returnflag")
        .agg(max_by(col("l_orderkey"), tie).as("top_order"),
             min_by(col("l_orderkey"), tie).as("bottom_order"),
             max(col("l_extendedprice")).as("max_price"),
             min(col("l_extendedprice")).as("min_price"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             MAX_BY(l_orderkey, l_extendedprice + l_orderkey * 1e-9) AS top_order,
             MIN_BY(l_orderkey, l_extendedprice + l_orderkey * 1e-9) AS bottom_order,
             MAX(l_extendedprice) AS max_price,
             MIN(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // --- string_agg / array_agg with pinned order -------------------------
    QDef("q24_collect_agg", (s, dir) => {
      val t = Tables.register(s, dir)
      t("supplier").join(t("nation"), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(concat_ws(",", array_sort(collect_list(col("s_name")))).as("names_csv"),
             // stringified: the driver's pandas-based checker cannot sort array cells
             array_join(transform(array_sort(collect_list(col("s_suppkey"))),
                                  x => x.cast(StringType)), ",").as("supp_keys"),
             count(lit(1)).as("n"))
        .orderBy("n_name")
    }, Some("""
      SELECT n_name,
             STRING_AGG(s_name, ',' ORDER BY s_name) AS names_csv,
             STRING_AGG(s_suppkey, ',' ORDER BY s_suppkey) AS supp_keys,
             COUNT(*) AS n
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""")),

    // --- bool_and/bool_or + every/any semantics ---------------------------
    QDef("q24b_bool_agg", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem")
        .groupBy("l_suppkey")
        .agg(bool_and(col("l_quantity") > 1.0).as("all_multi"),
             bool_or(col("l_discount") > 0.09).as("any_big_disc"),
             count(lit(1)).as("n"))
        .orderBy("l_suppkey")
    }, Some("""
      SELECT l_suppkey,
             BOOL_AND(l_quantity > 1.0) AS all_multi,
             BOOL_OR(l_discount > 0.09) AS any_big_disc,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""")),

    // --- statistical aggregates, order-independent formulation ------------
    // stddev/variance/corr are accumulation-order dependent when computed
    // natively; both sides compute them from exact decimal power sums, so
    // the final double arithmetic is identical on both engines.
    QDef("q22_stats_agg", (s, dir) => {
      val t = Tables.register(s, dir)
      Tables.register(s, dir)
      s.sql(s"""
        SELECT l_returnflag, n,
               SQRT((sxx - sx * sx / n) / (n - 1))                 AS stddev_qty,
               (sxx - sx * sx / n) / n                             AS varpop_qty,
               ROUND((sxy - sx * sy / n) / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)), 10) AS corr_qty_price
        FROM (
          SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
                 ${sSum("l_quantity")} AS sx,
                 ${sSum("l_extendedprice")} AS sy,
                 ${sSum("l_quantity * l_quantity")} AS sxx,
                 ${sSumSq("l_extendedprice")} AS syy,
                 ${sSum("l_quantity * l_extendedprice")} AS sxy
          FROM lineitem GROUP BY l_returnflag
        ) ORDER BY l_returnflag""")
    }, Some(s"""
      SELECT l_returnflag, n,
             SQRT((sxx - sx * sx / n) / (n - 1))                 AS stddev_qty,
             (sxx - sx * sx / n) / n                             AS varpop_qty,
             ROUND((sxy - sx * sy / n) / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n)), 10) AS corr_qty_price
      FROM (
        SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
               ${oSum("l_quantity")} AS sx,
               ${oSum("l_extendedprice")} AS sy,
               ${oSum("l_quantity * l_quantity")} AS sxx,
               ${oSumSq("l_extendedprice")} AS syy,
               ${oSum("l_quantity * l_extendedprice")} AS sxy
        FROM lineitem GROUP BY l_returnflag
      ) ORDER BY l_returnflag""")),

    // production twin of q01: double sums instead of the exact-decimal
    // oracle path (the decimal tax is q01's whole CPU bill at scale;
    // production pipelines take last-ulp nondeterminism for 4x less CPU)
    QDef("q01p_pricing_native", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem").filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("double")).as("sum_qty"),
             sum(col("l_extendedprice").cast("double")).as("sum_base_price"),
             sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
               .cast("double")).as("sum_disc_price"),
             avg(col("l_quantity").cast("double")).as("avg_qty"),
             count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }, None),

    // production twin of q22: native single-pass double aggregates
    // (stddev/var/corr via Spark's codegen'd central-moment updates — one
    // scan, no decimal tax). Accumulation-order dependent in the last ulps
    // -> rows-only; value agreement with the exact-decimal q22 is pinned
    // by QueriesSpec to 1e-6 relative.
    QDef("q22p_stats_native", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
             stddev_samp(col("l_quantity").cast("double")).as("stddev_qty"),
             var_pop(col("l_quantity").cast("double")).as("varpop_qty"),
             corr(col("l_quantity").cast("double"),
                  col("l_extendedprice").cast("double")).as("corr_qty_price"))
        .orderBy("l_returnflag")
    }, None),

    // --- median / percentile (exact, interpolated) ------------------------
    QDef("q22b_percentiles", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
             expr("percentile(l_quantity, 0.9)").as("p90_qty"),
             min("l_quantity").as("min_qty"),
             max("l_quantity").as("max_qty"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             QUANTILE_CONT(l_quantity, 0.5) AS median_qty,
             QUANTILE_CONT(l_quantity, 0.9) AS p90_qty,
             MIN(l_quantity) AS min_qty,
             MAX(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))
  )
}
