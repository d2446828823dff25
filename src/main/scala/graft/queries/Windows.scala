package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-function surface (SURVEY §2.2 "Window functions"): ranking
  * functions, lag/lead, first/last/nth with IGNORE NULLS, running and
  * range frames, QUALIFY rewrite, sessionization.
  *
  * Determinism: every window ORDER BY ends in a unique key so ranking and
  * offset functions are tie-free; running sums go through DECIMAL so the
  * result is independent of the (engine-specific) frame evaluation
  * strategy — DuckDB uses segment trees, Spark streams the frame; decimal
  * makes both exact.
  *
  * Scale: a window = one shuffle on partitionBy + per-partition sort.
  * Partition keys here (suppkey, user_id, custkey) have high cardinality,
  * so partitions stay small; none of these windows is a single global
  * ORDER BY over the fact table except q13's explicit small input.
  */
object Windows {

  private val Dec = DecimalType(38, 6)

  val defs: Seq[QDef] = Seq(

    // --- row_number top-N per group ---------------------------------------
    QDef("q09_topn_per_group", (s, dir) => {
      val t = Tables.register(s, dir)
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t("orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    }, Some("""
      SELECT o_custkey, rn, o_orderkey, o_totalprice
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // --- lag / lead -------------------------------------------------------
    // Window ordered by event_id (monotone per user, unique) rather than the
    // raw ns timestamp, so micro- vs nano-second precision cannot reorder.
    QDef("q10_lag_lead", (s, dir) => {
      val t = Tables.register(s, dir)
      val w = Window.partitionBy("user_id").orderBy("event_id")
      t("events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1, "none").over(w))
        .withColumn("delta", col("value") - coalesce(col("prev_value"), lit(0.0)))
        .select(col("user_id"), col("event_id"), col("value"),
                col("prev_value"), col("next_type"), col("delta"))
        .orderBy("user_id", "event_id")
    }, Some("""
      SELECT user_id, event_id, value,
             LAG(value, 1) OVER w AS prev_value,
             LEAD(event_type, 1, 'none') OVER w AS next_type,
             value - COALESCE(LAG(value, 1) OVER w, 0.0) AS delta
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      ORDER BY user_id, event_id""")),

    // --- running (cumulative) sum, ROWS frame -----------------------------
    QDef("q11_running_sum", (s, dir) => {
      val t = Tables.register(s, dir)
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t("lineitem").filter(col("l_suppkey") < 5)
        .withColumn("running_qty", Det.dwsum(col("l_quantity"), w))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }, Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      FROM lineitem WHERE l_suppkey < 5
      ORDER BY l_suppkey, l_orderkey, l_linenumber""")),

    // --- RANGE frame over a numeric axis ----------------------------------
    QDef("q12_range_frame", (s, dir) => {
      val t = Tables.register(s, dir)
      t("orders").filter(col("o_custkey") < 100)
        .withColumn("n_within_1000",
          expr("COUNT(*) OVER (ORDER BY o_totalprice RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)"))
        .select(col("o_orderkey"), col("o_totalprice"), col("n_within_1000"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_totalprice,
             COUNT(*) OVER (ORDER BY o_totalprice
                            RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1000
      FROM orders WHERE o_custkey < 100
      ORDER BY o_orderkey""")),

    // --- ranking family ----------------------------------------------------
    QDef("q13_ranking", (s, dir) => {
      val t = Tables.register(s, dir)
      val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice"), col("p_partkey"))
      t("part").filter(col("p_size") < 10)
        .select(col("p_brand"), col("p_partkey"),
                rank().over(w).as("rnk"),
                dense_rank().over(w).as("drnk"),
                ntile(4).over(w).as("quartile"),
                percent_rank().over(w).as("prank"),
                cume_dist().over(w).as("cdist"))
        .orderBy("p_brand", "p_partkey")
    }, Some("""
      SELECT p_brand, p_partkey,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk,
             NTILE(4) OVER w AS quartile,
             PERCENT_RANK() OVER w AS prank,
             CUME_DIST() OVER w AS cdist
      FROM part WHERE p_size < 10
      WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
      ORDER BY p_brand, p_partkey""")),

    // --- first/last/nth value with frames + IGNORE NULLS ------------------
    QDef("q48_first_last_nth", (s, dir) => {
      val t = Tables.register(s, dir)
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t("lineitem").filter(col("l_suppkey") < 3)
        .withColumn("rf_or_null", when(col("l_returnflag") === "N", lit(null).cast(StringType))
                                    .otherwise(col("l_returnflag")))
        .withColumn("first_ok", first(col("l_orderkey")).over(w))
        .withColumn("last_ok", last(col("l_orderkey")).over(w))
        .withColumn("nth3_ok", nth_value(col("l_orderkey"), 3).over(w))
        .withColumn("last_flag_notnull", last(col("rf_or_null"), ignoreNulls = true).over(w))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
                col("first_ok"), col("last_ok"), col("nth3_ok"), col("last_flag_notnull"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }, Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             FIRST_VALUE(l_orderkey) OVER w AS first_ok,
             LAST_VALUE(l_orderkey) OVER w AS last_ok,
             NTH_VALUE(l_orderkey, 3) OVER w AS nth3_ok,
             LAST_VALUE(CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END IGNORE NULLS)
               OVER w AS last_flag_notnull
      FROM lineitem WHERE l_suppkey < 3
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY l_suppkey, l_orderkey, l_linenumber""")),

    // --- QUALIFY rewrite: latest event per user ---------------------------
    QDef("q36_qualify_latest", (s, dir) => {
      val t = Tables.register(s, dir)
      val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
      t("events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy("user_id")
    }, Some("""
      SELECT user_id, event_id, event_type
      FROM events
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
      ORDER BY user_id""")),

    // --- sessionization (batch twin of streaming session windows) ---------
    // Gap > 30 minutes starts a new session; computed with lag + cumulative
    // sum of session-start markers — the standard scalable formulation (one
    // shuffle on user_id, no self-join).
    QDef("ev01_sessionize", (s, dir) => {
      val t = Tables.register(s, dir)
      val wOrd = Window.partitionBy("user_id").orderBy("event_id")
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t("events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
               unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
             Det.dsum(col("value")).as("session_value"))
        .orderBy("user_id", "session_id")
    }, Some(s"""
      SELECT user_id, session_id, COUNT(*) AS n_events,
             ${Det.oSum("value")} AS session_value
      FROM (
        SELECT user_id, value,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM (
          SELECT user_id, event_id, value,
                 CASE WHEN prev_ts IS NULL
                        OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(prev_ts) > 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_session
          FROM (SELECT user_id, event_id, value, ts,
                       LAG(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
                FROM events))
      ) GROUP BY user_id, session_id ORDER BY user_id, session_id""")),

    // --- tumbling time window (batch twin of streaming tumbling window) ---
    QDef("ev02_tumbling_window", (s, dir) => {
      val t = Tables.register(s, dir)
      t("events")
        .groupBy((floor(unix_micros(col("ts")) / (300L * 1000000L)) * 300L).as("win_start_epoch"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("total_value"))
        .orderBy("win_start_epoch", "event_type")
    }, Some(s"""
      SELECT CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / (300 * 1000000)) * 300 AS BIGINT) AS win_start_epoch,
             event_type, COUNT(*) AS n, ${Det.oSum("value")} AS total_value
      FROM events
      GROUP BY 1, 2 ORDER BY win_start_epoch, event_type""")),

    // --- sliding window, batch twin (10-min window / 5-min slide): each
    //     event lands in two windows; the oracle unions the two aligned
    //     start buckets ------------------------------------------------------
    QDef("ev03_sliding_window", (s, dir) => {
      val t = Tables.register(s, dir)
      t("events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("total_value"))
        .select((unix_micros(col("window.start")) / 1000000L).cast(LongType).as("win_start_epoch"),
                col("event_type"), col("n"), col("total_value"))
        .orderBy("win_start_epoch", "event_type")
    }, Some(s"""
      SELECT win_start_epoch, event_type, COUNT(*) AS n, ${Det.oSum("value")} AS total_value
      FROM (
        SELECT CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / (300 * 1000000)) * 300 AS BIGINT) AS win_start_epoch,
               event_type, value FROM events
        UNION ALL
        SELECT CAST((FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / (300 * 1000000)) - 1) * 300 AS BIGINT),
               event_type, value FROM events)
      GROUP BY 1, 2 ORDER BY win_start_epoch, event_type""")),

    // --- built-in session_window, batch twin (30-min gap per user); the
    //     oracle is the gaps-and-islands formulation ordered by (ts,
    //     event_id) — session end = last event + gap ------------------------
    QDef("ev04_session_window", (s, dir) => {
      val t = Tables.register(s, dir)
      t("events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("session_value"))
        .select(col("user_id"),
                unix_micros(col("session_window.start")).as("start_us"),
                unix_micros(col("session_window.end")).as("end_us"),
                col("n_events"), col("session_value"))
        .orderBy("user_id", "start_us")
    }, Some(s"""
      SELECT user_id,
             epoch_us(MIN(tss)) AS start_us,
             epoch_us(MAX(tss)) + 1800 * 1000000 AS end_us,
             COUNT(*) AS n_events,
             ${Det.oSum("value")} AS session_value
      FROM (
        SELECT user_id, value, tss,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY tss, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (
          SELECT user_id, value, event_id, tss,
                 CASE WHEN prev IS NULL
                        OR epoch_us(tss) - epoch_us(prev) > 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_session
          FROM (SELECT user_id, value, event_id, CAST(ts AS TIMESTAMP) AS tss,
                       LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
                FROM events)))
      GROUP BY user_id, session_id ORDER BY user_id, start_us""")),

    // DISTINCT aggregates over windows (DuckDB: COUNT(DISTINCT x) OVER —
    // Spark has no native window-DISTINCT): rewrite as
    // size(collect_set(x) OVER w). Whole-partition frame, so the set is
    // identical for every row of the partition; oracled against DuckDB's
    // NATIVE windowed distinct.
    QDef("q77_window_distinct", (s, dir) => {
      val t = Tables.register(s, dir)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
      t("orders")
        .select(col("o_orderkey"), col("o_custkey"),
          size(collect_set(col("o_orderpriority")).over(w)).as("n_prio"),
          size(collect_set(col("o_orderstatus")).over(w)).as("n_status"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_custkey,
             CAST(COUNT(DISTINCT o_orderpriority)
               OVER (PARTITION BY o_custkey) AS INT) AS n_prio,
             CAST(COUNT(DISTINCT o_orderstatus)
               OVER (PARTITION BY o_custkey) AS INT) AS n_status
      FROM orders ORDER BY o_orderkey"""))
  )
}
