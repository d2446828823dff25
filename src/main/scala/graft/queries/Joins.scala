package graft.queries

import graft.Tables
import graft.operators.AsOf
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._

/** Join surface (SURVEY §2.2 "Joins"): equi inner/outer, semi/anti,
  * cross, non-equi (band), multi-way star joins, as-of, positional.
  *
  * Scale notes: dimension tables (region/nation/supplier/customer at this
  * schema's proportions) are explicitly broadcast so the fact-table side
  * never shuffles for them; the orders⋈lineitem join shuffles both sides
  * on the order key — at 100 TB that is the unavoidable co-partitioning
  * (bucketing both tables by orderkey removes it entirely). AQE handles
  * skewed keys at runtime.
  */
object Joins {

  val defs: Seq[QDef] = Seq(

    // --- TPC-H Q3-style: star join + agg + top-N --------------------------
    QDef("q03_shipping_priority", (s, dir) => {
      val t = Tables.register(s, dir)
      val cust = t("customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t("orders").filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val li = t("lineitem").filter(col("l_shipdate") > lit("1997-01-01").cast(TimestampType))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
                col("o_orderdate").cast(DateType).as("orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }, Some(s"""
      SELECT l_orderkey, ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1997-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // --- TPC-H Q4-style: EXISTS rewritten as semi join --------------------
    QDef("q04_priority_exists", (s, dir) => {
      val t = Tables.register(s, dir)
      val ord = t("orders")
      val li = t("lineitem")
      ord.join(li,
          col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 100 DAY"),
          "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }, Some("""
      SELECT o_orderpriority, COUNT(*) AS n
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 100 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // --- TPC-H Q5-style: 5-way star join ----------------------------------
    QDef("q05_region_revenue", (s, dir) => {
      val t = Tables.register(s, dir)
      val asia = t("region").filter(col("r_name") === "ASIA")
      t("lineitem")
        .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t("customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t("supplier")),
              col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("n"))
        .orderBy(col("n_name"))
    }, Some(s"""
      SELECT n_name, ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue, COUNT(*) AS n
      FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                    JOIN nation   ON s_nationkey = n_nationkey
                    JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY n_name""")),

    // --- cross join (small dims) ------------------------------------------
    QDef("q19_cross_join", (s, dir) => {
      val t = Tables.register(s, dir)
      t("region").crossJoin(t("nation").select(col("n_nationkey"), col("n_regionkey")))
        .select(col("r_regionkey"), col("r_name"), col("n_nationkey"),
                (col("r_regionkey") === col("n_regionkey")).as("same_region"))
        .orderBy("r_regionkey", "n_nationkey")
    }, Some("""
      SELECT r_regionkey, r_name, n_nationkey,
             r_regionkey = n_regionkey AS same_region
      FROM region CROSS JOIN nation
      ORDER BY r_regionkey, n_nationkey""")),

    // --- semi + anti ------------------------------------------------------
    QDef("q20_semi_anti", (s, dir) => {
      val t = Tables.register(s, dir)
      val big = t("orders").filter(col("o_totalprice") > 400000.0)
      val withBig = t("customer").join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(lit("has_big_order").as("tag"), col("c_custkey"))
      val noOrders = t("customer").join(t("orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(lit("no_orders").as("tag"), col("c_custkey"))
      withBig.unionAll(noOrders).orderBy("tag", "c_custkey")
    }, Some("""
      SELECT 'has_big_order' AS tag, c_custkey FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE c_custkey = o_custkey AND o_totalprice > 400000.0)
      UNION ALL
      SELECT 'no_orders' AS tag, c_custkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE c_custkey = o_custkey)
      ORDER BY tag, c_custkey""")),

    // --- full outer join with nulls ---------------------------------------
    QDef("q41_full_outer", (s, dir) => {
      val t = Tables.register(s, dir)
      val nationAgg = t("customer").groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
      val suppAgg = t("supplier").groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
      nationAgg.join(suppAgg, col("c_nationkey") === col("s_nationkey"), "full_outer")
        .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
                coalesce(col("n_cust"), lit(0L)).as("n_cust"),
                coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    }, Some("""
      SELECT COALESCE(c.k, s.k) AS nationkey,
             COALESCE(c.n_cust, 0) AS n_cust,
             COALESCE(s.n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
      FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.k = s.k
      ORDER BY nationkey""")),

    // --- non-equi band join ------------------------------------------------
    QDef("q43_band_join", (s, dir) => {
      val t = Tables.register(s, dir)
      val cust = t("customer").select(col("c_custkey"), col("c_acctbal"))
      val supp = t("supplier").select(col("s_suppkey"), col("s_acctbal"))
      // distributed band-join shape: bucketize at the band width (20 =
      // 2δ), equi-join each probe row against its bucket ±1 on the
      // broadcast side, then apply the EXACT original band predicate as
      // a residual. |c-s| <= 10 implies bucket(c) ∈ {bucket(s)-1, ..,
      // +1}, so the output is identical while the pair work drops from
      // |cust| x |supp| (a BroadcastNestedLoopJoin evaluating 1.5e9
      // predicates at sf1 — 5.9 s) to |cust| x (3 buckets' occupancy)
      // (~8M pairs, hash-joined). The same rewrite is what a 100 TB
      // band join needs: the equi-bucket key makes it a shuffle/
      // broadcast HASH join instead of a nested loop.
      val w = 20.0
      val sb = supp
        .withColumn("_sb", floor(col("s_acctbal") / w).cast("long"))
        .withColumn("_b", explode(array(col("_sb") - 1, col("_sb"),
                                        col("_sb") + 1)))
        .drop("_sb")
      cust.withColumn("_b", floor(col("c_acctbal") / w).cast("long"))
        .join(broadcast(sb), Seq("_b"))
        .filter(col("c_acctbal") >= col("s_acctbal") - 10.0 &&
                col("c_acctbal") <= col("s_acctbal") + 10.0)
        .groupBy("s_suppkey").agg(count(lit(1)).as("n_close"))
        .orderBy("s_suppkey")
    }, Some("""
      SELECT s_suppkey, COUNT(*) AS n_close
      FROM customer JOIN supplier
        ON c_acctbal >= s_acctbal - 10.0 AND c_acctbal <= s_acctbal + 10.0
      GROUP BY s_suppkey ORDER BY s_suppkey""")),

    // --- AS-OF join (custom operator; DuckDB has native ASOF JOIN) --------
    // For each purchase event: the most recent prior-or-equal view event of
    // the same user. Spark side: graft.operators.AsOf (union + window
    // last-value — one shuffle on user_id, no range join explosion).
    // Timestamps are compared at microsecond precision on both engines
    // (oracle casts TIMESTAMP_NS -> TIMESTAMP).
    QDef("q33_asof_join", (s, dir) => {
      val t = Tables.register(s, dir)
      val ev = t("events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      AsOf.join(purchases, views, Seq("user_id"), "ts")
        .select(col("event_id").as("purchase_id"), col("view_id"))
        .orderBy("purchase_id")
    }, Some("""
      SELECT p.event_id AS purchase_id, v.view_id
      FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
            FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN
           (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS view_id
            FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY purchase_id""")),

    // ASOF forward + strict (`l.ts < r.ts`): the NEXT event strictly
    // after each purchase — same union+window kernel, descending order,
    // left-before-right at ties. Oracled against DuckDB's native `<`.
    QDef("q33b_asof_forward", (s, dir) => {
      val t = Tables.register(s, dir)
      val ev = t("events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      AsOf.join(purchases, clicks, Seq("user_id"), "ts",
          direction = "forward", strict = true)
        .select(col("event_id").as("purchase_id"), col("click_id"))
        .orderBy("purchase_id")
    }, Some("""
      SELECT p.event_id AS purchase_id, c.click_id
      FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
            FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN
           (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS click_id
            FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts < c.ts
      ORDER BY purchase_id""")),

    // ASOF with tolerance (pandas merge_asof semantics): the backward
    // match is kept only when it is within 1 hour — DuckDB reproduces
    // match-then-filter with a CASE over the native ASOF's matched time.
    QDef("q33c_asof_tolerance", (s, dir) => {
      val t = Tables.register(s, dir)
      val ev = t("events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      AsOf.join(purchases, views, Seq("user_id"), "ts",
          tolerance = Some(3600L * 1000000L))
        .select(col("event_id").as("purchase_id"), col("view_id"))
        .orderBy("purchase_id")
    }, Some("""
      SELECT p.event_id AS purchase_id,
             CASE WHEN v.ts IS NOT NULL
                   AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000
                  THEN v.view_id END AS view_id
      FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
            FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN
           (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS view_id
            FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY purchase_id""")),

    // --- positional join (zip by row position, explicit order) ------------
    QDef("q34_positional_join", (s, dir) => {
      val t = Tables.register(s, dir)
      import org.apache.spark.sql.expressions.Window
      val wr = Window.orderBy("r_regionkey")
      val wn = Window.orderBy("n_nationkey")
      val r = t("region").withColumn("pos", row_number().over(wr))
      val n = t("nation").filter(col("n_nationkey") < 5).withColumn("pos", row_number().over(wn))
      r.join(n, "pos").select(col("pos"), col("r_name"), col("n_name")).orderBy("pos")
    }, Some("""
      SELECT ROW_NUMBER() OVER (ORDER BY r.r_regionkey) AS pos, r.r_name, n.n_name
      FROM (SELECT * FROM region ORDER BY r_regionkey) r
      POSITIONAL JOIN (SELECT * FROM nation WHERE n_nationkey < 5 ORDER BY n_nationkey) n
      ORDER BY pos"""))
  )
}
