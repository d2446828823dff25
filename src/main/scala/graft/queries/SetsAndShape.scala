package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Set operations and query-shape surface (SURVEY §2.2 "Set operations",
  * "CTEs / query structure", "Sort / limit / top-k"): UNION [ALL] / BY
  * NAME, INTERSECT [ALL], EXCEPT [ALL], DISTINCT ON rewrite, recursive
  * CTE, GROUPING SETS, LIMIT/OFFSET, top-k, deterministic sampling.
  */
object SetsAndShape {

  val defs: Seq[QDef] = Seq(

    // --- INTERSECT / EXCEPT (distinct set semantics) ----------------------
    QDef("q14_intersect_except", (s, dir) => {
      val t = Tables.register(s, dir)
      val f = t("orders").filter(col("o_orderstatus") === "F").select("o_custkey")
      val o = t("orders").filter(col("o_orderstatus") === "O").select("o_custkey")
      f.intersect(o).select(lit("both").as("tag"), col("o_custkey"))
        .unionAll(f.except(o).select(lit("f_only").as("tag"), col("o_custkey")))
        .orderBy("tag", "o_custkey")
    }, Some("""
      SELECT 'both' AS tag, o_custkey FROM
        (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      UNION ALL
      SELECT 'f_only' AS tag, o_custkey FROM
        (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      ORDER BY tag, o_custkey""")),

    // --- INTERSECT ALL / EXCEPT ALL (multiset semantics) ------------------
    QDef("q47_intersect_except_all", (s, dir) => {
      val t = Tables.register(s, dir)
      val a = t("lineitem").filter(col("l_returnflag") === "A").select("l_suppkey")
      val n = t("lineitem").filter(col("l_returnflag") === "N").select("l_suppkey")
      a.intersectAll(n).groupBy("l_suppkey").agg(count(lit(1)).as("n_inter"))
        .join(a.exceptAll(n).groupBy("l_suppkey").agg(count(lit(1)).as("n_except")),
              Seq("l_suppkey"), "full_outer")
        .select(col("l_suppkey"),
                coalesce(col("n_inter"), lit(0L)).as("n_inter"),
                coalesce(col("n_except"), lit(0L)).as("n_except"))
        .orderBy("l_suppkey")
    }, Some("""
      WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'),
           n AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'N'),
           i AS (SELECT l_suppkey, COUNT(*) AS n_inter
                 FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM n) GROUP BY 1),
           e AS (SELECT l_suppkey, COUNT(*) AS n_except
                 FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM n) GROUP BY 1)
      SELECT COALESCE(i.l_suppkey, e.l_suppkey) AS l_suppkey,
             COALESCE(n_inter, 0) AS n_inter,
             COALESCE(n_except, 0) AS n_except
      FROM i FULL OUTER JOIN e ON i.l_suppkey = e.l_suppkey
      ORDER BY l_suppkey""")),

    // --- UNION BY NAME (column reordering union) --------------------------
    QDef("q46_union_by_name", (s, dir) => {
      val t = Tables.register(s, dir)
      val a = t("region").select(col("r_regionkey").as("k"), col("r_name").as("name"))
      val b = t("nation").filter(col("n_nationkey") < 3)
        .select(col("n_name").as("name"), col("n_nationkey").cast(IntegerType).as("k"))
      a.unionByName(b).orderBy("k", "name")
    }, Some("""
      SELECT r_regionkey AS k, r_name AS name FROM region
      UNION ALL BY NAME
      SELECT n_name AS name, n_nationkey AS k FROM nation WHERE n_nationkey < 3
      ORDER BY k, name""")),

    // --- DISTINCT ON rewrite: latest order per customer -------------------
    QDef("q15_distinct_on", (s, dir) => {
      val t = Tables.register(s, dir)
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t("orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
                col("o_orderdate").cast(DateType).as("latest_date"))
        .orderBy("o_custkey")
    }, Some("""
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS latest_date
      FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders)
      WHERE rn = 1 ORDER BY o_custkey""")),

    // --- recursive CTE ----------------------------------------------------
    QDef("q37_recursive_cte", (s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        WITH RECURSIVE t(n, fib, prev) AS (
          SELECT 1, CAST(1 AS BIGINT), CAST(0 AS BIGINT)
          UNION ALL
          SELECT n + 1, fib + prev, fib FROM t WHERE n < 30
        )
        SELECT n, fib FROM t ORDER BY n""")
    }, Some("""
      WITH RECURSIVE t(n, fib, prev) AS (
        SELECT 1, CAST(1 AS BIGINT), CAST(0 AS BIGINT)
        UNION ALL
        SELECT n + 1, fib + prev, fib FROM t WHERE n < 30
      )
      SELECT n, fib FROM t ORDER BY n""")),

    // --- GROUPING SETS ----------------------------------------------------
    QDef("q38_grouping_sets", (s, dir) => {
      Tables.register(s, dir)
      s.sql(s"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ${Det.sSum("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
    }, Some(s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
             ${Det.oSum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // --- ORDER BY + LIMIT + OFFSET ----------------------------------------
    QDef("q39_limit_offset", (s, dir) => {
      val t = Tables.register(s, dir)
      t("orders").select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .offset(40).limit(20)
    }, Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_orderkey LIMIT 20 OFFSET 40""")),

    // --- top-k (TakeOrderedAndProject) ------------------------------------
    QDef("q40_topk", (s, dir) => {
      val t = Tables.register(s, dir)
      t("orders").select(col("o_orderkey"), col("o_totalprice"), col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(15)
    }, Some("""
      SELECT o_orderkey, o_totalprice, o_custkey FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""")),

    // --- deterministic sampling (modulo; rand() is engine-specific) -------
    QDef("q35_sample_mod", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem").filter(col("l_orderkey") % 97 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity") // total order: no unique key
    }, Some("""
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_orderkey % 97 = 0
      ORDER BY l_orderkey, l_linenumber, l_quantity"""))
  )
}
