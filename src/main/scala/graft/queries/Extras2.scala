package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._

/** Second wave of relational-surface depth: null-aware NOT IN, chained
  * [NOT] EXISTS, HAVING against a scalar subquery, windows over joins,
  * CTE+union pipelines, BPE-ish regex tokenization.
  */
object Extras2 {

  val defs: Seq[QDef] = Seq(

    // --- null-aware NOT IN anti join ---------------------------------------
    QDef("q54_not_in", (s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
                                AND l_quantity > 49.0 AND l_orderkey % 20 = 0)
        ORDER BY s_suppkey""")
    }, Some("""
      SELECT s_suppkey, s_name FROM supplier
      WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
                              AND l_quantity > 49.0 AND l_orderkey % 20 = 0)
      ORDER BY s_suppkey""")),

    // --- EXISTS and NOT EXISTS chained -------------------------------------
    QDef("q55_multi_exists", (s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT o_orderkey FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                      AND l_quantity > 45.0)
          AND NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                          AND l_discount > 0.09)
        ORDER BY o_orderkey""")
    }, Some("""
      SELECT o_orderkey FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                    AND l_quantity > 45.0)
        AND NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                        AND l_discount > 0.09)
      ORDER BY o_orderkey""")),

    // --- HAVING against a scalar subquery ----------------------------------
    QDef("q56_having_subquery", (s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT c_nationkey, COUNT(*) AS n_cust
        FROM customer GROUP BY c_nationkey
        HAVING COUNT(*) > (SELECT COUNT(*) / COUNT(DISTINCT c_nationkey) FROM customer)
        ORDER BY c_nationkey""")
    }, Some("""
      SELECT c_nationkey, COUNT(*) AS n_cust
      FROM customer GROUP BY c_nationkey
      HAVING COUNT(*) > (SELECT COUNT(*) / COUNT(DISTINCT c_nationkey) FROM customer)
      ORDER BY c_nationkey""")),

    // --- window over a join (revenue rank per nation) ----------------------
    QDef("q59_window_over_join", (s, dir) => {
      val t = Tables.register(s, dir)
      val cust = t("customer").select(col("c_custkey"), col("c_nationkey"))
      val rev = t("orders").join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey", "o_custkey")
        .agg(dsum(col("o_totalprice")).as("cust_rev"))
      val w = Window.partitionBy("c_nationkey").orderBy(col("cust_rev").desc, col("o_custkey"))
      rev.withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 2)
        .select(col("c_nationkey"), col("rnk"), col("o_custkey"), col("cust_rev"))
        .orderBy("c_nationkey", "rnk", "o_custkey")
    }, Some(s"""
      SELECT c_nationkey, rnk, o_custkey, cust_rev FROM (
        SELECT c_nationkey, o_custkey, cust_rev,
               RANK() OVER (PARTITION BY c_nationkey
                            ORDER BY cust_rev DESC, o_custkey) AS rnk
        FROM (SELECT c_nationkey, o_custkey, ${oSum("o_totalprice")} AS cust_rev
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_nationkey, o_custkey))
      WHERE rnk <= 2
      ORDER BY c_nationkey, rnk, o_custkey""")),

    // --- CTE pipeline: union of derived aggregates -------------------------
    QDef("q58_cte_union", (s, dir) => {
      Tables.register(s, dir)
      s.sql(s"""
        WITH big AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders
                     WHERE o_totalprice > 300000.0 GROUP BY o_custkey),
             rich AS (SELECT c_custkey AS k, 1 AS n FROM customer
                      WHERE c_acctbal > 9000.0)
        SELECT k, CAST(SUM(n) AS BIGINT) AS score
        FROM (SELECT * FROM big UNION ALL SELECT * FROM rich)
        GROUP BY k ORDER BY k""")
    }, Some("""
      WITH big AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders
                   WHERE o_totalprice > 300000.0 GROUP BY o_custkey),
           rich AS (SELECT c_custkey AS k, 1 AS n FROM customer
                    WHERE c_acctbal > 9000.0)
      SELECT k, CAST(SUM(n) AS BIGINT) AS score
      FROM (SELECT * FROM big UNION ALL SELECT * FROM rich)
      GROUP BY k ORDER BY k""")),

    // --- NATURAL JOIN (shared-name equi join) ------------------------------
    QDef("q61_natural_join", (s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT n_nationkey, n_name, r_name
        FROM (SELECT n_nationkey, n_name, n_regionkey AS r_regionkey FROM nation)
        NATURAL JOIN region
        ORDER BY n_nationkey""")
    }, Some("""
      SELECT n_nationkey, n_name, r_name
      FROM (SELECT n_nationkey, n_name, n_regionkey AS r_regionkey FROM nation)
      NATURAL JOIN region
      ORDER BY n_nationkey""")),

    // --- VALUES inline table joined against data ---------------------------
    QDef("q62_values_list", (s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT v.label, COUNT(*) AS n
        FROM orders JOIN (VALUES ('F', 'finished'), ('O', 'open'), ('P', 'pending'))
                         AS v(status, label)
          ON o_orderstatus = v.status
        GROUP BY v.label ORDER BY v.label""")
    }, Some("""
      SELECT v.label, COUNT(*) AS n
      FROM orders JOIN (VALUES ('F', 'finished'), ('O', 'open'), ('P', 'pending'))
                       AS v(status, label)
        ON o_orderstatus = v.status
      GROUP BY v.label ORDER BY v.label""")),

    // --- skewness / kurtosis from exact decimal power sums -----------------
    // (native skewness()/kurtosis() are accumulation-order dependent; both
    // sides compute the same double formula from exact decimal m1..m4)
    QDef("q22c_higher_moments", (s, dir) => {
      Tables.register(s, dir)
      s.sql(s"""
        SELECT l_returnflag,
               ROUND((s3 / n - 3 * m * (s2 / n) + 2 * m * m * m) /
                     POW((s2 / n - m * m), 1.5), 8) AS skew_qty,
               ROUND((s4 / n - 4 * m * (s3 / n) + 6 * m * m * (s2 / n) - 3 * m * m * m * m) /
                     POW((s2 / n - m * m), 2.0) - 3.0, 8) AS kurt_qty
        FROM (
          SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
                 ${Det.sSum("l_quantity")} / CAST(COUNT(*) AS DOUBLE) AS m,
                 ${Det.sSum("l_quantity * l_quantity")} AS s2,
                 ${Det.sSum("l_quantity * l_quantity * l_quantity")} AS s3,
                 ${Det.sSum("l_quantity * l_quantity * l_quantity * l_quantity")} AS s4
          FROM lineitem GROUP BY l_returnflag
        ) ORDER BY l_returnflag""")
    }, Some(s"""
      SELECT l_returnflag,
             ROUND((s3 / n - 3 * m * (s2 / n) + 2 * m * m * m) /
                   POW((s2 / n - m * m), 1.5), 8) AS skew_qty,
             ROUND((s4 / n - 4 * m * (s3 / n) + 6 * m * m * (s2 / n) - 3 * m * m * m * m) /
                   POW((s2 / n - m * m), 2.0) - 3.0, 8) AS kurt_qty
      FROM (
        SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
               ${Det.oSum("l_quantity")} / CAST(COUNT(*) AS DOUBLE) AS m,
               ${Det.oSum("l_quantity * l_quantity")} AS s2,
               ${Det.oSum("l_quantity * l_quantity * l_quantity")} AS s3,
               ${Det.oSum("l_quantity * l_quantity * l_quantity * l_quantity")} AS s4
        FROM lineitem GROUP BY l_returnflag
      ) ORDER BY l_returnflag""")),

    // production twin of q22c: native skewness/kurtosis (single-pass
    // codegen'd moments, no decimal power sums). Rows-only for the same
    // order-dependence reason; agreement with q22c pinned in QueriesSpec.
    QDef("q22cp_moments_native", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem").groupBy("l_returnflag")
        .agg(skewness(col("l_quantity").cast("double")).as("skew_qty"),
             kurtosis(col("l_quantity").cast("double")).as("kurt_qty"))
        .orderBy("l_returnflag")
    }, None),

    // --- DESCRIBE / SUMMARIZE equivalent (rows-only: stddev strings are
    //     engine-specific) ---------------------------------------------------
    QDef("q60_summarize", (s, dir) => {
      val t = Tables.register(s, dir)
      t("orders").select("o_totalprice", "o_custkey").summary(
        "count", "min", "25%", "50%", "75%", "max")
    }, None),

    // --- BPE-ish regex tokenization (SURVEY §2.5 "token counting:
    //     whitespace + a BPE-ish regex") ------------------------------------
    QDef("d03b_bpe_tokens", (s, dir) => {
      val t = Tables.register(s, dir)
      t("documents")
        .select(col("doc_id"),
                size(split(col("text"), " ")).cast(IntegerType).as("ws_tokens"),
                size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
                  .cast(IntegerType).as("bpeish_tokens"),
                size(expr("regexp_extract_all(text, '[aeiou]+', 0)"))
                  .cast(IntegerType).as("vowel_runs"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             CAST(LEN(string_split(text, ' ')) AS INT) AS ws_tokens,
             CAST(LEN(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS bpeish_tokens,
             CAST(LEN(regexp_extract_all(text, '[aeiou]+')) AS INT) AS vowel_runs
      FROM documents
      ORDER BY doc_id"""))
  )
}
