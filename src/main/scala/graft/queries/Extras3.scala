package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third wave: the remaining SURVEY §2.2 rows — mode()/bit_* aggregates,
  * the SQL PIVOT keyword, CSV/JSON sources (round-tripped through the
  * builtin writers so the oracle can check values against parquet), and
  * df.sample.
  */
object Extras3 {

  /** Deterministic per-(dir, table) temp dir for source round-trips. */
  private def tmpDir(dir: String, kind: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_${kind}_${Integer.toHexString(dir.hashCode)}").getAbsolutePath

  val defs: Seq[QDef] = Seq(

    // --- mode() + bit_and/bit_or/bit_xor aggregates -----------------------
    // mode is deterministic here: per-flag linenumber counts have a unique
    // argmax at sf0.001/0.01/0.1 (verified against the fixtures)
    QDef("q63_bit_mode_agg", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem")
        .groupBy("l_returnflag")
        .agg(bit_and(col("l_orderkey")).as("b_and"),
             bit_or(col("l_orderkey")).as("b_or"),
             bit_xor(col("l_orderkey")).as("b_xor"),
             mode(col("l_linenumber")).as("mode_ln"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             BIT_AND(l_orderkey) AS b_and,
             BIT_OR(l_orderkey) AS b_or,
             BIT_XOR(l_orderkey) AS b_xor,
             MODE(l_linenumber) AS mode_ln,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // --- SQL PIVOT keyword ------------------------------------------------
    QDef("q64_sql_pivot", (s, dir) => {
      Tables.register(s, dir)
      // fast fixed-point interior through the PIVOT: the pivoted aggregate
      // sums micro-unit longs (exact; |sum| < 2^63 up to ~1.8e11 rows of
      // qty <= 50), rescaled to double outside — same value as the
      // oracle's decimal interior
      s.sql("""
        SELECT l_returnflag,
               CAST(CAST(f_qty AS DECIMAL(38,0)) / 1000000 AS DOUBLE) AS f_qty,
               CAST(CAST(o_qty AS DECIMAL(38,0)) / 1000000 AS DOUBLE) AS o_qty
        FROM (
          SELECT * FROM (
            SELECT l_returnflag, l_linestatus,
                   CAST(l_quantity * 1e6 + 0.5D AS BIGINT) AS q
            FROM lineitem)
          PIVOT (SUM(q) FOR l_linestatus IN ('F' AS f_qty, 'O' AS o_qty)))
        ORDER BY l_returnflag""")
    }, Some("""
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS DOUBLE) AS f_qty,
             CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS DOUBLE) AS o_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // --- CSV source (write with the builtin CSV sink, read back, join) ----
    QDef("q65_csv_source", (s, dir) => {
      val t = Tables.register(s, dir)
      val path = tmpDir(dir, "csv")
      t("region").select("r_regionkey", "r_name")
        .write.mode("overwrite").option("header", "true").csv(path)
      val regionCsv = s.read.option("header", "true")
        .schema("r_regionkey BIGINT, r_name STRING").csv(path)
      regionCsv.join(t("nation"), col("r_regionkey") === col("n_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_nations"), min(col("n_name")).as("first_nation"))
        .orderBy("r_name")
    }, Some("""
      SELECT r_name, COUNT(*) AS n_nations, MIN(n_name) AS first_nation
      FROM region JOIN nation ON r_regionkey = n_regionkey
      GROUP BY r_name ORDER BY r_name""")),

    // --- JSON source ------------------------------------------------------
    QDef("q66_json_source", (s, dir) => {
      val t = Tables.register(s, dir)
      val path = tmpDir(dir, "json")
      t("supplier").select("s_suppkey", "s_name", "s_nationkey")
        .write.mode("overwrite").json(path)
      val suppJson = s.read
        .schema("s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT").json(path)
      suppJson.groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), min(col("s_name")).as("first_name"))
        .orderBy("s_nationkey")
    }, Some("""
      SELECT s_nationkey, COUNT(*) AS n, MIN(s_name) AS first_name
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // --- df.sample (seeded Bernoulli; no cross-engine twin -> rows-only) --
    QDef("q67_sample", (s, dir) => {
      val t = Tables.register(s, dir)
      t("customer").sample(withReplacement = false, fraction = 0.2, seed = 42L)
        .agg(count(lit(1)).as("n_sampled"),
             countDistinct(col("c_nationkey")).as("n_nations"))
    }, None),

    // --- reservoir-by-count sampling, PORTABLE twin (SURVEY §2.2
    //     `USING SAMPLE reservoir(n ROWS)`): a uniform n-row draw spelled
    //     as bottom-n by a keyed hash — deterministic on both engines
    //     (md5 hex is engine-identical), so it hash-oracles, unlike an
    //     RNG reservoir. 100 TB shape: ORDER BY hash LIMIT n plans as
    //     TakeOrderedAndProject — each partition keeps its local bottom-n
    //     (O(n) heap memory), the driver merges k·n rows; no global sort,
    //     no shuffle of the corpus. o_orderkey breaks (impossible) md5
    //     ties so the emitted order is total. ----------------------------
    QDef("q67b_sample_reservoir", (s, dir) => {
      val t = Tables.register(s, dir)
      t("orders")
        .orderBy(md5(col("o_orderkey").cast("string")), col("o_orderkey"))
        .limit(50)
        .select(col("o_orderkey"), col("o_orderstatus"),
                col("o_totalprice").cast("double").as("o_totalprice"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DOUBLE) AS o_totalprice
      FROM orders
      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
      LIMIT 50""")),

    // --- exact DESCRIBE twin: count/mean/std/min/max from decimal power
    //     sums (the oracle-checkable complement of rows-only q60) ----------
    QDef("q60b_describe_exact", (s, dir) => {
      Tables.register(s, dir)
      s.sql(s"""
        SELECT o_count,
               ROUND(sx / o_count, 6) AS price_mean,
               ROUND(SQRT((sxx - sx * sx / o_count) / (o_count - 1)), 6) AS price_std,
               price_min, price_max, cust_min, cust_max
        FROM (
          SELECT COUNT(*) AS o_count,
                 ${Det.sSum("o_totalprice")} AS sx,
                 ${Det.sSumSq("o_totalprice")} AS sxx,
                 MIN(o_totalprice) AS price_min, MAX(o_totalprice) AS price_max,
                 MIN(o_custkey) AS cust_min, MAX(o_custkey) AS cust_max
          FROM orders)""")
    }, Some(s"""
      SELECT o_count,
             ROUND(sx / o_count, 6) AS price_mean,
             ROUND(SQRT((sxx - sx * sx / o_count) / (o_count - 1)), 6) AS price_std,
             price_min, price_max, cust_min, cust_max
      FROM (
        SELECT COUNT(*) AS o_count,
               ${Det.oSum("o_totalprice")} AS sx,
               ${Det.oSumSq("o_totalprice")} AS sxx,
               MIN(o_totalprice) AS price_min, MAX(o_totalprice) AS price_max,
               MIN(o_custkey) AS cust_min, MAX(o_custkey) AS cust_max
        FROM orders)""")),

    // --- GROUPS window frame + EXCLUDE CURRENT ROW, via rewrite -----------
    // Spark has no GROUPS frames: GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING
    // == RANGE +-1 over dense_rank of the order key; EXCLUDE CURRENT ROW ==
    // frame sum minus the current row's value (exact in decimal). The
    // oracle checks the exclusion against DuckDB's NATIVE EXCLUDE frame;
    // the GROUPS part uses the same dense_rank equivalence (DuckDB 1.0,
    // the local validator, predates GROUPS frames).
    QDef("q69_groups_frame", (s, dir) => {
      val t = Tables.register(s, dir)
      val bucket = round(col("s_acctbal"), -2)
      val dr = dense_rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("s_nationkey").orderBy(bucket))
      val wG = org.apache.spark.sql.expressions.Window
        .partitionBy("s_nationkey").orderBy(col("__dr"))
        .rangeBetween(-1, 1)
      t("supplier")
        .withColumn("bucket", bucket)
        .withColumn("__dr", dr)
        .withColumn("__gsum_dec", sum(col("s_acctbal").cast(Det.Dec)).over(wG))
        .withColumn("__gcnt", count(lit(1)).over(wG))
        // + 0.0 normalizes IEEE negative zero (DuckDB ROUND emits -0.0)
        .select(col("s_suppkey"), (col("bucket") + 0.0).as("bucket"),
                col("__gsum_dec").cast(DoubleType).as("g_sum"),
                // SQL frame semantics: excluding the only row -> NULL, not 0
                when(col("__gcnt") === 1, lit(null))
                  .otherwise((col("__gsum_dec") - col("s_acctbal").cast(Det.Dec))
                    .cast(DoubleType)).as("g_sum_excl"))
        .orderBy("s_suppkey")
    }, Some("""
      SELECT s_suppkey, bucket + 0.0 AS bucket,
             CAST(SUM(bal) OVER (PARTITION BY s_nationkey ORDER BY dr
               RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS g_sum,
             CAST(SUM(bal) OVER (PARTITION BY s_nationkey ORDER BY dr
               RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
               EXCLUDE CURRENT ROW) AS DOUBLE) AS g_sum_excl
      FROM (SELECT s_suppkey, s_nationkey,
                   ROUND(s_acctbal, -2) AS bucket,
                   DENSE_RANK() OVER (PARTITION BY s_nationkey
                     ORDER BY ROUND(s_acctbal, -2)) AS dr,
                   CAST(s_acctbal AS DECIMAL(38,6)) AS bal
            FROM supplier)
      ORDER BY s_suppkey""")),

    // --- array set algebra: union / intersect / except (stringified) ------
    QDef("q70_array_setops", (s, dir) => {
      val t = Tables.register(s, dir)
      val stops = array(Seq("the", "a", "of", "and", "is").map(lit): _*)
      val toks = array_distinct(split(col("text"), " "))
      def strs(c: org.apache.spark.sql.Column) = array_join(array_sort(c), ",")
      t("documents").filter(col("doc_id") < 50)
        .select(col("doc_id"),
                strs(array_intersect(toks, stops)).as("inter_stops"),
                size(array_union(toks, stops)).cast(IntegerType).as("n_union"),
                size(array_except(toks, stops)).cast(IntegerType).as("n_except"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_INTERSECT(toks, ['the','a','of','and','is'])), ','), '') AS inter_stops,
             CAST(LEN(LIST_DISTINCT(LIST_CONCAT(toks, ['the','a','of','and','is']))) AS INT) AS n_union,
             CAST(LEN(LIST_FILTER(toks, x -> NOT list_contains(['the','a','of','and','is'], x))) AS INT) AS n_except
      FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
            FROM documents WHERE doc_id < 50)
      ORDER BY doc_id""")),

    // --- width_bucket histogram (oracle: the arithmetic equivalent --------
    //     floor((v-lo)/(hi-lo)*n)+1; all o_totalprice values lie in range) --
    QDef("q71_width_bucket", (s, dir) => {
      val t = Tables.register(s, dir)
      t("orders")
        .select(width_bucket(col("o_totalprice"), lit(0.0), lit(600000.0), lit(20))
          .as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }, Some("""
      SELECT CAST(FLOOR(o_totalprice / 600000.0 * 20) + 1 AS BIGINT) AS bucket,
             COUNT(*) AS n
      FROM orders GROUP BY 1 ORDER BY bucket""")),

    // --- star EXCEPT + REPLACE-equivalent projection ----------------------
    QDef("q68_star_except", (s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT * EXCEPT (o_orderpriority, o_orderdate)
        FROM orders WHERE o_orderkey < 500""")
        .withColumn("o_totalprice", round(col("o_totalprice") * 2.0, 2))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT * EXCLUDE (o_orderpriority, o_orderdate)
               REPLACE (ROUND(o_totalprice * 2.0, 2) AS o_totalprice)
      FROM orders WHERE o_orderkey < 500
      ORDER BY o_orderkey""")),

    // --- GROUP BY ALL sugar (SURVEY §2.2) --------------------------------
    // every non-aggregate select item becomes a grouping key; Spark 4.x
    // resolves the ALL keyword natively with DuckDB-equivalent semantics,
    // so this is a contract test, not a custom rule
    QDef("q73_group_by_all", (s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
        FROM orders GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority""")
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
      FROM orders GROUP BY ALL
      ORDER BY o_orderstatus, o_orderpriority""")),

    // --- collations (SURVEY §2.2 sort row) --------------------------------
    // case-insensitive comparison + ORDER BY via Spark's native collation
    // support (UTF8_LCASE ≡ DuckDB NOCASE for ASCII); the collation lives
    // only in comparison/sort operands, so the OUTPUT schema stays plain
    // strings. Mixed case is synthesized from doc parity (the fixture
    // corpus is single-case); doc_id breaks collation-equal ties so the
    // order is total and the driver's in-order hash is stable.
    QDef("q74_collation_nocase", (s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        SELECT doc_id, mixed,
               CAST(mixed COLLATE UTF8_LCASE = 'src_3' AS INT) AS is_src3
        FROM (SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0 THEN UPPER(source) ELSE source END AS mixed
              FROM documents)
        WHERE doc_id < 120
        ORDER BY mixed COLLATE UTF8_LCASE, doc_id""")
    }, Some("""
      SELECT doc_id, mixed,
             CAST(mixed COLLATE NOCASE = 'src_3' AS INT) AS is_src3
      FROM (SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN UPPER(source) ELSE source END AS mixed
            FROM documents)
      WHERE doc_id < 120
      ORDER BY mixed COLLATE NOCASE, doc_id""")),

    // --- bounded GROUPS frame + EXCLUDE GROUP / EXCLUDE TIES --------------
    // completes the q69 family (verdict r6 "missing #4"): a bounded
    // GROUPS frame is RANGE over dense_rank with the same bounds, and the
    // remaining EXCLUDE variants decompose exactly:
    //   EXCLUDE GROUP = frame - peer_group    (NULL when frame == group)
    //   EXCLUDE TIES  = frame - peer_group + current row   (never empty)
    // where peer_group is the RANGE(0,0) window (the current row's peers).
    // All arithmetic in DECIMAL(38,6), so the decomposition is exact; the
    // oracle checks DuckDB's NATIVE EXCLUDE over the identical frame.
    QDef("q76_groups_exclude", (s, dir) => {
      val t = Tables.register(s, dir)
      val bucket = round(col("s_acctbal"), -2)
      val dr = dense_rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("s_nationkey").orderBy(bucket))
      def w(lo: Long, hi: Long) = org.apache.spark.sql.expressions.Window
        .partitionBy("s_nationkey").orderBy(col("__dr")).rangeBetween(lo, hi)
      val bal = col("s_acctbal").cast(Det.Dec)
      t("supplier")
        .withColumn("__dr", dr)
        .withColumn("__f", sum(bal).over(w(-2, 0)))
        .withColumn("__fc", count(lit(1)).over(w(-2, 0)))
        .withColumn("__g", sum(bal).over(w(0, 0)))
        .withColumn("__gc", count(lit(1)).over(w(0, 0)))
        .select(col("s_suppkey"),
                col("__f").cast(DoubleType).as("f_sum"),
                when(col("__fc") === col("__gc"), lit(null))
                  .otherwise((col("__f") - col("__g")).cast(DoubleType))
                  .as("excl_group"),
                (col("__f") - col("__g") + bal).cast(DoubleType).as("excl_ties"))
        .orderBy("s_suppkey")
    }, Some("""
      SELECT s_suppkey,
             CAST(SUM(bal) OVER (PARTITION BY s_nationkey ORDER BY dr
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS f_sum,
             CAST(SUM(bal) OVER (PARTITION BY s_nationkey ORDER BY dr
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS DOUBLE) AS excl_group,
             CAST(SUM(bal) OVER (PARTITION BY s_nationkey ORDER BY dr
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE TIES) AS DOUBLE) AS excl_ties
      FROM (SELECT s_suppkey, s_nationkey,
                   DENSE_RANK() OVER (PARTITION BY s_nationkey
                     ORDER BY ROUND(s_acctbal, -2)) AS dr,
                   CAST(s_acctbal AS DECIMAL(38,6)) AS bal
            FROM supplier)
      ORDER BY s_suppkey""")),

    // --- parameterized SQL (SURVEY §2.2 prepared statements) --------------
    // the PREPARE/EXECUTE analogue: named parameters bound server-side
    // via spark.sql(sql, args) — same plan cache + injection-safe binding;
    // the oracle inlines the same constants
    QDef("q75_prepared_params", (s, dir) => {
      Tables.register(s, dir)
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n
           FROM orders
           WHERE o_totalprice >= :lo AND o_totalprice < :hi
             AND o_orderstatus = :status
           GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        Map("lo" -> 100000.0, "hi" -> 200000.0, "status" -> "F"))
    }, Some("""
      SELECT o_orderpriority, COUNT(*) AS n
      FROM orders
      WHERE o_totalprice >= 100000.0 AND o_totalprice < 200000.0
        AND o_orderstatus = 'F'
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // SQL macros (DuckDB CREATE MACRO ≙ Spark 4 SQL UDF: CREATE FUNCTION
    // ... RETURN expr): the same scalar definition registered in each
    // engine's native spelling, applied per row — identical IEEE double
    // ops on both sides, so raw doubles hash-match without rounding.
    QDef("q78_sql_macro", (s, dir) => {
      val t = Tables.register(s, dir)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_markup(x DOUBLE)
               RETURNS DOUBLE RETURN x * 1.07 + 5.0""")
      s.sql("""
        SELECT o_orderkey, graft_markup(o_totalprice) AS marked
        FROM orders ORDER BY o_orderkey LIMIT 50""")
    }, Some("""
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) * 1.07 + 5.0 AS marked
      FROM orders ORDER BY o_orderkey LIMIT 50"""))
  )
}
