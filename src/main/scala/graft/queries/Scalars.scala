package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Det._

/** Scalar-function families + predicate/subquery surface (SURVEY §2.2
  * "Projection / filter / predicates" and "Scalar function families").
  *
  * Engine-parity notes baked into these queries:
  *  - transcendental fns (ln/exp/trig/degrees) are rounded to 8 decimals —
  *    both engines call libm but correct rounding isn't guaranteed;
  *  - Spark floor/ceil return LONG, DuckDB DOUBLE → oracle casts to BIGINT;
  *  - EXTRACT returns INT in Spark, BIGINT in DuckDB → cast to INT;
  *  - DuckDB regexp_replace is first-match by default → 'g' flag;
  *  - timestamps leave the query as DATE or formatted string (parquet
  *    tz-annotation differences make raw timestamp output non-comparable).
  */
object Scalars {

  val defs: Seq[QDef] = Seq(

    // --- IN / BETWEEN / LIKE / ILIKE / rlike ------------------------------
    QDef("q16_predicates", (s, dir) => {
      val t = Tables.register(s, dir)
      t("part")
        .filter(col("p_brand").isin("Brand#1", "Brand#12", "Brand#23") &&
                col("p_size").between(1, 25) &&
                col("p_name").like("%wid%"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
                col("p_name").ilike("%WID%").as("ilike_hit"),
                col("p_name").rlike("^(red|blue)").as("re_hit"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey, p_name, p_brand,
             p_name ILIKE '%WID%' AS ilike_hit,
             regexp_matches(p_name, '^(red|blue)') AS re_hit
      FROM part
      WHERE p_brand IN ('Brand#1', 'Brand#12', 'Brand#23')
        AND p_size BETWEEN 1 AND 25
        AND p_name LIKE '%wid%'
      ORDER BY p_partkey""")),

    // --- NULL three-valued logic ------------------------------------------
    QDef("q17_null_logic", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem").filter(col("l_orderkey") < 200)
        .withColumn("rf_null", nullif(col("l_returnflag"), lit("N")))
        .select(col("l_orderkey"), col("l_linenumber"),
                col("rf_null"),
                coalesce(col("rf_null"), lit("none")).as("rf_coalesced"),
                col("rf_null").eqNullSafe(lit("A")).as("nullsafe_eq_a"),
                col("rf_null").isNull.as("is_null"),
                (col("rf_null") === "A").as("threeval_eq_a"))
        // rf_coalesced (never NULL) completes the total order — the
        // remaining columns are functions of it
        .orderBy("l_orderkey", "l_linenumber", "rf_coalesced")
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             NULLIF(l_returnflag, 'N') AS rf_null,
             COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS rf_coalesced,
             NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM 'A' AS nullsafe_eq_a,
             NULLIF(l_returnflag, 'N') IS NULL AS is_null,
             NULLIF(l_returnflag, 'N') = 'A' AS threeval_eq_a
      FROM lineitem WHERE l_orderkey < 200
      ORDER BY l_orderkey, l_linenumber, rf_coalesced""")),

    // --- scalar subquery (decimal-exact avg threshold) --------------------
    QDef("q18_scalar_subquery", (s, dir) => {
      Tables.register(s, dir)
      s.sql(s"""
        SELECT p_partkey, p_retailprice
        FROM part
        WHERE p_retailprice > (SELECT ${sAvg("p_retailprice")} FROM part)
        ORDER BY p_partkey""")
    }, Some(s"""
      SELECT p_partkey, p_retailprice
      FROM part
      WHERE p_retailprice > (SELECT ${oAvg("p_retailprice")} FROM part)
      ORDER BY p_partkey""")),

    // --- correlated subquery ----------------------------------------------
    QDef("q18b_correlated_subquery", (s, dir) => {
      Tables.register(s, dir)
      s.sql(s"""
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (SELECT ${sAvg("o2.o_totalprice")} * 2.0
                              FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    }, Some(s"""
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o_totalprice > (SELECT ${oAvg("o2.o_totalprice")} * 2.0
                            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""")),

    // --- date/time functions ----------------------------------------------
    QDef("q26_datetime", (s, dir) => {
      val t = Tables.register(s, dir)
      t("orders").filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
                col("o_orderdate").cast(DateType).as("od"),
                year(col("o_orderdate")).cast(IntegerType).as("y"),
                month(col("o_orderdate")).cast(IntegerType).as("m"),
                dayofmonth(col("o_orderdate")).cast(IntegerType).as("d"),
                quarter(col("o_orderdate")).cast(IntegerType).as("q"),
                date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
                (col("o_orderdate") + expr("INTERVAL 30 DAY")).cast(DateType).as("plus30"),
                datediff(lit("2002-01-01").cast(DateType), col("o_orderdate").cast(DateType))
                  .cast(IntegerType).as("days_to_2002"),
                last_day(col("o_orderdate")).as("month_end"),
                date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("formatted"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS od,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
             CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
             CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS d,
             CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
             CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
             CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
             CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
             CAST(LAST_DAY(o_orderdate) AS DATE) AS month_end,
             STRFTIME(o_orderdate, '%Y-%m-%d %H:%M:%S') AS formatted
      FROM orders WHERE o_orderkey < 300
      ORDER BY o_orderkey""")),

    // --- month-level rollup of revenue (group by derived date) ------------
    QDef("q26b_monthly_revenue", (s, dir) => {
      val t = Tables.register(s, dir)
      t("lineitem")
        .groupBy(date_trunc("month", col("l_shipdate")).cast(DateType).as("ship_month"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("n"))
        .orderBy("ship_month")
    }, Some(s"""
      SELECT CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS ship_month,
             ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY ship_month""")),

    // --- string functions --------------------------------------------------
    QDef("q27_string_fns", (s, dir) => {
      val t = Tables.register(s, dir)
      t("part").filter(col("p_partkey") < 100)
        .select(col("p_partkey"),
                lower(col("p_name")).as("lo"),
                upper(col("p_brand")).as("up"),
                substring(col("p_name"), 1, 5).as("sub"),
                length(col("p_name")).cast(IntegerType).as("len"),
                lpad(col("p_brand"), 10, "*").as("lpadded"),
                rpad(col("p_brand"), 10, "-").as("rpadded"),
                regexp_replace(col("p_name"), "a", "@").as("replaced"),
                reverse(col("p_name")).as("rev"),
                split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
                split_part(col("p_name"), lit(" "), lit(2)).as("second_word"),
                instr(col("p_name"), "i").cast(IntegerType).as("pos_i"),
                repeat(col("p_brand"), 2).as("doubled"),
                concat(col("p_brand"), lit("/"), col("p_type")).as("joined"),
                md5(col("p_name")).as("name_md5"),
                levenshtein(col("p_name"), lit("red widget")).cast(IntegerType).as("lev"),
                trim(lpad(col("p_name"), 12, " ")).as("trimmed"),
                expr("left(p_name, 3)").as("l3"),
                expr("right(p_name, 3)").as("r3"),
                ascii(col("p_name")).cast(IntegerType).as("first_ascii"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             LOWER(p_name) AS lo,
             UPPER(p_brand) AS up,
             SUBSTRING(p_name, 1, 5) AS sub,
             CAST(LENGTH(p_name) AS INT) AS len,
             LPAD(p_brand, 10, '*') AS lpadded,
             RPAD(p_brand, 10, '-') AS rpadded,
             REPLACE(p_name, 'a', '@') AS replaced,
             REVERSE(p_name) AS rev,
             SPLIT_PART(p_name, ' ', 1) AS first_word,
             SPLIT_PART(p_name, ' ', 2) AS second_word,
             CAST(STRPOS(p_name, 'i') AS INT) AS pos_i,
             REPEAT(p_brand, 2) AS doubled,
             p_brand || '/' || p_type AS joined,
             MD5(p_name) AS name_md5,
             CAST(LEVENSHTEIN(p_name, 'red widget') AS INT) AS lev,
             TRIM(LPAD(p_name, 12, ' ')) AS trimmed,
             LEFT(p_name, 3) AS l3,
             RIGHT(p_name, 3) AS r3,
             CAST(ASCII(p_name) AS INT) AS first_ascii
      FROM part WHERE p_partkey < 100
      ORDER BY p_partkey""")),

    // --- regex family ------------------------------------------------------
    QDef("q28_regex", (s, dir) => {
      val t = Tables.register(s, dir)
      t("part").filter(col("p_partkey") < 150)
        .select(col("p_partkey"),
                regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
                regexp_extract(col("p_name"), "^([a-z]+) ([a-z]+)$", 2).as("noun"),
                regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
                col("p_name").rlike("(ring|bolt)$").as("is_ring_or_bolt"),
                size(split(col("p_name"), " ")).cast(IntegerType).as("n_words"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
             regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 2) AS noun,
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
             regexp_matches(p_name, '(ring|bolt)$') AS is_ring_or_bolt,
             CAST(LENGTH(string_split(p_name, ' ')) AS INT) AS n_words
      FROM part WHERE p_partkey < 150
      ORDER BY p_partkey""")),

    // --- math functions ----------------------------------------------------
    QDef("q29_math_fns", (s, dir) => {
      val t = Tables.register(s, dir)
      t("supplier")
        .select(col("s_suppkey"),
                abs(-col("s_acctbal")).as("abs_bal"),
                floor(col("s_acctbal")).as("floor_bal"),
                ceil(col("s_acctbal")).as("ceil_bal"),
                sqrt(abs(col("s_acctbal"))).as("sqrt_bal"),
                round(log(abs(col("s_acctbal")) + 1.0), 8).as("ln_bal"),
                round(log10(abs(col("s_acctbal")) + 1.0), 8).as("log10_bal"),
                round(exp(col("s_suppkey").cast(DoubleType) / 100.0), 8).as("exp_k"),
                round(sin(col("s_suppkey").cast(DoubleType)), 8).as("sin_k"),
                round(cos(col("s_suppkey").cast(DoubleType)), 8).as("cos_k"),
                signum(col("s_acctbal")).cast(IntegerType).as("sign_bal"),
                (col("s_suppkey") % 7).as("mod7"),
                pow(lit(2.0), col("s_suppkey").cast(DoubleType) % 10.0).as("pow2"),
                greatest(col("s_acctbal"), lit(1000.0)).as("gr"),
                least(col("s_acctbal"), lit(1000.0)).as("le"),
                // modulo bounds the magnitude (4096: exact in double):
                // at sparse sf1 keys (1e7+) round-to-8-decimals sits at
                // the 16th significant digit where engine rounding differs
                round(lit(Math.PI) * (col("s_suppkey") % 4096), 8).as("pi_k"))
        .orderBy("s_suppkey")
    }, Some("""
      SELECT s_suppkey,
             ABS(-s_acctbal) AS abs_bal,
             CAST(FLOOR(s_acctbal) AS BIGINT) AS floor_bal,
             CAST(CEIL(s_acctbal) AS BIGINT) AS ceil_bal,
             SQRT(ABS(s_acctbal)) AS sqrt_bal,
             ROUND(LN(ABS(s_acctbal) + 1.0), 8) AS ln_bal,
             ROUND(LOG10(ABS(s_acctbal) + 1.0), 8) AS log10_bal,
             ROUND(EXP(CAST(s_suppkey AS DOUBLE) / 100.0), 8) AS exp_k,
             ROUND(SIN(CAST(s_suppkey AS DOUBLE)), 8) AS sin_k,
             ROUND(COS(CAST(s_suppkey AS DOUBLE)), 8) AS cos_k,
             CAST(SIGN(s_acctbal) AS INT) AS sign_bal,
             s_suppkey % 7 AS mod7,
             POW(2.0, CAST(s_suppkey AS DOUBLE) % 10.0) AS pow2,
             GREATEST(s_acctbal, 1000.0) AS gr,
             LEAST(s_acctbal, 1000.0) AS le,
             ROUND(PI() * (s_suppkey % 4096), 8) AS pi_k
      FROM supplier
      ORDER BY s_suppkey""")),

    // --- JSON extraction ---------------------------------------------------
    QDef("q44_json", (s, dir) => {
      val t = Tables.register(s, dir)
      t("events").filter(col("event_id") < 500)
        .select(col("event_id"),
                get_json_object(col("props"), "$.k").cast(IntegerType).as("k_val"),
                (get_json_object(col("props"), "$.k").cast(IntegerType) * 2).as("k_doubled"),
                get_json_object(col("props"), "$.missing").as("missing_val"))
        .orderBy("event_id")
    }, Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
             CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k_doubled,
             json_extract_string(props, '$.missing') AS missing_val
      FROM events WHERE event_id < 500
      ORDER BY event_id""")),

    // --- JSON breadth: validity / keys / array length / typed transform ---
    // (SURVEY §2.2 json row — DuckDB's autoloaded json extension surface:
    // json_valid, json_keys, json_array_length, json_transform). Inputs
    // are synthesized deterministically from `props` so all three JSON
    // shapes (object, array, invalid) are exercised; every derived column
    // is guarded by the SAME validity+shape CASE on both engines.
    // Validity twin: Spark's get_json_object/try_parse_json are LENIENT
    // about trailing garbage ('"k": 69}' parses as the string "k"), so
    // is_valid is spelled as valid-object-or-valid-array —
    // json_object_keys / json_array_length return NULL unless the whole
    // doc is a well-formed object / array, matching DuckDB's json_valid
    // on this query's doc shapes (object, array, garbage).
    // json_transform(doc,'{"k":"INTEGER"}').k ≡ from_json(doc,'k INT').k.
    QDef("q79_json_breadth", (s, dir) => {
      Tables.register(s, dir)
      s.sql("""
        WITH base AS (
          SELECT event_id,
                 CAST(get_json_object(props, '$.k') AS INT) AS k, props
          FROM events WHERE event_id < 400
        ), j AS (
          SELECT event_id, k,
                 CASE CAST(event_id % 4 AS INT)
                   WHEN 0 THEN props
                   WHEN 1 THEN concat('{"a":', CAST(k AS STRING),
                                      ',"b":[1,2,', CAST(k AS STRING), ']}')
                   WHEN 2 THEN concat('[', CAST(k AS STRING), ',',
                                      CAST(k + 1 AS STRING), ',',
                                      CAST(k + 2 AS STRING), ']')
                   ELSE substr(props, 2)
                 END AS doc
          FROM base
        )
        SELECT event_id,
               (json_object_keys(doc) IS NOT NULL
                OR json_array_length(doc) IS NOT NULL) AS is_valid,
               array_join(json_object_keys(doc), ',') AS keys,
               CAST(json_array_length(doc) AS BIGINT) AS alen,
               CASE WHEN json_object_keys(doc) IS NOT NULL
                    THEN from_json(doc, 'k INT').k END AS k_typed
        FROM j ORDER BY event_id""")
    }, Some("""
      WITH base AS (
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k, props
        FROM events WHERE event_id < 400
      ), j AS (
        SELECT event_id, k,
               CASE CAST(event_id % 4 AS INT)
                 WHEN 0 THEN props
                 WHEN 1 THEN concat('{"a":', CAST(k AS VARCHAR),
                                    ',"b":[1,2,', CAST(k AS VARCHAR), ']}')
                 WHEN 2 THEN concat('[', CAST(k AS VARCHAR), ',',
                                    CAST(k + 1 AS VARCHAR), ',',
                                    CAST(k + 2 AS VARCHAR), ']')
                 ELSE substr(props, 2)
               END AS doc
        FROM base
      )
      SELECT event_id,
             (json_valid(doc) AND (doc LIKE '{%' OR doc LIKE '[%')) AS is_valid,
             CASE WHEN json_valid(doc) AND doc LIKE '{%'
                  THEN array_to_string(json_keys(doc), ',') END AS keys,
             CASE WHEN json_valid(doc) AND doc LIKE '[%'
                  THEN CAST(json_array_length(doc) AS BIGINT) END AS alen,
             CASE WHEN json_valid(doc) AND doc LIKE '{%'
                  THEN (json_transform(doc, '{"k":"INTEGER"}')).k END AS k_typed
      FROM j ORDER BY event_id""")),

    // --- GLOB / SIMILAR TO (SURVEY §2.2 predicates row) -------------------
    // full-string semantics, rewritten to anchored codegen rlike by
    // [[graft.functions.StringPredicates]] (see its scaladoc for the
    // DuckDB-verified semantics: SIMILAR TO is a plain full-match regex,
    // GLOB is a shell glob with * ? [..] [!..])
    QDef("q80_glob_similar", (s, dir) => {
      import graft.functions.StringPredicates.{glob, similarTo}
      val t = Tables.register(s, dir)
      t("part").filter(col("p_partkey") < 400)
        .select(col("p_partkey"), col("p_name"),
          glob(col("p_name"), "*red*").as("glob_hit"),
          glob(col("p_name"), "r?d*").as("glob_q"),
          glob(col("p_name"), "[rb]*wid*").as("glob_cls"),
          glob(col("p_name"), "[!a-m]*").as("glob_neg"),
          similarTo(col("p_name"), "(red|blue).*").as("sim_alt"),
          similarTo(col("p_name"), "[a-z]+ [a-z]+").as("sim_two"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey, p_name,
             p_name GLOB '*red*' AS glob_hit,
             p_name GLOB 'r?d*' AS glob_q,
             p_name GLOB '[rb]*wid*' AS glob_cls,
             p_name GLOB '[!a-m]*' AS glob_neg,
             p_name SIMILAR TO '(red|blue).*' AS sim_alt,
             p_name SIMILAR TO '[a-z]+ [a-z]+' AS sim_two
      FROM part WHERE p_partkey < 400
      ORDER BY p_partkey""")),

    // --- string similarity: levenshtein / char-set jaccard / hamming -------
    // jaccard + hamming are spelled out identically on both engines (set
    // algebra over split characters) rather than trusting builtin
    // similarity functions to agree on semantics.
    QDef("q53_string_similarity", (s, dir) => {
      val t = Tables.register(s, dir)
      val ref = lit("red widget")
      val chars = array_distinct(split(col("p_name"), ""))
      val refChars = array_distinct(split(ref, ""))
      val inter = size(array_intersect(chars, refChars))
      val uni = size(chars) + size(refChars) - inter
      t("part").filter(col("p_partkey") < 120)
        .select(col("p_partkey"),
                levenshtein(col("p_name"), ref).cast(IntegerType).as("lev"),
                round(inter.cast(DoubleType) / uni.cast(DoubleType), 9).as("char_jaccard"),
                size(filter(
                  zip_with(split(col("p_name"), ""), split(ref, ""), (a, b) => a =!= b),
                  x => x)).cast(IntegerType).as("hamming_prefix"))
        .orderBy("p_partkey")
    }, Some("""
      SELECT p_partkey,
             CAST(LEVENSHTEIN(p_name, 'red widget') AS INT) AS lev,
             ROUND(CAST(LEN(LIST_INTERSECT(chars, ref_chars)) AS DOUBLE) /
                   CAST(LEN(chars) + LEN(ref_chars) - LEN(LIST_INTERSECT(chars, ref_chars)) AS DOUBLE), 9)
               AS char_jaccard,
             CAST(LEN(LIST_FILTER(
               LIST_TRANSFORM(GENERATE_SERIES(1, LEAST(LENGTH(p_name), LENGTH('red widget'))),
                              i -> SUBSTRING(p_name, CAST(i AS INT), 1) <> SUBSTRING('red widget', CAST(i AS INT), 1)),
               x -> x)) AS INT) AS hamming_prefix
      FROM (SELECT p_partkey, p_name,
                   LIST_DISTINCT(STRING_SPLIT(p_name, '')) AS chars,
                   LIST_DISTINCT(STRING_SPLIT('red widget', '')) AS ref_chars
            FROM part)
      WHERE p_partkey < 120
      ORDER BY p_partkey""")),

    // --- CASE WHEN ladders + TRY_CAST --------------------------------------
    QDef("q02_case_project", (s, dir) => {
      val t = Tables.register(s, dir)
      // Sort narrow, project wide AFTER the sort: the range exchange
      // samples by re-executing its child, so every expression below a
      // global sort is paid twice. Keeping only source columns under the
      // sort and computing the CASE/try_cast projection above it (Project
      // is order-preserving; Catalyst has no rule pushing it back down)
      // halves the scan work and evaluates the derived columns once —
      // 1.48 s -> 0.68 s at sf0.1, and the same 2x on a 100 TB sort.
      t("lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity").between(10.0, 20.0))
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_quantity", "l_returnflag")
        // total order over SOURCE columns (still "sort narrow"): the
        // synthetic lineitem has no unique key, and a partial order let
        // engine-dependent tie placement diverge once sf1's parallel
        // scans stopped preserving file order; every projected column is
        // a function of these keys, so ties beyond them are identical rows
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_discount", "l_quantity")
        .select(col("l_orderkey"), col("l_linenumber"),
                (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"),
                when(col("l_quantity") > 18.0, "high")
                  .when(col("l_quantity") > 14.0, "mid")
                  .otherwise("low").as("qband"),
                expr("try_cast(l_returnflag AS INT)").as("bad_cast"),
                expr("try_cast(CAST(l_linenumber AS STRING) AS INT)").as("good_cast"))
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             l_extendedprice * (1.0 - l_discount) AS disc_price,
             CASE WHEN l_quantity > 18.0 THEN 'high'
                  WHEN l_quantity > 14.0 THEN 'mid'
                  ELSE 'low' END AS qband,
             TRY_CAST(l_returnflag AS INT) AS bad_cast,
             TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INT) AS good_cast
      FROM lineitem
      WHERE l_returnflag = 'R' AND l_quantity BETWEEN 10.0 AND 20.0
      ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount, l_quantity"""))
  )
}
