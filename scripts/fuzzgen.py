#!/usr/bin/env python3
"""Seeded random-query generator for Spark-vs-DuckDB differential testing.

Emits queries in the COMMON SQL subset of Spark 4.x and DuckDB (the traps
catalogued in .claude/skills/verify/SKILL.md are designed out):

- exact values only: integer aggregates are CAST to BIGINT (DuckDB SUM of
  ints is HUGEINT — the round-6 hash lesson); double SUMs go through
  DECIMAL(38,6) and round; avg is avoided (order-dependent FP).
- every query carries a total ORDER BY (all projected columns, NULLS FIRST
  spelled explicitly) so both engines produce one canonical row order.
- functions restricted to the proven-identical set used by the oracled
  query corpus (abs/length/lower/upper/substr/coalesce/CASE/round).

Usage: python3 scripts/fuzzgen.py <seed> <count> <out.json>
Then:  sbt "runMain graft.FuzzVerify <sfDir> <outDir> <out.json>"
       python3 scripts/selfcheck.py <sfDir> <outDir>
"""
import json, random, sys

# exact fixture schemas (TESTDATA.md; date/timestamp columns excluded —
# their literal spellings diverge across the two dialects)
TABLES = {
    "lineitem": {
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "dbl": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "str": ["l_returnflag", "l_linestatus"],
    },
    "orders": {
        "int": ["o_orderkey", "o_custkey"],
        "dbl": ["o_totalprice"],
        "str": ["o_orderstatus", "o_orderpriority"],
    },
    "customer": {
        "int": ["c_custkey", "c_nationkey"],
        "dbl": ["c_acctbal"],
        "str": ["c_name", "c_mktsegment"],
    },
    "part": {
        "int": ["p_partkey", "p_size"],
        "dbl": ["p_retailprice"],
        "str": ["p_name", "p_brand", "p_type"],
    },
    "supplier": {
        "int": ["s_suppkey", "s_nationkey"],
        "dbl": ["s_acctbal"],
        "str": ["s_name"],
    },
    "documents": {
        "int": ["doc_id", "n_chars"],
        "dbl": [],
        "str": ["lang", "source"],
    },
}


def gen_query(rnd, qid):
    t = rnd.choice(list(TABLES))
    cols = TABLES[t]
    ints, dbls, strs = cols["int"], cols["dbl"], cols["str"]

    def int_col(): return rnd.choice(ints)
    def str_col(): return rnd.choice(strs)
    def any_col(): return rnd.choice(ints + dbls + strs)

    def scalar_int():
        c = int_col()
        return rnd.choice([
            c,
            f"ABS({c} - {rnd.randint(0, 1000)})",
            f"{c} % {rnd.randint(2, 97)}",
            f"LENGTH({str_col()})",
        ])

    def scalar_str():
        c = str_col()
        return rnd.choice([
            c,
            f"LOWER({c})",
            f"UPPER({c})",
            f"SUBSTR({c}, 1, {rnd.randint(1, 6)})",
            f"COALESCE({c}, 'x')",
            f"REPLACE({c}, '{rnd.choice('aeos')}', '{rnd.choice(['', '_', 'xx'])}')",
            f"TRIM({c})",
            f"REVERSE({c})",
            f"CONCAT({c}, '#', {str_col()})",
        ])


    def gby():
        # GROUP BY ALL ≡ GROUP BY k when k is the only non-aggregate
        # select item (true for every site using this helper)
        return "GROUP BY ALL" if rnd.random() < 0.25 else "GROUP BY k"
    def pred():
        kind = rnd.randint(0, 7)
        if kind == 0:
            return f"{int_col()} {rnd.choice(['<', '<=', '>', '>=', '='])} {rnd.randint(0, 5000)}"
        if kind == 1:
            return f"{int_col()} % {rnd.randint(2, 13)} = {rnd.randint(0, 1)}"
        if kind == 2:
            c = str_col()
            return f"LENGTH({c}) {rnd.choice(['<', '>', '='])} {rnd.randint(3, 15)}"
        if kind == 3:
            c = str_col()
            return f"SUBSTR({c}, 1, 1) IN ({', '.join(repr(ch) for ch in rnd.sample('abcdefABC123s', rnd.randint(1, 4)))})"
        if kind == 4:
            return f"{int_col()} BETWEEN {rnd.randint(0, 500)} AND {rnd.randint(501, 5000)}"
        if kind == 5:
            return f"NOT ({int_col()} = {rnd.randint(0, 100)})"
        if kind == 6:
            # 3-valued logic: NULLIF manufactures NULLs, IS [NOT] DISTINCT
            # FROM is the null-safe comparison — identical semantics in both
            c = int_col()
            m = rnd.randint(2, 7)
            return (f"NULLIF({c} % {m}, {rnd.randint(0, m - 1)}) "
                    f"IS {rnd.choice(['', 'NOT '])}DISTINCT FROM "
                    f"{rnd.choice([str(rnd.randint(0, m - 1)), 'NULL'])}")
        return f"SUBSTR({str_col()}, {rnd.randint(1, 3)}, 1) = '{rnd.choice('aeirst0135')}'"

    def preds():
        n = rnd.randint(1, 3)
        return (" " + rnd.choice(["AND", "OR"]) + " ").join(f"({pred()})" for _ in range(n))

    shape = rnd.random()
    if shape < 0.08:
        # set operations: same projection, different predicates. No LIMIT,
        # full-tuple ORDER BY -> tie-proof. (ALL variants keep duplicate
        # multiplicities; distinct variants dedupe — both well-defined.)
        a, b = int_col(), str_col()
        op = rnd.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT",
                         "INTERSECT ALL", "EXCEPT ALL"])
        sql = (f"SELECT {a} AS x, {b} AS y FROM {t} WHERE {pred()} "
               f"{op} "
               f"SELECT {a} AS x, {b} AS y FROM {t} WHERE {pred()} "
               f"ORDER BY x NULLS FIRST, y NULLS FIRST")
        return " ".join(sql.split())
    if shape < 0.16:
        # correlated EXISTS / uncorrelated IN over a star FK edge,
        # aggregated to a total-ordered group count
        fk = rnd.choice([
            ("orders", "lineitem", "o_orderkey", "l_orderkey"),
            ("customer", "orders", "c_custkey", "o_custkey"),
            ("part", "lineitem", "p_partkey", "l_partkey"),
            ("supplier", "lineitem", "s_suppkey", "l_suppkey"),
        ])
        ot, it_, ok, ik = fk
        ocols, icols = TABLES[ot], TABLES[it_]
        inner_pred = f"{rnd.choice(icols['int'])} {rnd.choice(['<', '>', '>='])} {rnd.randint(0, 3000)}"
        gkey = rnd.choice(ocols["str"])
        neg = rnd.choice(["", "NOT "])
        if rnd.random() < 0.5:
            sub = f"{neg}EXISTS (SELECT 1 FROM {it_} WHERE {ik} = {ok} AND {inner_pred})"
        else:
            sub = f"{ok} {neg}IN (SELECT {ik} FROM {it_} WHERE {inner_pred})"
        sql = (f"SELECT {gkey} AS k, COUNT(*) AS n FROM {ot} "
               f"WHERE {sub} {gby()} ORDER BY k NULLS FIRST")
        return " ".join(sql.split())
    if shape < 0.22:
        # scalar subquery in the predicate (exact integer arithmetic only)
        c = int_col()
        inner = f"SELECT MIN({int_col()}) + {rnd.randint(0, 2000)} FROM {t}"
        gkey = str_col()
        sql = (f"SELECT {gkey} AS k, COUNT(*) AS n, MIN({c}) AS lo "
               f"FROM {t} WHERE {c} > ({inner}) "
               f"{gby()} ORDER BY k NULLS FIRST")
        return " ".join(sql.split())
    if shape < 0.30:
        # ROLLUP with GROUPING() markers (disambiguates rolled-up NULLs
        # from genuine NULL keys); total order on markers + keys
        if len(strs) >= 2:
            k1, k2 = rnd.sample(strs, 2)
        else:
            k1, k2 = strs[0], int_col()
        agg = f"CAST(SUM(CAST({int_col()} AS BIGINT)) AS BIGINT)"
        where = f"WHERE {preds()}" if rnd.random() < 0.5 else ""
        sql = (f"SELECT CAST(GROUPING({k1}) AS INT) AS g1, "
               f"CAST(GROUPING({k2}) AS INT) AS g2, "
               f"{k1} AS k1, {k2} AS k2, COUNT(*) AS n, {agg} AS a "
               f"FROM {t} {where} GROUP BY ROLLUP({k1}, {k2}) "
               f"ORDER BY g1 NULLS FIRST, g2 NULLS FIRST, "
               f"k1 NULLS FIRST, k2 NULLS FIRST")
        return " ".join(sql.split())
    if shape < 0.36:
        # 3-way join: either a chain (lineitem->orders->customer) or two
        # independent dims off the fact (part + supplier) — exercises join
        # reorder; grouped to a total-ordered aggregate
        if rnd.random() < 0.5:
            frm = ("lineitem JOIN orders ON l_orderkey = o_orderkey "
                   "JOIN customer ON o_custkey = c_custkey")
            gkey = rnd.choice(["c_mktsegment", "o_orderstatus",
                               "o_orderpriority", "l_returnflag"])
            icols = ["l_suppkey", "l_partkey", "o_custkey", "c_nationkey"]
        else:
            frm = ("lineitem JOIN part ON l_partkey = p_partkey "
                   "JOIN supplier ON l_suppkey = s_suppkey")
            gkey = rnd.choice(["p_brand", "l_linestatus", "s_name"])
            icols = ["l_orderkey", "p_size", "s_nationkey"]
        agg = f"CAST(SUM(CAST({rnd.choice(icols)} AS BIGINT)) AS BIGINT)"
        where = f"WHERE l_orderkey < {rnd.randint(200, 4000)}"
        if rnd.random() < 0.5:
            where += f" AND {rnd.choice(icols)} % {rnd.randint(2, 9)} = 0"
        sql = (f"SELECT {gkey} AS k, COUNT(*) AS n, {agg} AS a, "
               f"COUNT(DISTINCT {rnd.choice(icols)}) AS d "
               f"FROM {frm} {where} {gby()} ORDER BY k NULLS FIRST")
        return " ".join(sql.split())
    if shape < 0.40:
        # aggregate-of-aggregate through a CTE: the inner GROUP BY feeds an
        # outer rollup of exact integer stats (one row — trivially ordered)
        gkey = scalar_str()
        inner_agg = f"CAST(SUM(CAST({int_col()} AS BIGINT)) AS BIGINT)"
        where = f"WHERE {preds()}" if rnd.random() < 0.6 else ""
        sql = (f"WITH g AS (SELECT {gkey} AS k, COUNT(*) AS n, {inner_agg} AS s "
               f"FROM {t} {where} GROUP BY k) "
               f"SELECT COUNT(*) AS groups, CAST(SUM(n) AS BIGINT) AS rows_total, "
               f"MIN(s) AS lo, MAX(s) AS hi, "
               f"CAST(SUM(CASE WHEN n > {rnd.randint(1, 20)} THEN 1 ELSE 0 END) AS BIGINT) AS big "
               f"FROM g")
        return " ".join(sql.split())
    if shape < 0.46:
        # two-table equi join (star FK edges), aggregated — total order on
        # the group keys
        fk = rnd.choice([
            ("orders", "customer", "o_custkey", "c_custkey"),
            ("lineitem", "orders", "l_orderkey", "o_orderkey"),
            ("lineitem", "part", "l_partkey", "p_partkey"),
            ("lineitem", "supplier", "l_suppkey", "s_suppkey"),
        ])
        lt, rt, lk, rk = fk
        lcols, rcols = TABLES[lt], TABLES[rt]
        if rnd.random() < 0.35:
            # LEFT JOIN with a filtered right side (some rows unmatched):
            # COUNT(*) vs COUNT(right_col) vs SUM(COALESCE(...)) pin the
            # null-extension semantics exactly
            rint = rnd.choice(rcols["int"])
            inner_pred = f"{rnd.choice(rcols['int'])} {rnd.choice(['<', '>'])} {rnd.randint(0, 3000)}"
            gkey = rnd.choice(lcols["str"])
            sql = (f"SELECT {gkey} AS k, COUNT(*) AS n, COUNT({rint}) AS m, "
                   f"CAST(SUM(CAST(COALESCE({rint}, 0) AS BIGINT)) AS BIGINT) AS a "
                   f"FROM {lt} LEFT JOIN (SELECT * FROM {rt} WHERE {inner_pred}) t "
                   f"ON {lk} = {rk} {gby()} ORDER BY k NULLS FIRST")
            return " ".join(sql.split())
        gkey = rnd.choice(rcols["str"] + lcols["str"])
        agg2 = rnd.choice([
            f"CAST(SUM(CAST({rnd.choice(lcols['int'])} AS BIGINT)) AS BIGINT)",
            f"MIN({rnd.choice(lcols['int'] + rcols['int'])})",
            f"MAX({rnd.choice(lcols['str'] + rcols['str'])})",
        ])
        jpred = f"{rnd.choice(lcols['int'])} < {rnd.randint(100, 5000)}"
        if rnd.random() < 0.5:
            jpred += f" AND LENGTH({rnd.choice(rcols['str'])}) > {rnd.randint(2, 8)}"
        sql = (f"SELECT {gkey} AS k, COUNT(*) AS n, {agg2} AS a "
               f"FROM {lt} JOIN {rt} ON {lk} = {rk} WHERE {jpred} "
               f"{gby()} ORDER BY k NULLS FIRST")
        return " ".join(sql.split())
    if shape < 0.60:
        # window functions — only TIE-SAFE ones: rank/dense_rank depend
        # only on key values; sum/count over RANGE frames are
        # peer-inclusive. (row_number and ROWS frames are tie-order-
        # dependent and would produce legitimate cross-engine diffs.)
        part = str_col()
        okey = int_col()
        wf = rnd.choice([
            f"RANK() OVER (PARTITION BY {part} ORDER BY {okey})",
            f"DENSE_RANK() OVER (PARTITION BY {part} ORDER BY {okey})",
            f"CAST(SUM(CAST({okey} AS BIGINT)) OVER (PARTITION BY {part} ORDER BY {okey} "
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)",
            f"COUNT(*) OVER (PARTITION BY {part})",
            f"MIN({int_col()}) OVER (PARTITION BY {part})",
        ])
        where = f"WHERE {preds()}" if rnd.random() < 0.6 else ""
        sql = (f"SELECT {ints[0]} AS pk, {part} AS p, {okey} AS o, {wf} AS w "
               f"FROM {t} {where} "
               f"ORDER BY pk NULLS FIRST, p NULLS FIRST, o NULLS FIRST, w NULLS FIRST")
        return " ".join(sql.split())
    if shape < 0.82:
        # grouped aggregate
        keys = [scalar_str() if rnd.random() < 0.6 else scalar_int()
                for _ in range(rnd.randint(1, 2))]
        key_aliases = [f"k{i}" for i in range(len(keys))]
        aggs = ["COUNT(*) AS n"]
        for i in range(rnd.randint(1, 3)):
            kind = rnd.randint(0, 4)
            if kind == 4:
                aggs.append(f"COUNT(DISTINCT {any_col()}) AS a{i}")
            elif kind == 0:
                aggs.append(f"CAST(SUM(CAST({scalar_int()} AS BIGINT)) AS BIGINT) AS a{i}")
            elif kind == 1:
                aggs.append(f"MIN({any_col()}) AS a{i}")
            elif kind == 2:
                aggs.append(f"MAX({any_col()}) AS a{i}")
            elif dbls:
                d = rnd.choice(dbls)
                aggs.append(
                    f"ROUND(CAST(SUM(CAST({d} AS DECIMAL(38,6))) AS DOUBLE), 4) AS a{i}")
            else:
                aggs.append(f"CAST(COUNT({any_col()}) AS BIGINT) AS a{i}")
        sel = ", ".join(f"{k} AS {a}" for k, a in zip(keys, key_aliases)) + ", " + ", ".join(aggs)
        where = f"WHERE {preds()}" if rnd.random() < 0.7 else ""
        having = f"HAVING COUNT(*) > {rnd.randint(0, 3)}" if rnd.random() < 0.3 else ""
        order = ", ".join(f"{a} NULLS FIRST" for a in key_aliases)
        sql = (f"SELECT {sel} FROM {t} {where} GROUP BY "
               + ", ".join(key_aliases) + f" {having} ORDER BY {order}")
    else:
        # projection + filter (+ LIMIT over a total order)
        projs = []
        for i in range(rnd.randint(2, 4)):
            if rnd.random() < 0.4:
                projs.append(f"{scalar_int()} AS c{i}")
            elif rnd.random() < 0.7:
                projs.append(f"{scalar_str()} AS c{i}")
            else:
                c = str_col()
                projs.append(
                    f"CASE WHEN LENGTH({c}) > {rnd.randint(4, 10)} THEN 'long' "
                    f"WHEN {int_col()} % 2 = 0 THEN 'even' ELSE 'other' END AS c{i}")
        # ORDER BY the ENTIRE projected tuple: the synthetic fixtures have
        # no guaranteed unique key (lineitem duplicates even (l_orderkey,
        # l_linenumber)), so any partial order leaves tie rows whose
        # relative order — and LIMIT-boundary membership — legitimately
        # differs between engines. Ordering by every output column makes
        # ties full-duplicate rows, which compare equal either way. (The
        # first two fuzz runs caught exactly this class.)
        key = ints[0]
        where = f"WHERE {preds()}" if rnd.random() < 0.8 else ""
        limit = f"LIMIT {rnd.randint(10, 200)}" if rnd.random() < 0.5 else ""
        aliases = ["pk"] + [p.split(" AS ")[-1] for p in projs]
        order = ", ".join(f"{a} NULLS FIRST" for a in aliases)
        sql = (f"SELECT {key} AS pk, " + ", ".join(projs) +
               f" FROM {t} {where} ORDER BY {order} {limit}")
    return " ".join(sql.split())


def main():
    seed, count, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    rnd = random.Random(seed)
    qs = {f"fz{seed}_{i:03d}": gen_query(rnd, i) for i in range(count)}
    json.dump(qs, open(out, "w"), indent=1, sort_keys=True)
    print(f"wrote {count} queries (seed {seed}) to {out}")


if __name__ == "__main__":
    main()
