#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `graft.Verify` has dumped query results: for every query with an
oracle, executes the oracle SQL in DuckDB over the same parquet tables and
compares row counts + canonicalized values against the Spark result.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Timing mode (feeds BENCH_r{N}.json's oracle_secs column so the round
artifact carries the DuckDB-side wall time for every oracled query):

    python3 scripts/selfcheck.py <sfDir> <verifyOutDir> --timings ORACLE_SECS.json

runs every oracle twice against <sfDir> and writes {"query": min_secs}.
"""
import sys, os, json, math, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in v.items()) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def type_category(t):
    """Collapse a DuckDB type to a hash-equivalence category.

    The driver hashes canonicalized *values*, so int width doesn't matter
    (python int is python int), but decimal scale, decimal-vs-float, and
    float32-vs-float64 all change the canonical string. Two columns are
    hash-compatible only when their categories are identical. Keeping the
    category strict catches the DuckDB-version-skew class (local 1.0.0 vs
    driver 1.3.2 canonicalizing ROUND/SUM-of-DECIMAL types differently)
    before the driver does. Works token-wise so nested types (LIST/STRUCT/
    MAP type strings like `BIGINT[]`, `STRUCT(a INTEGER)`) normalize too.
    """
    import re
    s = str(t)

    def repl(m):
        tok = m.group(0)
        if tok in INT_TYPES:
            return "INT"
        if tok in ("HUGEINT", "UHUGEINT"):
            return "INT128"
        if tok == "FLOAT":
            return "F32"
        if tok == "DOUBLE":
            return "F64"
        return tok

    s = re.sub(r"[A-Z]+", repl, s)
    # canonical rendering of DECIMAL depends on scale (trailing digits),
    # not precision (Spark widens SUM to p+10, DuckDB differently — both
    # render the same value as long as scale agrees)
    s = re.sub(r"DECIMAL\((\d+),(\d+)\)", lambda m: f"DECIMAL(s={m.group(2)})", s)
    return s


def time_oracles(con, oracle, out_path):
    secs = {}
    for name in sorted(oracle):
        try:
            best = None
            for _ in range(2):
                t0 = time.monotonic()
                con.sql(oracle[name]).fetchall()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            secs[name] = round(best, 4)
            print(f"TIME {name}: {secs[name]:.3f} s")
        except Exception as e:
            print(f"TIME {name}: oracle error: {e}")
    json.dump(secs, open(out_path, "w"), indent=0, sort_keys=True)
    print(f"\nwrote {len(secs)} timings to {out_path}")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if rest[:1] == ["--timings"]:
        # optional query names after the output path restrict the run
        # (affordable oracle timing at big SFs where a few quadratic
        # oracles dominate)
        subset = set(rest[2:])
        timed = {k: v for k, v in oracle.items()
                 if not subset or k in subset}
        time_oracles(con, timed, rest[1] if len(rest) > 1 else "ORACLE_SECS.json")
        return
    only = set(rest)
    npass = nfail = nskip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no Spark result dir")
            nfail += 1
            continue
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = [tuple(r[exp.columns.index(c)] for c in exp_cols)
                        for r in exp.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            nfail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = [tuple(r[got.columns.index(c)] for c in got_cols)
                        for r in got.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: spark result read error: {e}")
            nfail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns differ spark={got_cols} oracle={exp_cols}")
            nfail += 1
            continue
        # Driver-hash hazard #1: DuckDB SUM over integers yields HUGEINT
        # (int128); the driver canonicalizes it differently from Spark's
        # int64 even when every value is equal (round-6 d17/d21/d26/l18).
        # Fail loudly here so the oracle gets an explicit BIGINT cast.
        bad_types = [(c, str(t)) for c, t in zip(exp.columns, exp.types)
                     if str(t) in ("HUGEINT", "UHUGEINT")]
        if bad_types:
            print(f"FAIL {name}: oracle emits int128 columns {bad_types}; "
                  f"CAST them to BIGINT in the oracle SQL")
            nfail += 1
            continue
        # Driver-hash hazard #2 (round-7 q73): any oracle column whose
        # numeric *category* differs from the Spark parquet column can
        # canonicalize differently under the driver's DuckDB version even
        # when every value is equal here. Compare categories by name.
        exp_types = {c: type_category(t) for c, t in zip(exp.columns, exp.types)}
        got_types = {c: type_category(t) for c, t in zip(got.columns, got.types)}
        type_mismatch = [(c, got_types[c], exp_types[c]) for c in exp_cols
                         if got_types.get(c) != exp_types.get(c)]
        if type_mismatch:
            for c, g, e in type_mismatch:
                print(f"FAIL {name}: column '{c}' type category differs "
                      f"spark={g} oracle={e}; make both sides the identical "
                      f"type (explicit CAST) so driver DuckDB-version skew "
                      f"cannot change the canonical hash")
            nfail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rowcount spark={len(got_rows)} oracle={len(exp_rows)}")
            nfail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            cg, ce = [canon(x) for x in g], [canon(x) for x in e]
            if cg != ce:
                bad = (i, cg, ce)
                break
        if bad:
            i, cg, ce = bad
            print(f"FAIL {name}: row {i} differs\n  cols : {exp_cols}\n  spark: {cg}\n  duck : {ce}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            npass += 1
    print(f"\n{npass} pass, {nfail} fail")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
