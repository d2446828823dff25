#!/usr/bin/env python3
"""Merge several graft.BenchHeavy artifacts (same query set, same scale
factors) into one: per-row runs arrays are concatenated and the committed
seconds recomputed as the MIN over all recorded runs — the interleaved
min-of-N protocol, with full provenance kept inline in the merged JSON.

Usage: merge_heavy.py out.json in1.json in2.json [in3.json ...]
"""
import hashlib
import json
import sys


def constituent_ids(a: dict) -> list:
    """The identities of the harness invocations an artifact carries: a
    merged artifact lists them in merged_ids; a raw artifact IS one
    invocation, identified by a content hash (identical-content re-runs
    would collide, but two invocations never produce bit-identical
    timings). Legacy merged artifacts without merged_ids synthesize
    opaque ids so the COUNT stays right even though their constituents
    can't be cross-deduped."""
    if "merged_ids" in a:
        return list(a["merged_ids"])
    h = hashlib.sha256(
        json.dumps(a, sort_keys=True).encode()).hexdigest()[:16]
    n = a.get("merged_from", 1)
    return [h] if n == 1 else [f"{h}#{i}" for i in range(n)]


def main() -> None:
    out_path, *in_paths = sys.argv[1:]
    if len(in_paths) < 1:
        sys.exit("need at least one input artifact")
    arts = [json.load(open(p)) for p in in_paths]
    # dedupe at the invocation level: re-merging a previously-merged base
    # together with one of its original constituents must not double-count
    # the invocation NOR duplicate its runs in the concatenated arrays.
    # Supersets are processed first so the outcome is order-independent:
    # a raw artifact listed before the merged artifact that contains it
    # is still recognized as a subset and skipped (not a hard error).
    all_ids = [constituent_ids(a) for a in arts]  # hash each input once
    order = sorted(range(len(arts)), key=lambda i: -len(all_ids[i]))
    seen_ids, kept_idx = [], []
    for i in order:
        p, ids = in_paths[i], all_ids[i]
        dup = [x for x in ids if x in seen_ids]
        if dup and len(dup) == len(ids):
            print(f"note: skipping {p} — all {len(ids)} constituent "
                  "invocation(s) already present in another input",
                  file=sys.stderr)
            continue
        if dup:
            sys.exit(f"{p} partially overlaps already-merged constituents "
                     f"{dup} — cannot separate its recomputed rows")
        seen_ids.extend(ids)
        kept_idx.append(i)
    if not kept_idx:
        sys.exit("nothing to merge: every input was a duplicate")
    # provenance fields still pass through from the FIRST kept input in
    # the caller's original order (the conventional base)
    arts = [arts[i] for i in sorted(kept_idx)]
    base = arts[0]
    for a in arts[1:]:
        for k in ("sf_small", "sf_big", "data_ratio"):
            if a.get(k) != base.get(k):
                sys.exit(f"artifact mismatch on {k}: {a.get(k)} vs {base.get(k)}")
    merged = dict(base)
    queries = {}
    names = [n for n in base["queries"]]
    for a in arts[1:]:
        for n in a["queries"]:
            if n not in names:
                names.append(n)
    # keys the merge recomputes; anything else (sf_big_skipped, future
    # markers) is provenance and passes through from the first row that
    # carries it
    recomputed = {"ratio"} | {
        f"{s}{x}" for s in ("sf_small", "sf_big")
        for x in ("", "_runs", "_error", "_errors")}
    for n in names:
        rows = [a["queries"][n] for a in arts if n in a["queries"]]
        m = {}
        for r in rows:
            for k, v in r.items():
                if k not in recomputed and k not in m:
                    m[k] = v
        for side in ("sf_small", "sf_big"):
            runs = []
            for r in rows:
                runs.extend(r.get(f"{side}_runs", ([r[side]] if side in r else [])))
            errs = [r[f"{side}_error"] for r in rows if f"{side}_error" in r]
            errs += [e for r in rows for e in r.get(f"{side}_errors", [])
                     if e not in errs]
            if runs:
                m[side] = round(min(runs), 3)
                m[f"{side}_runs"] = [round(t, 3) for t in runs]
                # a real measurement supersedes a skip marker carried over
                # from an invocation that skipped this side — a row must
                # not claim both skipped and measured
                m.pop(f"{side}_skipped", None)
                if errs:
                    # some invocations errored while others ran: keep the
                    # error strings as provenance next to the runs
                    m[f"{side}_errors"] = errs
            elif errs:
                m[f"{side}_error"] = errs[0]
                if len(errs) > 1:
                    m[f"{side}_errors"] = errs
        if "sf_small" in m and "sf_big" in m and m["sf_small"] > 0:
            m["ratio"] = round(m["sf_big"] / m["sf_small"], 2)
        queries[n] = m
    merged["queries"] = queries
    # the UNION of constituent invocation identities, not a sum — a
    # previously-merged base re-merged alongside one of its own inputs
    # counts (and concatenates) each invocation exactly once
    merged["merged_ids"] = seen_ids
    merged["merged_from"] = len(seen_ids)
    merged["total_sf_small"] = round(
        sum(q["sf_small"] for q in queries.values() if "sf_small" in q), 1)
    merged["total_sf_big"] = round(
        sum(q["sf_big"] for q in queries.values() if "sf_big" in q), 1)
    # idempotent under re-merge: strip a previous MERGED sentence before
    # appending the current one (the count lives in merged_from)
    note = base.get("note", "").split(" MERGED artifact:")[0]
    merged["note"] = note + (
        f" MERGED artifact: per-row MIN over {merged['merged_from']} "
        "harness invocations' runs arrays (raw runs concatenated per row).")
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"merged {len(arts)} artifacts -> {out_path}: "
          f"small {merged['total_sf_small']} s, big {merged['total_sf_big']} s")


if __name__ == "__main__":
    main()
