#!/usr/bin/env python3
"""Fold several graft.Bench invocations into the committed artifact.

The quiet-box convention commits the BEST full run (min total `value`);
this script makes that estimator self-describing: the output is the best
run verbatim plus a `passes` array carrying every invocation's total (in
input order) and a `passes_note` naming the rule, so a reader sees the
spread the pick came from without digging through round notes.

Usage: pick_bench.py out.json run1.json run2.json [run3.json ...]
"""
import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: pick_bench.py out.json run1.json [run2.json ...]")
    out_path, *in_paths = sys.argv[1:]
    runs = [json.load(open(p)) for p in in_paths]
    sfs = {r.get("sf") for r in runs}
    if len(sfs) != 1:
        sys.exit(f"bench results span different sf dirs: {sfs}")
    best = min(runs, key=lambda r: r["value"])
    merged = dict(best)
    merged["passes"] = [round(r["value"], 3) for r in runs]
    merged["passes_note"] = (
        "committed run = the invocation with the smallest total; `passes` "
        "lists every invocation's total in run order (ambient contention "
        "only adds time, so min-total is the quiet-box estimate)")
    with open(out_path, "w") as f:
        json.dump(merged, f, separators=(",", ":"))
        f.write("\n")
    print(f"picked total {best['value']} of {merged['passes']} -> {out_path}")


if __name__ == "__main__":
    main()
