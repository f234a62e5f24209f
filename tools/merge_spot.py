#!/usr/bin/env python3
"""Merge SpotBench JSON lines into the scale-ladder artifacts.

Usage:
  merge_spot.py sf10  <spot.log ...>   # fold refreshed mins into BENCH_sf10_spot.json
  merge_spot.py sf100 <spot.log ...>   # (re)build BENCH_sf100_spot.json vs sf10 mins

Protocol: a query's headline min is the MIN across every run that measured
it (load can only inflate a pass, never deflate it) — same rule Bench uses
across passes, applied across runs. The per-run JSON lines are kept under
"runs" so the artifact stays self-adjudicating.
"""
import json, re, sys


def spot_lines(paths):
    out = []
    for p in paths:
        for line in open(p, errors="replace"):
            m = re.search(r'\{"metric":"spot".*\}', line)
            if m:
                out.append(json.loads(m.group(0)))
    return out


def fold(runs):
    best = {}
    for r in runs:
        for q, v in r.get("queries", {}).items():
            if v["min"] < 0:
                continue  # failed query (SpotBench records -1), no sample
            if q not in best or v["min"] < best[q]["min"]:
                best[q] = dict(v)
    return best


def main():
    mode, paths = sys.argv[1], sys.argv[2:]
    # --replace qA,qB: these queries' code changed, so stale entries are
    # REPLACED by the new measurement rather than min-folded against it
    replace = set()
    if paths and paths[0].startswith("--replace"):
        replace = set(paths[0].split("=", 1)[1].split(","))
        paths = paths[1:]
    runs = spot_lines(paths)
    assert runs, "no spot JSON lines found"
    best = fold(runs)
    if mode in ("sf1", "sf10"):
        art = json.load(open("BENCH_sf10_spot.json"))
        for q, v in best.items():
            cur = art[mode]["queries"].get(q)
            if cur is None or q in replace or v["min"] < cur["min"]:
                art[mode]["queries"][q] = v
        for q, v in art["sf10"]["queries"].items():
            s1 = art["sf1"]["queries"].get(q)
            if s1:
                art["ratio_min_sf10_over_sf1"][q] = round(v["min"] / s1["min"], 2)
        json.dump(art, open("BENCH_sf10_spot.json", "w"), indent=1)
        print(json.dumps(art["ratio_min_sf10_over_sf1"], indent=0))
    elif mode == "sf100":
        sf10 = json.load(open("BENCH_sf10_spot.json"))["sf10"]["queries"]
        art = {
            "metric": "sf100_spot",
            "unit": "sec",
            "note": "",
            "runs": runs,
            "sf100_min": best,
            "ratio_min_sf100_over_sf10": {
                q: round(v["min"] / sf10[q]["min"], 2)
                for q, v in best.items() if q in sf10
            },
        }
        json.dump(art, open("BENCH_sf100_spot.json", "w"), indent=1)
        print(json.dumps(art["ratio_min_sf100_over_sf10"], indent=0))
    else:
        sys.exit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
