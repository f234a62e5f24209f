#!/usr/bin/env python3
"""Assemble BENCH_ladder_r19.json from SpotBench log files.

Usage: assemble_ladder.py out.json note.txt tier1=log1 tier2=log2 ...

Each log is a SpotBench run (one {"metric":"spot",...} JSON line); tiers
are labels like sf0.1/sf1/sf10/sf100. Per-query rows follow the
BENCH_ladder_r18.json shape: {"<tier>": min_sec, "rows": {...},
"passes_sec": {...}} so the cold/warm split stays explicit.
"""
import json
import sys


def main() -> None:
    out_path, note_path = sys.argv[1], sys.argv[2]
    tiers = []
    for arg in sys.argv[3:]:
        tier, log = arg.split("=", 1)
        line = next(l for l in open(log) if '"metric":"spot"' in l)
        tiers.append((tier, json.loads(line[line.index('{"metric"'):])))
    queries: dict = {}
    meta = {}
    for tier, run in tiers:
        meta[tier] = {k: run[k] for k in
                      ("passes", "loadavg_start", "loadavg_end", "wall_sec")}
        for q, row in run["queries"].items():
            entry = queries.setdefault(
                q, {"rows": {}, "passes_sec": {}, "mean": {}})
            entry[tier] = row["min"]
            entry["rows"][tier] = row["rows"]
            entry["mean"][tier] = row["mean"]
            entry["passes_sec"][tier] = row["passes_sec"]
    doc = {"metric": "ladder_r19", "unit": "sec",
           "note": open(note_path).read().strip(),
           "runs": meta}
    doc.update(dict(sorted(queries.items())))
    json.dump(doc, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}: {len(queries)} queries, "
          f"{len(tiers)} tiers")


if __name__ == "__main__":
    main()
