#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: read the Spark parquet result,
run the matching oracle SQL (oracle_sql.json) in DuckDB over the sfDir
tables, sort columns by name and rows by all columns, and diff values.
Strictly at-least-as-strong as the driver's hash compare.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize dtypes for compare: floats rounded repr, everything to str
    return df.map(lambda v: repr(v))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            status = "rows-only" + ("-PASS" if len(got) > 0 else "-FAIL(empty)")
            print(f"{status} {name}: rows={len(got)}")
            n_pass += len(got) > 0; n_fail += len(got) == 0
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if sorted(g.columns) != sorted(e.columns):
            print(f"FAIL {name}: columns spark={sorted(g.columns)} oracle={sorted(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}"); n_fail += 1; continue
        if not g.equals(e):
            neq = (g != e).any(axis=1)
            idx = list(g.index[neq])[:3]
            print(f"FAIL {name}: {int(neq.sum())}/{len(g)} rows differ; first idx {idx}")
            for i in idx[:2]:
                print(f"  spark : {g.loc[i].to_dict()}")
                print(f"  oracle: {e.loc[i].to_dict()}")
            n_fail += 1; continue
        print(f"PASS {name}: rows={len(g)}")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
