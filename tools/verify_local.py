#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Expects `graft.Verify` to have been run first:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"

For each query in oracle_sql.json: run the SQL in DuckDB with views over
the sfDir parquet tables, read the Spark result parquet, sort columns by
name and rows by value, and compare exactly.
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {out_dir}/{name}")
            failures += 1
            continue
        # read the spark side with pyarrow/pandas (NOT duckdb): the
        # driver's hash is type-sensitive, and duckdb's read would mask
        # physical-type differences (e.g. decimal vs double, int128)
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        w, g = canon(want), canon(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns want={list(w.columns)} got={list(g.columns)}")
            failures += 1
            continue
        if list(map(str, w.dtypes)) != list(map(str, g.dtypes)):
            print(f"FAIL {name}: dtypes want={dict(zip(w.columns, map(str, w.dtypes)))} "
                  f"got={dict(zip(g.columns, map(str, g.dtypes)))}")
            failures += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rows want={len(w)} got={len(g)}")
            failures += 1
            continue
        # exact value compare, column by column
        bad = []
        for c in w.columns:
            wc, gc = w[c], g[c]
            neq = ~((wc == gc) | (wc.isna() & gc.isna()))
            if neq.any():
                i = neq.idxmax()
                bad.append(f"{c}[{i}]: want={wc[i]!r} got={gc[i]!r} "
                           f"({int(neq.sum())} diffs)")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3]))
            failures += 1
        else:
            print(f"PASS {name} ({len(w)} rows)")
    # queries without oracles get a rows-only check from the driver
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
