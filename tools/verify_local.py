#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir> [reportJson]

With a third argument, also writes the driver-format correctness
report (CORRECTNESS_r{N}.json shape) — updated after EVERY query, so
even a killed run leaves a populated artifact.

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


def main(sf_dir, out_dir, report_path=None):
    # report_path: optional CORRECTNESS_r{N}.json in the driver's format
    # (per-query rows/schema/hash match) — written INCREMENTALLY after
    # every query so a killed run still leaves a populated artifact.
    report = {}

    def record(name, rows_match, schema_match, hash_match, sr, orc, err):
        if report_path is None:
            return
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": sr,
                        "oracle_rows": orc, "err": err}
        with open(report_path, "w") as f:
            json.dump(dict(sorted(report.items())), f, indent=2)

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
            record(name, False, False, False, -1, -1, f"oracle SQL error: {e}")
            failures += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {out_dir}/{name}")
            record(name, False, False, False, -1, len(want), "no spark output")
            failures += 1
            continue
        # read the spark side with pyarrow/pandas (NOT duckdb): the
        # driver's hash is type-sensitive, and duckdb's read would mask
        # physical-type differences (e.g. decimal vs double, int128)
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        w, g = canon(want), canon(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: columns want={list(w.columns)} got={list(g.columns)}")
            record(name, len(w) == len(g), False, False, len(g), len(w), "column mismatch")
            failures += 1
            continue
        if list(map(str, w.dtypes)) != list(map(str, g.dtypes)):
            print(f"FAIL {name}: dtypes want={dict(zip(w.columns, map(str, w.dtypes)))} "
                  f"got={dict(zip(g.columns, map(str, g.dtypes)))}")
            record(name, len(w) == len(g), False, False, len(g), len(w), "dtype mismatch")
            failures += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rows want={len(w)} got={len(g)}")
            record(name, False, True, False, len(g), len(w), "row count mismatch")
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
            record(name, True, True, False, len(g), len(w), "; ".join(bad[:3]))
            failures += 1
        else:
            print(f"PASS {name} ({len(w)} rows)")
            record(name, True, True, True, len(g), len(w), None)
    # queries without oracles get a rows-only check from the driver
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
