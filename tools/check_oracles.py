#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against the Spark outputs
written by graft.Verify — approximates the driver's DuckDB compare
(sort columns by name, sort rows, compare values exactly).

Usage: python3 tools/check_oracles.py <verify_out_dir> <sf_dir> [skip_csv]

skip_csv: optional comma-separated query names to skip — used by the
sf1 sweep for the deliberately brute-force all-pairs oracles
(exhaustive Jaccard / connected-components references), whose DuckDB
cost is quadratic in corpus size by design and infeasible at 50k docs.
"""
import json
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main(out_dir: str, sf_dir: str, skip_csv: str = "") -> int:
    skip = set(filter(None, skip_csv.split(",")))
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; ScaleUp corpora are
        # Spark-written directories of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name}")
            continue
        # read the Spark output FIRST: a restricted Verify run leaves
        # most outputs missing, and the oracle side can be expensive
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ: oracle={list(exp.columns)} spark={list(got.columns)}")
            n_fail += 1
            continue
        if list(exp.dtypes) != list(got.dtypes):
            print(f"FAIL {name}: dtypes differ:\n  oracle={dict(exp.dtypes.astype(str))}\n  spark ={dict(got.dtypes.astype(str))}")
            n_fail += 1
            continue
        exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got_s = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        if len(exp_s) != len(got_s):
            print(f"FAIL {name}: row counts differ: oracle={len(exp_s)} spark={len(got_s)}")
            n_fail += 1
            continue
        if not exp_s.equals(got_s):
            diff = (exp_s != got_s) & ~(exp_s.isna() & got_s.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} differing rows; first few:")
            print("  oracle:", exp_s[bad].head(3).to_dict("records"))
            print("  spark :", got_s[bad].head(3).to_dict("records"))
            n_fail += 1
            continue
        print(f"PASS {name} ({len(exp_s)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else ""))
