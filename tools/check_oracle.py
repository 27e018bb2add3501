#!/usr/bin/env python3
"""Dev-only pre-validation harness (not part of the shipped library).

Mimics the driver's t2 gate: runs graft.Verify's parquet dumps against the
DuckDB oracle SQL in oracle_sql.json and compares per query:
  - row count, column names (sorted), and cell values.
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            exp = con.sql(sql)
            exp_cols = list(exp.columns)
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = list(got.columns)
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns exp={sorted(exp_cols)} got={sorted(got_cols)}")
            failures += 1
            continue
        # reorder got columns to oracle order
        idx = [got_cols.index(c) for c in exp_cols]
        got_rows = [tuple(r[i] for i in idx) for r in got_rows]
        if len(exp_rows) != len(got_rows):
            print(f"FAIL {name}: rowcount exp={len(exp_rows)} got={len(got_rows)}")
            failures += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(exp_rows, got_rows)):
            if tuple(map(norm, a)) != tuple(map(norm, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first diff at row {bad[0]}:\n  exp={bad[1]}\n  got={bad[2]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(exp_rows)} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracles)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
