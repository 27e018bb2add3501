#!/usr/bin/env python3
"""Dev-only pre-validation harness (not part of the shipped library).

Mimics the driver's t2 gate: runs graft.Verify's parquet dumps against the
DuckDB oracle SQL in oracle_sql.json and compares per query:
  - row count, column names (sorted), and cell values;
  - the NUMERIC CLASS of each column after a parquet round-trip of the
    oracle result. This last check is what fetchall() value equality
    misses: DuckDB's integer sum() returns HUGEINT, which survives `//`
    and lands in parquet as DOUBLE, so the driver hashes "3.0" against
    Spark's "3" and records hash_match:false on a value-identical result
    (this bit q93 in rounds 5-6 and q133 in round 6). Width-only drift
    (INTEGER vs BIGINT) does not change the hashed value text and is
    allowed; class drift (int vs float vs decimal vs other) fails.
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys
import tempfile

import duckdb


def type_class(t):
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    return t


def roundtrip_type_drift(con, name, sql, out_dir, tmp_dir):
    """Return [(col, oracle_rt_type, spark_type)] for class-level drift
    between the oracle result written to parquet and Spark's parquet."""
    rt = os.path.join(tmp_dir, f"{name}.parquet")
    con.sql(f"COPY ({sql}) TO '{rt}' (FORMAT PARQUET)")
    ora = {r[0]: r[1] for r in
           con.sql(f"DESCRIBE SELECT * FROM '{rt}'").fetchall()}
    spk = {r[0]: r[1] for r in
           con.sql(f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'")
           .fetchall()}
    return [(c, ora[c], spk[c]) for c in ora
            if c in spk and type_class(ora[c]) != type_class(spk[c])]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    tmp_dir = tempfile.mkdtemp(prefix="oracle_rt_")
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
            continue
        drift = roundtrip_type_drift(con, name, sql, out_dir, tmp_dir)
        if drift:
            print(f"FAIL {name}: type-class drift (driver would hash-mismatch): "
                  + ", ".join(f"{c} oracle={a} spark={b}" for c, a, b in drift))
            failures += 1
        else:
            print(f"OK   {name}: {len(exp_rows)} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracles)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
