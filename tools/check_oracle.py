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


# ---- oracle-side canonical sidecar (VERDICT r7 item 6) ----------------
#
# graft.Verify writes <name>.canonical.txt for the SPARK side of every
# query (sorted canonical row text, Canonical.scala's rendering). On a
# mismatch, emit the SAME canonical form of the DuckDB result as
# <name>.canonical.oracle.txt plus a unified-diff snippet, so a red row
# arrives with a ready-made two-sided value diff instead of one side.
#
# The rendering mirrors Canonical.cell, including Java's
# Double.toString notation rules (plain decimal for 1e-3 <= |x| < 1e7,
# "d.dddEn" scientific outside — Python repr switches at different
# thresholds, so _java_double re-derives Java's form from the same
# shortest-roundtrip digits). Known residual gap: FLOAT columns render
# via Float.toString on the Spark side but arrive as doubles from
# DuckDB — a diff there is formatting, not value.

CELL_SEP = "\x01"
_STRUCTURAL = set("␀,[]{}()→")


def _canon_str(s):
    out = []
    for c in s:
        if c == "\\":
            out.append("\\\\")
        elif c == "\n":
            out.append("\\n")
        elif c == "\r":
            out.append("\\r")
        elif c < " ":
            out.append(f"\\u{ord(c):04x}")
        elif c in _STRUCTURAL:
            out.append("\\" + c)
        else:
            out.append(c)
    return "".join(out)


def _canon_ts(dt):
    # Java Instant.toString: UTC, fraction trimmed to 0/3/6/9 digits
    import datetime
    if dt.tzinfo is not None:
        dt = dt.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    us = dt.microsecond
    if us == 0:
        return base + "Z"
    if us % 1000 == 0:
        return f"{base}.{us // 1000:03d}Z"
    return f"{base}.{us:06d}Z"


def _java_double(v):
    """Java Double.toString from Python's shortest-roundtrip digits."""
    from decimal import Decimal
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    sign = "-" if math.copysign(1.0, v) < 0 else ""
    a = abs(v)
    if a == 0.0:
        return sign + "0.0"
    t = Decimal(repr(a)).as_tuple()
    digits = "".join(map(str, t.digits)).rstrip("0") or "0"
    sci = len(t.digits) - 1 + t.exponent
    if -3 <= sci < 7:
        if sci >= 0:
            ip = digits[:sci + 1].ljust(sci + 1, "0")
            fp = digits[sci + 1:] or "0"
        else:
            ip = "0"
            fp = "0" * (-sci - 1) + digits
        return f"{sign}{ip}.{fp}"
    return f"{sign}{digits[0]}.{digits[1:] or '0'}E{sci}"


def canon_cell(v):
    import datetime
    from decimal import Decimal
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + v.hex()
    if isinstance(v, datetime.datetime):
        return _canon_ts(v)
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, Decimal):
        # Java stripTrailingZeros + toPlainString: 3.40 -> "3.4", 6E+2 -> "600"
        return format(v.normalize(), "f")
    if isinstance(v, float):
        return _java_double(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        # DuckDB surfaces both MAP and STRUCT as dict; render as the
        # map form (sorted k→v) — struct-valued gate results are rare
        # and a stable rendering is what the diff needs
        ents = sorted(canon_cell(k) + "→" + canon_cell(x) for k, x in v.items())
        return "{" + ",".join(ents) + "}"
    if isinstance(v, str):
        return _canon_str(v)
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(CELL_SEP.join(canon_cell(r[i]) for i in order) for r in rows)


def emit_oracle_sidecar(name, exp_cols, exp_rows, out_dir):
    """Write the oracle result's canonical rows; return a short unified
    diff vs the Spark sidecar if one exists."""
    import difflib
    lines = canon_rows(exp_cols, exp_rows)
    path = os.path.join(out_dir, f"{name}.canonical.oracle.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    spark_path = os.path.join(out_dir, f"{name}.canonical.txt")
    if not os.path.exists(spark_path):
        return f"  oracle canonical written to {path} (no spark sidecar to diff)"
    with open(spark_path) as f:
        spark_lines = f.read().splitlines()
    diff = list(difflib.unified_diff(
        spark_lines, lines, fromfile=f"{name} spark", tofile=f"{name} oracle",
        lineterm=""))[:40]
    return (f"  oracle canonical written to {path}; diff (first 40 lines):\n"
            + "\n".join("  " + d for d in diff))


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir, json_out=None):
    tmp_dir = tempfile.mkdtemp(prefix="oracle_rt_")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    report = {}

    def record(name, *, rows_match=False, schema_match=False,
               value_match=False, type_class_ok=False,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "value_match": value_match, "type_class_ok": type_class_ok,
            "spark_rows": spark_rows, "oracle_rows": oracle_rows,
            "err": err}

    for name in sorted(oracles):
        sql = oracles[name]
        try:
            exp = con.sql(sql)
            exp_cols = list(exp.columns)
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            record(name, err=f"oracle error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = list(got.columns)
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            record(name, oracle_rows=len(exp_rows),
                   err=f"spark output unreadable: {e}")
            failures += 1
            continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns exp={sorted(exp_cols)} got={sorted(got_cols)}")
            record(name, spark_rows=len(got_rows), oracle_rows=len(exp_rows),
                   err="schema mismatch")
            failures += 1
            continue
        # reorder got columns to oracle order
        idx = [got_cols.index(c) for c in exp_cols]
        got_rows = [tuple(r[i] for i in idx) for r in got_rows]
        if len(exp_rows) != len(got_rows):
            print(f"FAIL {name}: rowcount exp={len(exp_rows)} got={len(got_rows)}")
            print(emit_oracle_sidecar(name, exp_cols, exp_rows, out_dir))
            record(name, schema_match=True, spark_rows=len(got_rows),
                   oracle_rows=len(exp_rows), err="rowcount mismatch")
            failures += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(exp_rows, got_rows)):
            if tuple(map(norm, a)) != tuple(map(norm, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first diff at row {bad[0]}:\n  exp={bad[1]}\n  got={bad[2]}")
            print(emit_oracle_sidecar(name, exp_cols, exp_rows, out_dir))
            record(name, schema_match=True, rows_match=True,
                   spark_rows=len(got_rows), oracle_rows=len(exp_rows),
                   err=f"value mismatch at row {bad[0]}")
            failures += 1
            continue
        drift = roundtrip_type_drift(con, name, sql, out_dir, tmp_dir)
        if drift:
            print(f"FAIL {name}: type-class drift (driver would hash-mismatch): "
                  + ", ".join(f"{c} oracle={a} spark={b}" for c, a, b in drift))
            record(name, schema_match=True, rows_match=True, value_match=True,
                   spark_rows=len(got_rows), oracle_rows=len(exp_rows),
                   err="type-class drift: "
                       + ", ".join(f"{c} oracle={a} spark={b}" for c, a, b in drift))
            failures += 1
        else:
            print(f"OK   {name}: {len(exp_rows)} rows")
            record(name, schema_match=True, rows_match=True, value_match=True,
                   type_class_ok=True, spark_rows=len(got_rows),
                   oracle_rows=len(exp_rows))
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracles)} queries)")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "queries": report,
                       "n_queries": len(oracles), "n_failures": failures},
                      f, indent=1, sort_keys=True)
        print(f"report written to {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
