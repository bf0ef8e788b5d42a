#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the same
testdata parquet tables, and compares: schema (column names sorted), column
TYPES (the driver's hash is type-sensitive — DuckDB HUGEINT vs Spark BIGINT
is a fail even when values match), row count, and exact cell values after
sorting columns by name and rows by value.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=repr)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        got_cols, got_types_l = got.columns, [str(t) for t in got.types]
        got_rows = got.fetchall()
        try:
            exp = con.sql(sql)
            exp_cols, exp_types_l = exp.columns, [str(t) for t in exp.types]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: schema {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        # Type gate: the driver hashes (type, value) so a HUGEINT oracle
        # column vs a BIGINT spark column fails even with identical values.
        # (cursor.description is too coarse — all numerics read 'NUMBER' —
        # hence con.sql relations, whose .types carry the DuckDB logical type.)
        got_types = dict(zip(got_cols, got_types_l))
        exp_types = dict(zip(exp_cols, exp_types_l))
        type_diffs = [f"{c}: spark={got_types[c]} oracle={exp_types[c]}"
                      for c in got_types if got_types[c] != exp_types[c]]
        if type_diffs:
            print(f"FAIL {name}: column type mismatch — " + "; ".join(type_diffs))
            n_fail += 1
            continue
        g, x = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        if g != x:
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            for i, (a, b) in enumerate(zip(g, x)):
                if a != b:
                    print(f"  first diff at {i}:\n   spark: {a}\n   duck : {b}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
