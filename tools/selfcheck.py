#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.
Usage: selfcheck.py <sfDir> <verifyOutDir>"""
import duckdb, json, sys, glob

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["documents","embeddings","lineitem","orders","customer","nation","region","supplier","part","events"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = True
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
        sdf = duckdb.connect().execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        # driver: sort columns by name, then compare
        odf = odf.reindex(sorted(odf.columns), axis=1)
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        rows_ok = len(odf) == len(sdf)
        cols_ok = list(odf.columns) == list(sdf.columns)
        # value compare: stringify rounded
        import pandas as pd
        def canon(df):
            return df.round(6).astype(str).values.tolist()
        vals_ok = rows_ok and cols_ok and canon(odf) == canon(sdf)
        status = "OK" if (rows_ok and cols_ok and vals_ok) else "MISMATCH"
        if status != "OK":
            ok = False
            print(f"{name}: {status} rows {len(sdf)}/{len(odf)} cols_ok={cols_ok}")
            if rows_ok and cols_ok:
                for i,(a,b) in enumerate(zip(canon(sdf), canon(odf))):
                    if a != b:
                        print(f"  row {i}: spark={a} oracle={b}")
                        if i > 3: break
            else:
                print("  spark cols:", list(sdf.columns)); print("  oracle cols:", list(odf.columns))
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    except Exception as e:
        ok = False
        print(f"{name}: ERROR {e}")
sys.exit(0 if ok else 1)
