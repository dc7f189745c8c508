#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: reads Verify's parquet
dumps + oracle_sql.json, runs each oracle in DuckDB against the same sf
tables, and compares (rows sorted, columns sorted by name).

Usage: python3 tools/check.py <sfdir> <outdir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    # driver testdata tables are single files; Spark-written rehearsal
    # tables (tools/ScaleUp) are part-file directories
    src = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        exp = con.execute(sql).df()
    except Exception as ex:
        print(f"FAIL {name}: oracle error: {str(ex)[:200]}")
        fail += 1
        continue
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
    except Exception as ex:
        print(f"FAIL {name}: spark output missing: {str(ex)[:120]}")
        fail += 1
        continue
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fail += 1
        continue
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fail += 1
        continue
    # dtype-faithful compare, mirroring the driver's strict hash:
    # values are compared on their string serialization, so an oracle
    # that returns 5.0 where Spark wrote 5 FAILS here (as it does in
    # the driver) instead of being hidden by numeric coercion.
    ok = True
    for c in exp.columns:
        e, g = exp[c], got[c]
        same = ((e.isna() & g.isna()) | (e.astype(str) == g.astype(str))).all()
        if not same:
            diff = (~((e.astype(str) == g.astype(str)) | (e.isna() & g.isna()))).sum()
            print(f"FAIL {name}: col {c}: {diff} mismatched values")
            i = (~((e.astype(str) == g.astype(str)) | (e.isna() & g.isna()))).idxmax()
            print(f"     first diff row {i}: exp={exp.loc[i].to_dict()} got={got.loc[i].to_dict()}")
            ok = False
            fail += 1
            break
    if ok:
        print(f"PASS {name} ({len(got)} rows)")

missing = [q for q in only if q not in oracle]
if missing:
    print("not in oracle:", missing)
sys.exit(1 if fail else 0)
