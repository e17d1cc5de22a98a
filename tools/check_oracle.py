#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the same sf tables, and
compares: schema (column names sorted), row count, and exact values
(columns sorted by name, row order as produced).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sdf = pd.read_parquet(spark_dir)
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}"); n_fail += 1; continue
        ok, msg = compare(sdf, ddf)
        if ok: n_pass += 1; print(f"PASS {name} ({len(sdf)} rows)")
        else: n_fail += 1; print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return n_fail

def compare(sdf, ddf):
    sc, dc = sorted(sdf.columns), sorted(ddf.columns)
    if sc != dc:
        return False, f"schema mismatch spark={sc} duck={dc}"
    if len(sdf) != len(ddf):
        return False, f"rowcount spark={len(sdf)} duck={len(ddf)}"
    sdf, ddf = sdf[sc], ddf[sc]
    for c in sc:
        a, b = sdf[c].values, ddf[c].values
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            a = a.astype('float64'); b = b.astype('float64')
            both_nan = pd.isna(a) & pd.isna(b)
            neq = ~(both_nan | (a == b))
            if neq.any():
                i = int(np.argmax(neq))
                return False, f"col {c} row {i}: spark={a[i]!r} duck={b[i]!r} (diff={a[i]-b[i]!r})"
        else:
            a = pd.Series(a).astype(object).where(pd.notna(a), None)
            b = pd.Series(b).astype(object).where(pd.notna(b), None)
            # normalize numpy scalar types & timestamps to python for ==
            a = a.map(norm); b = b.map(norm)
            neq = [(x, y) for x, y in zip(a, b) if x != y]
            if neq:
                return False, f"col {c}: first diff spark={neq[0][0]!r} duck={neq[0][1]!r} ({len(neq)} diffs)"
    return True, ""

def norm(v):
    if v is None: return None
    if isinstance(v, (np.integer,)): return int(v)
    if isinstance(v, (np.bool_,)): return bool(v)
    if isinstance(v, pd.Timestamp): return v.isoformat()
    return v

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
