#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run Verify output vs DuckDB.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Compares each <outDir>/<name> parquet against the oracle SQL in
<outDir>/oracle_sql.json executed by DuckDB over the same sf tables.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64, rest -> str
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.astype('float64')
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype('int64')
        else:
            out[c] = s.astype(str)
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # Verify records queries that threw (instead of silently producing no
    # output dir) — surface them with their error, counted as bad
    failed_path = os.path.join(out_dir, "_failed.json")
    failed = json.load(open(failed_path)) if os.path.exists(failed_path) else {}
    n_ok = n_bad = 0
    for name in sorted(oracle):
        pdir = os.path.join(out_dir, name)
        files = glob.glob(pdir + "/*.parquet")
        if not files:
            why = failed.get(name, "no spark output")
            print(f"MISSING  {name}: {str(why)[:160]}"); n_bad += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ERROR    {name}: {str(e)[:200]}"); n_bad += 1; continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"COLS     {name}: spark={list(a.columns)} duck={list(b.columns)}"); n_bad += 1; continue
        if len(a) != len(b):
            print(f"ROWS     {name}: spark={len(a)} duck={len(b)}"); n_bad += 1; continue
        bad_cols = []
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                ok = np.array_equal(a[c].values, b[c].values, equal_nan=True)
            else:
                ok = a[c].equals(b[c])
            if not ok:
                bad_cols.append(c)
        if bad_cols:
            print(f"DIFF     {name}: cols {bad_cols}")
            for c in bad_cols[:2]:
                neq = a[c].values != b[c].values
                idx = np.nonzero(neq)[0][:3]
                for i in idx:
                    print(f"    row {i} {c}: spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}")
            n_bad += 1
        else:
            print(f"OK       {name} ({len(a)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
