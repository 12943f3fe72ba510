#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB over views of
<sfDir>/*.parquet, and compares: row count, column names, and values
(exact for non-floats; floats exact too but near-misses reported with
max abs diff so we can see whether a failure is semantic or ulp-level).
Dev tool only — NOT part of the shipped library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_views(con, sf_dir):
    for f in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def cmp_frames(name, spark_df, oracle_df):
    ok = True
    msgs = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        return False, [f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"]
    s, o = canon(spark_df), canon(oracle_df)
    if len(s) != len(o):
        return False, [f"row count differs: spark={len(s)} oracle={len(o)}"]
    # also compare row-order-insensitively (driver convention unknown; we
    # require BOTH orderings to match since queries end in ORDER BY)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = sv.astype(float).to_numpy()
            b = ov.astype(float).to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            eq = (a == b) | both_nan
            if not eq.all():
                d = np.nanmax(np.abs(a - b))
                ok = False
                msgs.append(f"col {c}: {int((~eq).sum())}/{len(a)} float mismatches, max abs diff {d:.3e}")
        else:
            sv = sv.astype(object).where(pd.notnull(sv), None)
            ov = ov.astype(object).where(pd.notnull(ov), None)
            neq = [(i, x, y) for i, (x, y) in enumerate(zip(sv, ov)) if x != y]
            if neq:
                ok = False
                i, x, y = neq[0]
                msgs.append(f"col {c}: {len(neq)} mismatches, first at row {i}: spark={x!r} oracle={y!r}")
    return ok, msgs

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    load_views(con, sf_dir)
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = os.path.join(out_dir, name)
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in
                                  sorted(glob.glob(f"{pdir}/*.parquet"))])
        except Exception as e:
            print(f"FAIL {name}: cannot read spark parquet: {e}")
            n_fail += 1
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok, msgs = cmp_frames(name, spark_df, oracle_df)
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}:")
            for m in msgs:
                print(f"  {m}")
            n_fail += 1
    # queries with no oracle: rows-only check
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                df = pd.concat([pd.read_parquet(f) for f in
                                sorted(glob.glob(f"{p}/*.parquet"))])
                print(f"ROWS {name}: {len(df)} rows (no oracle)")
            except Exception as e:
                print(f"ROWS {name}: unreadable: {e}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
