#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB over views of
<sfDir>/*.parquet, and compares: row count, column names, declared types,
and values. Oracle values are fetched via fetchall() (NOT .df()) so that
HUGEINT/DECIMAL stay exact Python ints/Decimals instead of being demoted
to float64 — the driver compares hashes of exact values, and a float64
demotion here can green-light values that differ beyond 2^53.

Type parity is checked too: a Spark int64 column against a DuckDB HUGEINT
(e.g. an uncast SUM) fails the driver's hash compare even when every value
is equal, so it must fail here as well.

Dev tool only — NOT part of the shipped library.
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd
import numpy as np

def load_views(con, sf_dir):
    for f in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

INT_DUCK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
FLOAT_DUCK = {"FLOAT", "DOUBLE"}

def type_mismatch(spark_dtype, duck_type):
    """Returns a message when the declared types cannot hash-match on the
    driver side; None when they are compatible."""
    base = duck_type.split("(")[0].strip().upper()
    if pd.api.types.is_integer_dtype(spark_dtype):
        if base not in INT_DUCK:
            return f"spark {spark_dtype} vs oracle {duck_type} (add CAST(... AS BIGINT) in the oracle SQL)"
    elif pd.api.types.is_float_dtype(spark_dtype):
        if base not in FLOAT_DUCK:
            return f"spark {spark_dtype} vs oracle {duck_type} (add CAST(... AS DOUBLE) in the oracle SQL)"
    return None

def values_equal(x, y):
    if x is None and y is None:
        return True
    if isinstance(x, float) and isinstance(y, float):
        return (x == y) or (math.isnan(x) and math.isnan(y))
    if isinstance(x, float) or isinstance(y, float):
        # one side float, other int — types already flagged; compare numerically
        try:
            return float(x) == float(y)
        except (TypeError, ValueError):
            return False
    return x == y

def cmp_frames(name, spark_df, oracle_cols, oracle_types, oracle_rows):
    ok = True
    msgs = []
    if sorted(spark_df.columns) != sorted(oracle_cols):
        return False, [f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_cols)}"]
    order = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i])
    s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    if len(s) != len(oracle_rows):
        return False, [f"row count differs: spark={len(s)} oracle={len(oracle_rows)}"]
    for pos, i in enumerate(order):
        c = oracle_cols[i]
        tm = type_mismatch(s[c].dtype, oracle_types[i])
        if tm:
            ok = False
            msgs.append(f"col {c}: TYPE mismatch: {tm}")
        sv = s[c].astype(object).where(pd.notnull(s[c]), None).tolist()
        ov = [row[i] for row in oracle_rows]
        neq = [(j, x, y) for j, (x, y) in enumerate(zip(sv, ov))
               if not values_equal(x, y)]
        if neq:
            ok = False
            j, x, y = neq[0]
            extra = ""
            if isinstance(x, (int, float)) and isinstance(y, (int, float)):
                diffs = [abs(float(a) - float(b)) for _, a, b in neq
                         if a is not None and b is not None]
                if diffs:
                    extra = f", max abs diff {max(diffs):.3e}"
            msgs.append(f"col {c}: {len(neq)} mismatches{extra}, first at row {j}: spark={x!r} oracle={y!r}")
    return ok, msgs

def main():
    # optional: --json <path> archives a CORRECTNESS_r*-shaped record
    # (per-query pass/fail + rows + err) — used to check the
    # second-SF sweep in as a round artifact instead of prose
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir, out_dir = args[0], args[1]
    record = {}
    con = duckdb.connect()
    load_views(con, sf_dir)
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = os.path.join(out_dir, name)
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output dir")
            record[name] = {"pass": False, "err": "no spark output dir"}
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in
                                  sorted(glob.glob(f"{pdir}/*.parquet"))])
        except Exception as e:
            print(f"FAIL {name}: cannot read spark parquet: {e}")
            record[name] = {"pass": False, "err": f"unreadable: {e}"}
            n_fail += 1
            continue
        try:
            desc = con.execute("DESCRIBE " + sql).fetchall()
            oracle_cols = [r[0] for r in desc]
            oracle_types = [r[1] for r in desc]
            oracle_rows = con.execute(sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record[name] = {"pass": False, "err": f"oracle SQL error: {e}"}
            n_fail += 1
            continue
        ok, msgs = cmp_frames(name, spark_df, oracle_cols, oracle_types, oracle_rows)
        record[name] = {"pass": bool(ok), "spark_rows": len(spark_df),
                        "oracle_rows": len(oracle_rows),
                        "err": None if ok else "; ".join(msgs)[:500]}
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
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass,
                       "n_fail": n_fail, "queries": record}, f, indent=1)
        print(f"archived {json_out}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
