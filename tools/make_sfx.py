#!/usr/bin/env python3
"""Materialize a multiplied copy of a testdata SF directory (the
ScaleProbe id-shifted-union trick, at rest) so the FULL bench basket
can run end-to-end at sf1-scale — per-family x10 probes can't catch
cross-query interference (codegen-cache pressure, JVM/cache pollution)
that only a whole-basket run exposes.

Usage: python3 tools/make_sfx.py <srcDir> <dstDir> [mult]

Join keys shift consistently across tables (l_orderkey with
o_orderkey, l_suppkey with s_suppkey, ...); nation/region stay fixed
(dimension tables — their keys are referenced unshifted). Timestamps
are copied verbatim: the multiplied corpus is the same time range at
mult-x the key cardinality, which is how these tables grow in
production (more cameras/users, same clock).

CUSTOMER is also FIXED (copied verbatim) and o_custkey stays
unshifted across order copies: customer is the geo ZONE CATALOG of
j7_geo_range_join / g_route_eta, and multiplying it stacked mult
exact-position zone duplicates into the same 0.2-deg box — candidate
pairs grew mult^2 (the 23-31x sf1 ratio rows of rounds 14-16, a
fixture artifact re-adjudicated every round; the ScaleProbe
fixed-catalog series pins the production shape as answer-linear).
Fixed catalog + mult-x orders per customer IS the production growth
shape: more traffic against the same zone/camera catalog. Dev tool
only — NOT part of the shipped library.
"""
import sys, os
import duckdb

src, dst = sys.argv[1], sys.argv[2]
mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 32")

# table -> {column: shift-per-copy}; absent tables copy verbatim
SHIFTS = {
    "events": {"event_id": 10**12, "user_id": 10**7},
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
    "customer": None,  # geo zone catalog: fixed, like nation/region
    "orders": {"o_orderkey": 10**9},  # o_custkey unshifted -> fixed base
    "lineitem": {"l_orderkey": 10**9, "l_partkey": 10**7,
                 "l_suppkey": 10**5},
    "part": {"p_partkey": 10**7},
    "supplier": {"s_suppkey": 10**5},
    "nation": None,   # dimensions: copy verbatim, keys referenced
    "region": None,   # unshifted by every fact copy
}

for table, shifts in SHIFTS.items():
    p = os.path.join(src, f"{table}.parquet")
    out = os.path.join(dst, f"{table}.parquet")
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{p}')").fetchall()]
    if not shifts:
        sel = [f"SELECT * FROM read_parquet('{p}')"]
    else:
        sel = []
        for i in range(mult):
            proj = ", ".join(
                f"{c} + {i * shifts[c]} AS {c}" if c in shifts else c
                for c in cols)
            sel.append(f"SELECT {proj} FROM read_parquet('{p}')")
    con.execute(f"COPY ({' UNION ALL '.join(sel)}) TO '{out}' "
                f"(FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')")\
        .fetchone()[0]
    print(f"{table:12s} -> {n:>12,} rows")
print(f"done: {dst} at x{mult}")
