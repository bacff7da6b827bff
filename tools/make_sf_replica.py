#!/usr/bin/env python3
"""Build an N-fold scale replica of a testdata dir via key-offset
replication, preserving referential integrity (customer/order/part/
supplier keys offset consistently across fact tables). Dimension
tables region/nation are copied as-is. Key offsets are decimal powers
above the source max, so modulo-derived attributes (doc_id % 3 media
type, portableBucket splits, etc.) stay uniformly distributed.

events.ts is preserved at its source physical type — the repo's
Tables.events adapts to any generation (nanos-as-long, timestamp[us],
NTZ).

Usage: make_sf_replica.py SRC_DIR DST_DIR FACTOR
e.g.:  make_sf_replica.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys
import duckdb

SRC, DST, N = sys.argv[1], sys.argv[2], int(sys.argv[3])

# table -> columns to offset (each by a power-of-10 stride > its max)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]

# one stride per underlying ENTITY so fks stay aligned across tables
ENTITY_OF = {
    "c_custkey": "cust", "o_custkey": "cust",
    "s_suppkey": "supp", "l_suppkey": "supp",
    "p_partkey": "part", "l_partkey": "part",
    "o_orderkey": "ord", "l_orderkey": "ord",
    "event_id": "evt", "user_id": "usr",
    "doc_id": "doc", "vec_id": "vec",
}

con = duckdb.connect()
import os
os.makedirs(DST, exist_ok=True)

stride = {}
for table, cols in KEYED.items():
    for c in cols:
        ent = ENTITY_OF[c]
        if ent in stride:
            continue
        mx = con.execute(
            f"SELECT max({c}) FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchone()[0]
        s = 1
        while s <= mx:
            s *= 10
        stride[ent] = s

for t in COPY:
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

for t, cols in KEYED.items():
    exprs = []
    schema = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
    ).fetchall()
    names = [r[0] for r in schema]
    for name in names:
        if name in cols:
            exprs.append(f"{name} + r.i * {stride[ENTITY_OF[name]]} AS {name}")
        else:
            exprs.append(name)
    sel = ", ".join(exprs)
    con.execute(
        f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
        f"(SELECT unnest(range({N})) AS i) r) "
        f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows (x{N})")
