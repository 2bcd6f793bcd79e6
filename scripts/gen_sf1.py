#!/usr/bin/env python3
"""Scale the driver's sf0.1 fixtures to an sf1-equivalent bench corpus.

Bench-soak tooling only (round 10, VERDICT r9 #6) — the library never
reads this; it exists so `graft.Bench` can run once at ~10x volume and
show which queries scale linearly and which don't. Ten key-shifted
replicas preserve referential integrity (customer/orders/lineitem/
part/supplier key spaces shift together), keep the events TIME SPAN
fixed (so the wheel's time-bounded claims are actually exercised at
10x rows/slot), and suffix document text per replica (so the dedup
family sees realistic near-dup density, not a 10x all-dup corpus).
Dimension tables (region/nation) stay as-is.

Usage: python3 scripts/gen_sf1.py [src=/root/testdata/sf0.1] [dst=.bench/sf1]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else ".bench/sf1"
N = 10

# table -> (key columns to shift, text column to suffix or None)
PLAN = {
    "customer": (["c_custkey"], None),
    "orders": (["o_orderkey", "o_custkey"], None),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], None),
    "part": (["p_partkey"], None),
    "supplier": (["s_suppkey"], None),
    "events": (["event_id", "user_id"], None),
    "documents": (["doc_id"], "text"),
    "embeddings": (["vec_id"], None),
}
COPY_AS_IS = ["region", "nation"]


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet'")
        print(f"{t}: copied")
    for t, (keys, text_col) in PLAN.items():
        src = f"'{SRC}/{t}.parquet'"
        offs = {k: con.execute(f"SELECT max({k})+1 FROM {src}").fetchone()[0]
                for k in keys}
        cols = [f.name for f in __import__("pyarrow.parquet", fromlist=["x"])
                .read_schema(f"{SRC}/{t}.parquet")]
        selects = []
        for i in range(N):
            exprs = []
            for c in cols:
                if c in offs and i > 0:
                    exprs.append(f"{c} + {i * offs[c]} AS {c}")
                elif c == text_col and i > 0:
                    exprs.append(f"{c} || ' r{i}' AS {c}")
                else:
                    exprs.append(c)
            selects.append(f"SELECT {', '.join(exprs)} FROM {src}")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{DST}/{t}.parquet'")
        n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
