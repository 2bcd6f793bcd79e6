#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ spark parquet result, runs the matching
SQL from oracle_sql.json in DuckDB against views over <sfDir>/*.parquet,
sorts columns by name, and compares values exactly (NaN==NaN, None==None).
"""
import json, math, os, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    failures = 0
    for name in sorted(oracles):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir")
            failures += 1
            continue
        try:
            got = norm(pd.read_parquet(spark_dir))
            want = norm(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failures += 1
            continue
        bad = None
        for col in got.columns:
            g, w = got[col].tolist(), want[col].tolist()
            for i, (a, b) in enumerate(zip(g, w)):
                # timestamps: compare as values
                if hasattr(a, "to_pydatetime"):
                    a = a.to_pydatetime()
                if hasattr(b, "to_pydatetime"):
                    b = b.to_pydatetime()
                if not cells_equal(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: col={col} row={i} spark={a!r} duck={b!r}")
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    # queries without oracle: rows-only note
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(os.path.join(out_dir, d)) and d not in oracles:
            n = len(pd.read_parquet(os.path.join(out_dir, d)))
            print(f"NOOR {d} ({n} rows, no oracle)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
