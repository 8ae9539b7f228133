#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate (NOT part of the
library). Runs each oracle SQL in DuckDB over the same parquet tables,
loads the Spark-side parquet dumped by graft.Verify, and compares
(columns sorted by name, rows sorted, values normalized).

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    """STRICT normalization: raw str() of every value (the driver hashes
    stringified values without rounding — a Decimal('123.40') Spark-side vs
    float 123.4 DuckDB-side is a REAL mismatch we must reproduce locally).
    Only nulls are unified, since their pandas surface form legitimately
    varies by dtype (None vs NaN vs NaT)."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        def conv(v):
            if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
                return "NULL"
            return str(v)
        out[c] = df[c].map(conv)
    df = pd.DataFrame(out).astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = n_noracle = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            status = "NO-ORACLE rows=%d" % len(spark_df)
            n_noracle += 1
            print(f"  {name:28s} {status}")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  {name:28s} ORACLE-ERROR: {e}")
            n_fail += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"  {name:28s} FAIL cols spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
        elif len(a) != len(b):
            print(f"  {name:28s} FAIL rows spark={len(a)} duck={len(b)}")
            n_fail += 1
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff.idxmax()
            print(f"  {name:28s} FAIL values; first diff row {i}:")
            print("    spark:", a.loc[i].to_dict())
            print("    duck :", b.loc[i].to_dict())
            n_fail += 1
        else:
            print(f"  {name:28s} PASS rows={len(a)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
