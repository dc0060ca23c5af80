#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
sf dir and compare (columns sorted by name, rows sorted, values compared
with float tolerance-free equality after normalization)."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# one shared reader for the Spark-result parquet reads: a fresh
# connection per query leaks its buffer manager for the whole run and
# starves the oracle connection on big-SF sweeps
reader = duckdb.connect()

def norm(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif str(df[c].dtype) in ("int32","int64","Int32","Int64","uint32"):
            df[c] = df[c].astype("float64")  # unify int widths
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

ok = fail = 0
# iterate the ORACLE keys ∪ present dirs: a query whose Verify write
# failed entirely (no dir at all) must count as a failure, not vanish
dirs = {d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d))}
for name in sorted(dirs | set(oracle)):
    path = os.path.join(out_dir, name)
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        print(f"MISSING-OUT  {name}")
        fail += 1
        continue
    spark_df = reader.execute(
        f"SELECT * FROM parquet_scan({files!r})").df()
    if name not in oracle:
        print(f"NO-ORACLE    {name:24s} rows={len(spark_df)}")
        continue
    try:
        ora_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"ORACLE-ERR   {name}: {e}")
        fail += 1
        continue
    a, b = norm(spark_df.copy()), norm(ora_df.copy())
    rows = len(a) == len(b)
    schema = list(a.columns) == list(b.columns)
    if rows and schema:
        try:
            eq = a.equals(b)
            if not eq:
                cmp = (a.fillna("<NA>") == b.fillna("<NA>"))
                eq = bool(cmp.all().all())
        except Exception:
            eq = False
    else:
        eq = False
    if eq:
        ok += 1
        print(f"OK           {name:24s} rows={len(a)}")
    else:
        fail += 1
        print(f"MISMATCH     {name:24s} spark_rows={len(a)} oracle_rows={len(b)} "
              f"schema_spark={list(a.columns)} schema_oracle={list(b.columns)}")
        if rows and schema:
            diff_mask = ~(a.fillna('<NA>') == b.fillna('<NA>')).all(axis=1)
            print("  first diffs (spark | oracle):")
            print(pd.concat([a[diff_mask].head(3), b[diff_mask].head(3)], axis=1).to_string()[:2000])
print(f"\n{ok} ok, {fail} fail, {len([n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir,n))])-ok-fail} rows-only")
