#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.
Usage: oracle_check.py <sfDir> <verifyOutDir>
Compares each <outDir>/<name> parquet against oracle_sql.json run in DuckDB
over the sfDir tables. Sorts columns by name, rounds floats, compares values.
"""
import sys, json, glob, os
import duckdb, pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out}/oracle_sql.json"))
def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == 'float64':
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

npass = nfail = 0
for name, sql in sorted(oracles.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"MISS  {name}: no spark output"); nfail += 1; continue
    try:
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
        duck_df = canon(con.execute(sql).fetchdf())
    except Exception as e:
        print(f"ERR   {name}: {e}"); nfail += 1; continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"SCHEMA {name}: spark={list(spark_df.columns)} duck={list(duck_df.columns)}"); nfail += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"ROWS  {name}: spark={len(spark_df)} duck={len(duck_df)}"); nfail += 1; continue
    try:
        sd = spark_df.astype(str).values.tolist(); dd = duck_df.astype(str).values.tolist()
    except Exception as e:
        print(f"ERR   {name}: {e}"); nfail += 1; continue
    if sd == dd:
        print(f"PASS  {name} ({len(spark_df)} rows)"); npass += 1
    else:
        diffs = [(a,b) for a,b in zip(sd,dd) if a!=b][:3]
        print(f"VALS  {name}: first diffs {diffs}"); nfail += 1
print(f"\n{npass} pass / {nfail} fail of {len(oracles)}")
