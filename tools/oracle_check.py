#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Registers each fixture parquet as a DuckDB view named after the table,
runs every oracle_sql.json entry, and compares against the Spark parquet
dump (columns sorted by name, rows sorted, values stringified). This is
NOT part of the library — it validates that SparkEntry.oracleSql is
DuckDB-runnable and value-identical before the driver grades it.
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"[MISS] {name}: no spark output"); fail += 1; continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"[ORACLE-ERR] {name}: {e}"); fail += 1; continue
    sdf = con.execute(
        f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.astype(str)
        return sorted(map(tuple, df.values.tolist()))
    co, cs = canon(odf), canon(sdf)
    if list(odf.columns.sort_values()) != list(sdf.columns.sort_values()):
        print(f"[COLS] {name}: oracle={sorted(odf.columns)} spark={sorted(sdf.columns)}")
        fail += 1
    elif co != cs:
        diff = [(a, b) for a, b in zip(co, cs) if a != b][:3]
        print(f"[VALS] {name}: rows o={len(co)} s={len(cs)} first diffs: {diff}")
        fail += 1
    else:
        print(f"[OK]   {name}: {len(co)} rows")
sys.exit(1 if fail else 0)
