#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

Registers each parquet table as a DuckDB view, runs every oracle SQL from
oracle_sql.json, and compares against the Spark result parquet: columns
sorted by name, rows sorted by all columns, values stringified (the
driver hashes, so we demand exact equality after that normalization).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify like a hash would see it: stable float repr
    def cell(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)
    out = df.applymap(cell) if hasattr(df, "applymap") else df.map(cell)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    # astype(str): a zero-row frame keeps its source dtypes through the
    # cell map, and DataFrame.equals compares dtypes even with no rows —
    # an empty int32 vs int64 pair would read as a value mismatch
    return out.astype(str)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING {name}: no spark result")
            n_fail += 1
            continue
        try:
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in spark_files])
        o, s = normalize(oracle_df), normalize(spark_df)
        if list(o.columns) != list(s.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
            n_fail += 1
        elif len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            n_fail += 1
        elif not o.equals(s):
            diff = (o != s).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch, first rows:")
            for i in idx:
                print(f"  oracle: {o.loc[i].to_dict()}")
                print(f"  spark : {s.loc[i].to_dict()}")
            n_fail += 1
        else:
            n_pass += 1
    # queries without oracle → rows-only check
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if os.path.isdir(d) and name not in oracles:
            files = glob.glob(f"{d}/*.parquet")
            rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            status = "ok" if rows > 0 else "EMPTY"
            print(f"NOORACLE {name}: rows={rows} {status}")
    print(f"\n{n_pass} passed, {n_fail} failed of {len(oracles)} oracled queries")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
