#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare row/schema/hash against the
Verify output parquet. Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("int64")
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = canon(con.sql(sql).df())
        act = canon(pd.read_parquet(os.path.join(out_dir, name)))
        if list(exp.columns) != list(act.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} act={list(act.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(act):
            print(f"FAIL {name}: rows exp={len(exp)} act={len(act)}")
            n_fail += 1
            continue
        diff = (exp != act) & ~(exp.isna() & act.isna())
        if diff.any().any():
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} differing rows of {len(exp)}")
            print("  expected:", exp[bad].head(3).to_dict("records"))
            print("  actual:  ", act[bad].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    except Exception as e:
        print(f"ERROR {name}: {e}")
        n_fail += 1

# rows-only queries (no oracle)
for d in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, d)
    if os.path.isdir(path) and d not in oracle:
        n = len(pd.read_parquet(path))
        print(f"ROWS {d}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
