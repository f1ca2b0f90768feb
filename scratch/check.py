#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Verify dump
(columns sorted by name, rows sorted, exact values)."""
import sys, json, glob, os
import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = []
for name in sorted(oracle):
    if ONLY and name not in ONLY:
        continue
    res_dir = f"{OUT}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    # Read Spark output via pandas/pyarrow (NOT DuckDB): the driver's
    # comparator materializes parquet decimals as decimal.Decimal
    # ("1.50") while the DuckDB oracle side comes back float64 ("1.5"),
    # so reading both sides through DuckDB would mask representation
    # mismatches (this bit us in round 1 on all 12 decimal queries).
    got = pd.read_parquet(res_dir)
    try:
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {str(e)[:200]}"); fails.append(name); continue
    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}")
        fails.append(name); continue
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); fails.append(name); continue
    # exact compare; report first diff
    diff_cols = []
    for c in g.columns:
        a, b = g[c], w[c]
        try:
            eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
        except Exception:
            eq = a == b
        if not eq.all():
            i = (~eq).idxmax()
            diff_cols.append((c, a[i], b[i], int((~eq).sum())))
    if diff_cols:
        print(f"FAIL {name}: {len(g)} rows; diffs: {diff_cols[:3]}")
        fails.append(name)
    else:
        print(f"OK   {name}: {len(g)} rows x {len(g.columns)} cols")

no_oracle = [d.split('/')[-1] for d in glob.glob(f"{OUT}/*") if os.path.isdir(d)
             and d.split('/')[-1] not in oracle]
for n in sorted(no_oracle):
    nrows = con.sql(f"SELECT count(*) FROM '{OUT}/{n}/*.parquet'").fetchone()[0]
    print(f"ROWS {n}: {nrows} (no oracle)")

print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
sys.exit(1 if fails else 0)
