#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate: read each
queries/<name> parquet written by graft.Verify, run the matching oracle SQL
in DuckDB over the same sf dir, and compare schema + sorted values.

Usage: verify_local.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written table dir (e.g. a TenX build)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def normalize(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, ignore_index=True)
    return df

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_path = f"{out_dir}/{name}"
    files = glob.glob(f"{spark_path}/*.parquet")
    if not files:
        fails.append(name); print(f"[FAIL] {name}: no spark output"); continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append(name); print(f"[FAIL] {name}: {e}"); continue
    g, e = normalize(got), normalize(exp)
    if list(g.columns) != list(e.columns):
        fails.append(name)
        print(f"[FAIL] {name}: columns {list(g.columns)} != {list(e.columns)}")
        continue
    if len(g) != len(e):
        fails.append(name)
        print(f"[FAIL] {name}: rows {len(g)} != {len(e)}")
        continue
    gt, et = [str(t) for t in g.dtypes], [str(t) for t in e.dtypes]
    if gt != et:
        print(f"[WARN] {name}: dtypes {gt} != {et}")
    diff = (g.astype(str) != e.astype(str))
    ndiff = int(diff.any(axis=1).sum())
    if ndiff:
        fails.append(name)
        print(f"[FAIL] {name}: {ndiff}/{len(g)} rows differ")
        bad = diff.any(axis=1)
        print("  spark:", g[bad].head(3).to_dict("records"))
        print("  duck :", e[bad].head(3).to_dict("records"))
    else:
        print(f"[ok]   {name}: {len(g)} rows match")

print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
sys.exit(1 if fails else 0)
