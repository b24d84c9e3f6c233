#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate:
run graft.Verify first (writes <outDir>/<name>.parquet + oracle_sql.json),
then this script runs each oracle SQL in DuckDB over the original parquet
tables and compares: row count, column names (sorted), and a value hash
with columns sorted by name.

Usage: python3 scripts/check_oracle.py <verifyOutDir> <sfDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stable row order: sort by all columns
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    except Exception:
        pass
    return df.reset_index(drop=True)


def value_repr(df: pd.DataFrame) -> list:
    out = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if isinstance(v, float):
                cells.append(f"{v:.6g}")
            else:
                cells.append(str(v))
        out.append("|".join(cells))
    return out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"  {name:24s} SKIP (no spark output)")
            n_skip += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            exp = norm(con.execute(sql).df())
        except Exception as e:
            print(f"  {name:24s} ORACLE ERROR: {e}")
            n_fail += 1
            continue
        ok_cols = list(got.columns) == list(exp.columns)
        ok_rows = len(got) == len(exp)
        ok_vals = ok_cols and ok_rows and value_repr(got) == value_repr(exp)
        if ok_vals:
            print(f"  {name:24s} OK   rows={len(got)}")
            n_pass += 1
        else:
            print(f"  {name:24s} FAIL cols={ok_cols} rows={len(got)}vs{len(exp)}")
            if ok_cols and ok_rows:
                g, e = value_repr(got), value_repr(exp)
                for i, (a, b) in enumerate(zip(g, e)):
                    if a != b:
                        print(f"    first diff row {i}:\n      spark: {a}\n      duck : {b}")
                        break
            else:
                print(f"    spark cols: {list(got.columns)}\n    duck  cols: {list(exp.columns)}")
            n_fail += 1
    print(f"PASS={n_pass} FAIL={n_fail} SKIP={n_skip}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
