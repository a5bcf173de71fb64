#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and diff against the Spark result dumped
by graft.Verify. Usage: oracle_check.py <sfDir> <outDir>."""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1
        elif len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
        else:
            try:
                pd.testing.assert_frame_equal(spark_df, duck_df, check_dtype=False,
                                              check_exact=True)
                print(f"PASS {name} ({len(spark_df)} rows)")
                n_pass += 1
            except AssertionError as e:
                print(f"FAIL {name}: values differ: {str(e)[:400]}")
                n_fail += 1
    # rows-only queries (no oracle)
    for p in sorted(glob.glob(f"{out_dir}/*/")):
        name = p.rstrip("/").split("/")[-1]
        if name not in oracles:
            files = glob.glob(f"{p}*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS {name}: {n}")
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracles)} oracled")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
