#!/usr/bin/env python3
"""Dev-loop replica of the driver's DuckDB correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same tables, sorts
columns by name, and compares values exactly. Driver-side tooling only — the
shipped library is pure Scala/Spark.
"""
import json
import sys
import glob

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    s, o = canon(spark_df), canon(oracle_df)
    if list(s.columns) != list(o.columns):
        return f"SCHEMA cols spark={list(s.columns)} oracle={list(o.columns)}"
    if len(s) != len(o):
        return f"ROWS spark={len(s)} oracle={len(o)}"
    for c in s.columns:
        a, b = s[c], o[c]
        # The driver hashes canonical VALUES, so a parquet DECIMAL on one
        # side (pandas object of decimal.Decimal) vs a DOUBLE on the other
        # hash-mismatches even when numerically equal. Coercing both through
        # float here hid exactly that (round-2 q85) — flag it instead.
        if a.dtype.kind != b.dtype.kind and "f" in (a.dtype.kind, b.dtype.kind):
            return (f"TYPE col={c} spark_dtype={a.dtype}/{a.dtype.kind} "
                    f"oracle_dtype={b.dtype}/{b.dtype.kind} "
                    f"(float vs non-float: driver hash would mismatch)")
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a = a.astype(float)
            b = b.astype(float)
            mism = ~((a == b) | (a.isna() & b.isna()))
        else:
            a = a.astype(object).where(pd.notna(a), None)
            b = b.astype(object).where(pd.notna(b), None)
            mism = pd.Series([x != y for x, y in zip(a, b)])
        if mism.any():
            i = int(np.argmax(mism.values))
            return (f"VALUES col={c} row={i} "
                    f"spark={s[c].iloc[i]!r} oracle={o[c].iloc[i]!r} "
                    f"({int(mism.sum())} mismatched rows)")
    return ""


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = qdir.split("/")[-1]
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(spark_df)} rows)")
            n_skip += 1
            continue
        try:
            oracle_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        msg = compare(name, spark_df, oracle_df)
        if msg:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
