#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads a Verify output dir (query parquet dirs + oracle_sql.json), runs each
oracle SQL in DuckDB over the sf parquet tables, and compares: columns
sorted by name, rows sorted, exact value equality (with float diagnostics).

Usage: dev/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    con = duckdb.connect()
    return con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    names = sorted(set(list(oracle.keys()) + [os.path.basename(d) for d in glob.glob(out_dir + "/*") if os.path.isdir(d)]))
    for name in names:
        if only and name not in only:
            continue
        got = load_result(os.path.join(out_dir, name))
        if got is None:
            print(f"[FAIL] {name}: no spark result")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows (no oracle)")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = normalize(got.copy()), normalize(exp.copy())
        if list(g.columns) != list(e.columns):
            print(f"[FAIL] {name}: columns differ: spark={list(g.columns)} oracle={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"[FAIL] {name}: row counts differ: spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        if g.equals(e):
            print(f"[PASS] {name}: {len(g)} rows")
            n_pass += 1
            continue
        # diagnose
        bad = []
        for c in g.columns:
            if not g[c].equals(e[c]):
                try:
                    import numpy as np
                    diff = (pd.to_numeric(g[c]) - pd.to_numeric(e[c])).abs().max()
                    bad.append(f"{c} (max abs diff {diff})")
                except Exception:
                    neq = (g[c] != e[c])
                    i = neq.idxmax()
                    bad.append(f"{c} (e.g. row {i}: {g[c][i]!r} vs {e[c][i]!r})")
        print(f"[FAIL] {name}: value mismatch in: {', '.join(bad)}")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
