#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
sfDir parquet tables, and compares: schema (column names), row count, and a
value hash over rows sorted by all columns with columns sorted by name.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for _, row in df.iterrows():
        for v in row:
            h.update(repr(v).encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                    if os.path.isdir(p)])
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}"); n_fail += 1; continue
        # dtype-tolerant compare first, then strict hash
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            eq = True
        except AssertionError as e:
            eq = False
            msg = str(e).split("\n")[0:3]
        if not eq:
            print(f"FAIL {name}: values differ: {msg}"); n_fail += 1; continue
        hg, hw = value_hash(g), value_hash(w)
        strict = "hash=OK" if hg == hw else f"hash=DIFF (dtype repr; spark={g.dtypes.to_dict()} duck={w.dtypes.to_dict()})"
        print(f"PASS {name}: {len(g)} rows {strict}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
