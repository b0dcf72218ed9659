#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the oracle SQL from oracle_sql.json in DuckDB over the sfDir tables,
sort columns by name, sort rows, and hash-compare values.
(Not part of the shipped library — the Scala engine never imports this.)
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for tbl in TABLES:
        p = f"{sf_dir}/{tbl}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        files = glob.glob(f"{qdir}/*.parquet")
        got = pq.read_table(files[0]).to_pandas() if files else pd.DataFrame()
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        # exact value compare (incl. float bit-equality via repr)
        mism = []
        for c in g.columns:
            a, b = g[c], e[c]
            if a.dtype.kind == 'M' or b.dtype.kind == 'M':
                a, b = pd.to_datetime(a), pd.to_datetime(b)
                if getattr(a.dt, 'tz', None) is not None:
                    a = a.dt.tz_convert('UTC').dt.tz_localize(None)
                if getattr(b.dt, 'tz', None) is not None:
                    b = b.dt.tz_convert('UTC').dt.tz_localize(None)
                a = a.astype('datetime64[us]')
                b = b.astype('datetime64[us]')
            eq = (a.astype(str) == b.astype(str))
            if not eq.all():
                i = eq.idxmin()
                mism.append(f"{c}[{i}]: {a[i]!r} != {b[i]!r}")
        if mism:
            print(f"FAIL {name}: " + "; ".join(mism[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
