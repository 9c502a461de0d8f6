#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB against the
parquet tables in sfDir, reads the Spark result parquet from
outDir/<name>/, and compares: row count, column names, and values
(columns sorted by name, rows sorted). Run `sbt "runMain graft.Verify
<sfDir> <outDir>"` first.
"""
import json
import sys
import glob

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for compare
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    with open(f"{out}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        # dtype report
        dt_mismatch = [(c, str(got[c].dtype), str(exp[c].dtype))
                       for c in sorted(got.columns)
                       if str(got.sort_index(axis=1)[c].dtype) != str(exp.sort_index(axis=1)[c].dtype)]
        ok = True
        for c in g.columns:
            if pd.api.types.is_float_dtype(g[c]):
                a, b = g[c].to_numpy(), e[c].to_numpy()
                same = (np.isnan(a) & np.isnan(b)) | (a == b)
                if not same.all():
                    bad = np.where(~same)[0][:3]
                    print(f"FAIL {name}: col {c} value diff at {bad}: "
                          f"{a[bad]} vs {b[bad]} (maxdiff={np.nanmax(np.abs(a - b))})")
                    ok = False
                    break
            else:
                if not g[c].equals(e[c]):
                    neq = g[c] != e[c]
                    bad = neq[neq].index[:3].tolist()
                    print(f"FAIL {name}: col {c} diff at rows {bad}: "
                          f"spark={g[c].iloc[bad].tolist()} oracle={e[c].iloc[bad].tolist()}")
                    ok = False
                    break
        if ok:
            note = f" (dtype note: {dt_mismatch})" if dt_mismatch else ""
            print(f"PASS {name}: {len(got)} rows{note}")
            n_pass += 1
        else:
            n_fail += 1
    # rows-only queries: spark outputs without oracle entries
    for d in sorted(glob.glob(f"{out}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracles:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {name}: rows-only check, {n} rows")
            if n > 0:
                n_pass += 1
            else:
                n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
