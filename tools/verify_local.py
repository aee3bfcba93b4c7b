#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the shipped
library is pure Scala/Spark; this script exists so oracle SQL can be debugged
before the driver runs it).

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, registers every test table as a DuckDB view,
runs each oracle, and compares values exactly: columns sorted by name, rows
in emitted order, cell-by-cell equality.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a.values == b.values) | (a.isna().values & b.isna().values)
            except Exception:
                eq = a.astype(str).values == b.astype(str).values
            if not eq.all():
                i = int((~eq).argmax())
                mismatch = (c, i, a.iloc[i], b.iloc[i])
                break
        if mismatch:
            c, i, av, bv = mismatch
            print(f"FAIL {name}: col={c} row={i} spark={av!r} oracle={bv!r}")
            n_fail += 1
        else:
            # dtype note (driver may compare schemas)
            dt = [(c, str(got[c].dtype), str(want[c].dtype))
                  for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
            note = f"  [dtype diff: {dt}]" if dt else ""
            print(f"PASS {name} ({len(got)} rows){note}")
            n_pass += 1
    # queries with spark output but no oracle (rows-only check)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle and (not only or name in only):
            try:
                n = len(pd.read_parquet(d))
                print(f"INFO {name}: no oracle, {n} rows")
            except Exception as e:
                print(f"INFO {name}: no oracle, unreadable: {e}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
