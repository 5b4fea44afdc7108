#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Registers each <sfDir>/*.parquet as a DuckDB view, runs every oracle SQL
from <verifyOutDir>/oracle_sql.json, and compares against the Spark result
parquet in <verifyOutDir>/<name>/ — columns sorted by name, exact value
compare with a report of any float deltas.
"""
import duckdb, glob, json, os, sys
import pandas as pd

def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        spark_dir = f"{outdir}/{name}"
        parts = glob.glob(f"{spark_dir}/*.parquet")
        if not parts:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in sorted(parts)])
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}")
            failures += 1
            continue
        got, exp = got[gc].reset_index(drop=True), exp[gc].reset_index(drop=True)
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            failures += 1
            continue
        ok = True
        for c in gc:
            g, e = got[c], exp[c]
            if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                import numpy as np
                ga, ea = g.to_numpy(dtype=float), e.to_numpy(dtype=float)
                both_nan = pd.isna(ga) & pd.isna(ea)
                neq = ~both_nan & (ga != ea)
                if neq.any():
                    d = abs(ga[neq] - ea[neq]).max()
                    print(f"FAIL {name}: col {c} differs on {neq.sum()} rows, maxdelta={d}")
                    ok = False
            else:
                neq = ~(g.isna() & e.isna()) & (g.astype(str) != e.astype(str))
                if neq.any():
                    i = neq.idxmax()
                    print(f"FAIL {name}: col {c} differs on {neq.sum()} rows, first at {i}: spark={g[i]!r} oracle={e[i]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
        else:
            failures += 1
    # queries with no oracle: rows-only note
    for d in sorted(glob.glob(f"{outdir}/*/")):
        qn = os.path.basename(d.rstrip('/'))
        if qn not in oracle:
            n = sum(len(pd.read_parquet(p)) for p in glob.glob(f"{d}/*.parquet"))
            print(f"NOTE {qn}: no oracle, rows={n}")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
