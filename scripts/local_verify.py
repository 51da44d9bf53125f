#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness check (dev tool only —
the shipped library never depends on this).

Usage: python3 scripts/local_verify.py <sfDir> <outDir>
  after: sbt "runMain graft.Verify <sfDir> <outDir>"

For each <outDir>/<name> parquet dump, runs the matching oracle SQL from
<outDir>/oracle_sql.json in DuckDB (tables registered as bare names over
<sfDir>/*.parquet) and compares: column names (sorted), row count, and
cell values (exact for non-floats, tiny epsilon report for floats).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noracle = 0
    for d in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, d)
        if not os.path.isdir(full):
            continue
        got = norm(pd.read_parquet(full))
        if d not in oracles:
            print(f"[no-oracle] {d}: rows={len(got)}")
            n_noracle += 1
            continue
        try:
            exp = norm(con.sql(oracles[d]).df())
        except Exception as e:
            print(f"[FAIL] {d}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL] {d}: columns {list(got.columns)} != {list(exp.columns)}")
            ok = False
        elif len(got) != len(exp):
            print(f"[FAIL] {d}: rows {len(got)} != {len(exp)}")
            ok = False
        else:
            for c in got.columns:
                g, e = got[c], exp[c]
                if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
                    ga = g.astype(float).to_numpy()
                    ea = e.astype(float).to_numpy()
                    both_nan = np.isnan(ga) & np.isnan(ea)
                    # FAIL beyond a tiny epsilon; additionally WARN when
                    # not bit-exact (the driver's hash compare is exact,
                    # so a sub-epsilon drift still deserves eyes).
                    diff = ~both_nan & ~np.isclose(ga, ea, rtol=0, atol=1e-9, equal_nan=True)
                    inexact = ~both_nan & (ga != ea) & ~diff
                    if diff.any():
                        i = int(np.argmax(diff))
                        print(f"[FAIL] {d}.{c}: {diff.sum()} float cells differ "
                              f"(first row {i}: {ga[i]!r} vs {ea[i]!r})")
                        ok = False
                    elif inexact.any():
                        i = int(np.argmax(inexact))
                        print(f"[warn] {d}.{c}: {inexact.sum()} float cells within "
                              f"1e-9 but not bit-exact (driver hashes exactly; "
                              f"first row {i}: {ga[i]!r} vs {ea[i]!r})")
                else:
                    ge = g.astype(object).where(pd.notna(g), None)
                    ee = e.astype(object).where(pd.notna(e), None)
                    # tolerate type representation differences by str compare fallback
                    neq = [i for i in range(len(ge))
                           if ge.iloc[i] != ee.iloc[i] and str(ge.iloc[i]) != str(ee.iloc[i])]
                    if neq:
                        i = neq[0]
                        print(f"[FAIL] {d}.{c}: {len(neq)} cells differ "
                              f"(first row {i}: {ge.iloc[i]!r} vs {ee.iloc[i]!r})")
                        ok = False
        if ok:
            print(f"[ok] {d}: rows={len(got)}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\npass={n_pass} fail={n_fail} no-oracle={n_noracle}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
