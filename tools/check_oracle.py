#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle_sql.json entry in DuckDB with tables
registered from <sfDir>/*.parquet, sorts columns by name, and compares
values exactly (with a near-miss report for floats).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_skip = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got)})"); n_skip += 1; continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        got, want = normalize(got), normalize(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        ok = True
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    af, bf = a.astype(float), b.astype(float)
                    eq = (af.values == bf.values) | (af.isna().values & bf.isna().values)
                    if not eq.all():
                        i = int(np.argmin(eq))
                        d = abs(af.iloc[i] - bf.iloc[i])
                        print(f"FAIL {name}.{c}: row {i}: {af.iloc[i]!r} vs {bf.iloc[i]!r} (diff {d:.3e}, {int((~eq).sum())} rows)")
                        ok = False
                else:
                    av = a.astype(object).where(pd.notna(a), None)
                    bv = b.astype(object).where(pd.notna(b), None)
                    eq = [x == y or (x is None and y is None) for x, y in zip(av, bv)]
                    if not all(eq):
                        i = eq.index(False)
                        print(f"FAIL {name}.{c}: row {i}: {av.iloc[i]!r} ({type(av.iloc[i]).__name__}) vs {bv.iloc[i]!r} ({type(bv.iloc[i]).__name__}), {sum(1 for e in eq if not e)} rows differ")
                        ok = False
            except Exception as e:
                print(f"FAIL {name}.{c}: compare error {e}"); ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} no-oracle ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
