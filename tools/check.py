#!/usr/bin/env python3
"""Dev-only harness mimic: run graft.Verify output vs DuckDB oracle.

Not part of the shipped library (driver-side python per the environment
contract). Usage:
    python3 tools/check.py [sfdir] [outdir]
Assumes `sbt -batch "runMain graft.Verify <sfdir> <outdir>"` already ran
(or pass --run to run it here).
"""
import json, sys, subprocess, glob, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types a bit: timestamps -> int us, floats stay
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    # rows-only queries (no oracle): assert spark output exists and has rows
    all_dirs = {d for d in os.listdir(OUT) if os.path.isdir(f"{OUT}/{d}")}
    for name in sorted(all_dirs - set(oracle)):
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        if n > 0:
            print(f"PASS {name} (rows-only, {n} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: rows-only query returned no rows"); n_fail += 1
    for name, sql in sorted(oracle.items()):
        pdir = f"{OUT}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        except Exception as e:
            print(f"FAIL {name}: read error {e}"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {str(e).splitlines()[0][:160]}"); n_fail += 1; continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"); n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); n_fail += 1; continue
        # dtype-strict: the driver's hash is dtype-sensitive (DuckDB
        # sum(BIGINT) is HUGEINT, not BIGINT) — local green must predict
        # driver green, so int64 vs float64/object must FAIL here.
        sd, dd = [str(t) for t in s.dtypes], [str(t) for t in d.dtypes]
        if sd != dd:
            diff = {c: (a, b) for c, a, b in zip(s.columns, sd, dd) if a != b}
            print(f"FAIL {name}: dtypes {diff}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(s, d, check_dtype=True, check_exact=True)
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
        except AssertionError as e:
            msg = str(e).splitlines()
            print(f"FAIL {name}: {' | '.join(msg[:3])}")
            # show first differing rows
            neq = (s != d) & ~(s.isna() & d.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print("  spark:", s.loc[i].to_dict())
                print("  duck :", d.loc[i].to_dict())
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main())
