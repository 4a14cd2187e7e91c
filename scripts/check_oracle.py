#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching SQL from oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet),
sorts columns by name + rows by all columns, and compares values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = pd.read_parquet(d)
        if name not in oracles:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY?"
            print(f"  {name}: {status} ({len(got)} rows)")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  {name}: ORACLE-SQL-ERROR {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"  {name}: SCHEMA-MISMATCH spark={list(g.columns)} duckdb={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"  {name}: ROWCOUNT-MISMATCH spark={len(g)} duckdb={len(e)}")
            n_fail += 1
            continue
        mismatched = []
        dtype_flags = []
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                # The driver hashes values EXACTLY (str of the parquet value), so an
                # int64-vs-float64 column pair fails there ("123" vs "123.0") even when
                # values are numerically identical. Flag it as a hard failure here so
                # the class (e.g. DuckDB HUGEINT sum -> float64) can't pass locally.
                kinds = {a.dtype.kind, b.dtype.kind}
                if kinds == {"i", "f"} or kinds == {"u", "f"}:
                    dtype_flags.append((c, str(a.dtype), str(b.dtype)))
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    eq = ((a - b).abs() < 1e-12) | (a.isna() & b.isna())
                else:
                    eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
                if not eq.all():
                    mismatched.append((c, int((~eq).sum())))
            except Exception as ex:
                mismatched.append((c, f"cmp-error {ex}"))
        if dtype_flags:
            print(f"  {name}: DTYPE-MISMATCH (int vs float — driver exact hash WILL fail) "
                  f"{[(c, f'spark={sa}', f'duckdb={sb}') for c, sa, sb in dtype_flags]}")
            n_fail += 1
        elif mismatched:
            print(f"  {name}: VALUE-MISMATCH {mismatched}")
            for c, _ in mismatched[:2]:
                bad = (g[c].astype(str) != e[c].astype(str))
                print(f"    {c}: spark={g[c][bad].head(3).tolist()} duckdb={e[c][bad].head(3).tolist()}")
            n_fail += 1
        else:
            print(f"  {name}: PASS ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
