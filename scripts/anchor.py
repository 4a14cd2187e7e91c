#!/usr/bin/env python3
"""DuckDB side of the BASELINE.md anchor protocol (same-session twin of
graft.tools.AnchorProbe).

Usage: python3 scripts/anchor.py <sfDir> <oracle_sql.json> [name ...]

Registers <sfDir>/*.parquet as views (the correctness gate's process
model), runs each named query's oracle SQL median-of-3 with fetchall()
(32 threads — DuckDB's default on this host; NOTE the reference itself
pins threads: 1, so this is the STRONG form of the baseline), prints one
JSON line. Run back-to-back with AnchorProbe on an otherwise idle
machine; paste both columns into BASELINE.md.
"""
import sys, json, glob, os, time, statistics
import duckdb

def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracles = json.load(open(oracle_path))
    if not names:
        names = sorted(oracles)
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[: -len(".parquet")]
        # Spark writes <table>.parquet as a DIRECTORY of part files
        # (the ScaleProbe amplified corpora); the driver testdata is
        # single files — accept both.
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    out = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            out[name] = None
            continue
        runs = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            runs.append(time.time() - t0)
        out[name] = round(statistics.median(runs), 3)
    print(json.dumps({"duckdb_median_s": out, "sf": sf_dir,
                      "threads": con.execute("SELECT current_setting('threads')").fetchone()[0]}))

if __name__ == "__main__":
    main()
