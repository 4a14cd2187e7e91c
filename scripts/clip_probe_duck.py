#!/usr/bin/env python3
"""DuckDB side of tools/ClipProbe: time the CLIP gate ALONE over the
same pre-materialized paired table the Spark probe wrote, plus the
fixture projection alone over the amplified embeddings — so the
operator-grain and fixture-grain ratios share one protocol
(median-of-3, fetchall, 32 threads).

Usage: python3 scripts/clip_probe_duck.py [pairedDir] [sfDir]
"""
import sys, os, glob, time, json, statistics
import duckdb

def main():
    paired = sys.argv[1] if len(sys.argv) > 1 else "/tmp/clip_paired"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_64"
    con = duckdb.connect()
    pat = f"{paired}/*.parquet" if os.path.isdir(paired) else paired
    con.execute(f"CREATE VIEW paired AS SELECT * FROM read_parquet('{pat}')")
    emb = os.path.join(sf_dir, "embeddings.parquet")
    epat = f"{emb}/*.parquet" if os.path.isdir(emb) else emb
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{epat}')")
    # mirrors the BOARD oracle's CTE shape (dot/ni/nt computed once in an
    # inner SELECT, clip_pass derived from the columns) so the DuckDB
    # denominator is measured on the same plan shape as the board query —
    # the previous flat SELECT inlined the dot-product lambda four times
    # and, if DuckDB's CSE does not fully deduplicate it, inflated gate_s
    # (ADVICE r20; both forms measured 2026-08-19: see BASELINE.md)
    gate_sql = """
      WITH s AS (
        SELECT media_id,
               CAST(list_sum(list_transform(generate_series(1, len(iq)),
                    i -> iq[i] * tq[i])) AS BIGINT) AS dot,
               CAST(list_sum(list_transform(iq, x -> x * x)) AS BIGINT) AS ni,
               CAST(list_sum(list_transform(tq, x -> x * x)) AS BIGINT) AS nt
        FROM paired)
      SELECT media_id, dot, ni, nt,
             (dot > 0 AND dot::HUGEINT * dot * 10000 >= ni::HUGEINT * nt * 784) AS clip_pass
      FROM s"""
    # the COMPLETE pair construction (quantize AND sign-flip), matching
    # ClipProbe.scala's fixture and the board oracle's e+p CTEs — an
    # iq-only form would omit half the work and inflate the
    # fixture-grain Spark/DuckDB ratio this probe exists to attribute
    fixture_sql = """
      WITH e AS (
        SELECT vec_id AS media_id,
               list_transform(embedding, x -> CAST(round(x * 100) AS BIGINT)) AS iq
        FROM embeddings)
      SELECT media_id, iq,
             list_transform(generate_series(1, len(iq)),
               i -> CASE WHEN i <= media_id % 48 THEN -iq[i] ELSE iq[i] END) AS tq
      FROM e"""

    def med3(sql):
        runs = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            runs.append(time.time() - t0)
        return round(statistics.median(runs), 3)

    print(json.dumps({
        "gate_s": med3(gate_sql),
        "fixture_s": med3(fixture_sql),
        "paired": paired, "sf": sf_dir,
    }))

if __name__ == "__main__":
    main()
