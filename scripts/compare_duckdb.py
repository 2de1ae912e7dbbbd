#!/usr/bin/env python
"""Generate a Spark-vs-DuckDB timing table.

Usage: python scripts/compare_duckdb.py <sfDir> <bench.json> <oracle_sql.json>

Runs each oracle SQL in DuckDB (32 threads, warmed) and prints a markdown
table against the Spark timings from the Bench JSON line. Dev-only tool.
"""
import json
import os
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir, bench_path, oracle_path = sys.argv[1:4]
    with open(bench_path) as f:
        line = f.read()
        bench = json.loads(line[line.index("{"):])
    with open(oracle_path) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    rows = []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            con.sql(sql).fetchall()  # warm
            t0 = time.time()
            con.sql(sql).fetchall()
            dt = time.time() - t0
        except Exception:
            dt = float("nan")
        spark = bench["queries"].get(name)
        rows.append((name, spark, dt))
    print("| query | spark (s) | duckdb (s) | ratio |")
    print("|---|---|---|---|")
    for name, s, d in rows:
        if s is None:
            continue
        ratio = "n/a" if d != d or d == 0 else f"{s / d:.1f}x"
        print(f"| {name} | {s:.2f} | {d:.3f} | {ratio} |")


if __name__ == "__main__":
    main()
