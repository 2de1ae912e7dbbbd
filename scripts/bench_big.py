#!/usr/bin/env python
"""DuckDB side of the data-dominating headline bench.

Usage: python scripts/bench_big.py <bigDir> <oracle_sql.json> [reps]

Runs the 5 headline oracle SQLs over the MakeBigData layout with the
same engine-side reducer as graft.BenchBig (`SELECT sum(hash(t)) FROM
(<sql>) t` — forces full output computation, returns one row, so client
transfer is never timed). 32 threads, warm run + best of reps.
Dev-only tool (driver-side python env); not part of the library.
"""
import glob
import json
import os
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
HEADLINE = [
    "scan_full_width", "q1_pricing_summary", "q1_pricing_summary_cents",
    "join_orders_customer", "metric_gauc", "metric_gauc_sorted",
    "dedup_block_roundtrip",
]


def main():
    big_dir, oracle_path = sys.argv[1:3]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    with open(oracle_path) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in TABLES:
        p = os.path.join(big_dir, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    out = {}
    for name in HEADLINE:
        wrapped = f"SELECT sum(hash(t)::DOUBLE) FROM ({oracle[name]}) t"
        con.sql(wrapped).fetchall()  # warm
        best = min(timed(con, wrapped) for _ in range(reps))
        out[name] = round(best, 3)
    print(json.dumps({"queries": out, "sf": big_dir}))


def timed(con, sql):
    t0 = time.time()
    con.sql(sql).fetchall()
    return time.time() - t0


if __name__ == "__main__":
    main()
