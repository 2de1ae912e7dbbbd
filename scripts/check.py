#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Usage: python scripts/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
named after the parquet tables in <sfDir>, and compares against the
Spark result parquet at <verifyOutDir>/<name>/ — columns sorted by name,
rows sorted by all values, exact equality (with a tiny float tolerance
report so we can see *how* close a mismatch is).

Dev-only tool (driver-side python env); not part of the library.
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        return v
    return v


def compare(name, spark_rows, oracle_rows, spark_cols, oracle_cols):
    if spark_cols != oracle_cols:
        return f"SCHEMA mismatch: spark={spark_cols} oracle={oracle_cols}"
    if len(spark_rows) != len(oracle_rows):
        return f"ROWCOUNT mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    bad = 0
    first = None
    for i, (a, b) in enumerate(zip(spark_rows, oracle_rows)):
        if a != b:
            # allow a diagnostic peek at float closeness
            close = all(
                (x == y) or (isinstance(x, float) and isinstance(y, float)
                             and (math.isnan(x) and math.isnan(y)
                                  or abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))))
                for x, y in zip(a, b))
            bad += 1
            if first is None:
                first = f"row {i}: spark={a} oracle={b} float_close={close}"
    if bad:
        return f"VALUE mismatch in {bad}/{len(spark_rows)} rows; first: {first}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = os.path.join(out_dir, name)
        files = sorted(glob.glob(os.path.join(res_dir, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output at {res_dir}")
            failures += 1
            continue
        try:
            orc = con.sql(sql)
            oracle_cols = sorted(orc.columns)
            # DRIVER-CONTRACT GUARD: the driver pulls oracle rows through
            # pandas, where HUGEINT (DuckDB's type for a bare integer
            # SUM) degrades to float64 and hash-diverges from Spark's
            # int64 on identical values. Any HUGEINT column is therefore
            # a guaranteed driver hash-fail even when check.py (fetchall
            # keeps int) would pass — fail it HERE.
            huge = [c for c, t in zip(orc.columns, orc.types)
                    if str(t) in ("HUGEINT", "UHUGEINT")]
            if huge:
                print(f"FAIL {name}: oracle columns type as HUGEINT "
                      f"(driver pandas bridge degrades to float64): {huge} "
                      f"-- wrap in CAST(... AS BIGINT)")
                failures += 1
                continue
            # The same non-scalar guard as the Spark side: a LIST/ARRAY/
            # STRUCT oracle column crashes the driver's pandas row sorter
            # even though check.py's fetchall would compare it fine.
            # '[' (not '[]') also catches fixed-size ARRAY ("DOUBLE[3]").
            onested = [c for c, t in zip(orc.columns, orc.types)
                       if any(k in str(t) for k in ("[", "STRUCT", "MAP"))]
            if onested:
                print(f"FAIL {name}: non-scalar ORACLE columns "
                      f"(driver pandas row-sorter crashes on these): "
                      f"{[(c, str(t)) for c, t in zip(orc.columns, orc.types) if c in onested]} "
                      f"-- serialize via array_to_string/struct_pack string form")
                failures += 1
                continue
            sel = ", ".join(f'"{c}"' for c in oracle_cols)
            oracle_rows = con.sql(
                f"SELECT {sel} FROM ({sql}) q ORDER BY ALL").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            sp = con.sql(f"SELECT * FROM read_parquet({files!r})")
            spark_cols = sorted(sp.columns)
            # DRIVER-CONTRACT GUARD: a non-scalar Spark output column
            # (array/struct/map) crashes the driver's pandas row sorter
            # ("unhashable type: numpy.ndarray") — serialize via the
            # rawCsv/numCsv convention instead.
            nested = [c for c, t in zip(sp.columns, sp.types)
                      if any(k in str(t) for k in ("[", "STRUCT", "MAP"))]
            if nested:
                print(f"FAIL {name}: non-scalar spark output columns "
                      f"(driver row-sorter crashes on these): "
                      f"{[(c, str(t)) for c, t in zip(sp.columns, sp.types) if c in nested]} "
                      f"-- serialize via rawCsv/numCsv")
                failures += 1
                continue
            sel = ", ".join(f'"{c}"' for c in spark_cols)
            spark_rows = con.sql(
                f"SELECT {sel} FROM read_parquet({files!r}) ORDER BY ALL").fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result read error: {e}")
            failures += 1
            continue
        err = compare(name, spark_rows, oracle_rows, spark_cols, oracle_cols)
        if err:
            print(f"FAIL {name}: {err}")
            failures += 1
        else:
            print(f"OK   {name}: {len(spark_rows)} rows")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
