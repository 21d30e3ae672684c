"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the same sf, compare row count + sorted-column value multiset.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       python scripts/check_oracle.py [sf_dir] --sample N --seed S

``--sample N --seed S`` checks a deterministic rotating subset of N
registered queries (seeded shuffle of the sorted name list) — the
round-verify recipe runs one rotated sample per round at sf0.1 so
every query is eventually exercised at a scale beyond the driver's
fixed 50-query sf0.01 window (VERDICT r6 "Next round" #8). Use the
round number as the seed so consecutive rounds cover different slices.
"""

from __future__ import annotations

import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from datas_spark.session import get_spark
from datas_spark.io.sources import TPCH_TABLES


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    args = sys.argv[1:]
    sample_n, seed = None, 0
    if "--sample" in args:
        i = args.index("--sample")
        sample_n = int(args[i + 1])
        del args[i : i + 2]
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        print(f"FATAL unknown query names: {sorted(unknown)}")
        return 2
    if sample_n is not None:
        names = sorted(queries)
        random.Random(seed).shuffle(names)
        only = set(names[:sample_n]) | only
        print(f"sample: {sample_n} queries, seed {seed}")
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            failed.append(name)
            continue
        srow_py = [[r[c] for c in scols] for r in srows]
        a, b = _canon(srow_py, scols), _canon(orows, ocols)
        if len(a) != len(b):
            print(f"FAIL  {name}: rowcount {len(a)} vs {len(b)}")
            failed.append(name)
        elif a != b:
            diff = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL  {name}: value mismatch at sorted row {diff}:")
            print(f"      spark : {a[diff][:200]}")
            print(f"      duckdb: {b[diff][:200]}")
            failed.append(name)
        else:
            print(f"OK    {name}: {len(a)} rows match")
    spark.stop()
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
