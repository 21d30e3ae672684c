"""Fresh-JVM triage for bench_diff flags — the round discipline
("treat a flag as real only if a fresh-JVM spot check reproduces it"),
as one command instead of an ad-hoc snippet:

    python scripts/bench_triage.py QUERY [QUERY ...] [--sf-dir DIR]

For each named query: warm at sf0.001, then median-of-3 at the target
sf in a FRESH JVM, with the five scan canaries measured in the same
session so the numbers carry their own box-regime context. Prints one
JSON object; feed the per-query medians + `scan_total` to
scripts/bench_floor_merge.py semantics when adopting a floor measured
here (the floor's canary IS this session's scan_total).

Exit code 0 always — triage informs, the human decides.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        del argv[i:i + 2]
    args = argv
    if not args:
        print("usage: bench_triage.py QUERY [QUERY ...] [--sf-dir DIR]")
        return 0

    import bench
    from datas_spark.registry import QUERIES
    from datas_spark.session import get_spark

    unknown = [q for q in args if q not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 0
    names = list(dict.fromkeys(bench.CANARY_QUERIES + args))
    spark = get_spark("bench-triage", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    warm = "/root/testdata/sf0.001"
    for n in names:
        try:
            QUERIES[n](spark, warm).count()
        except Exception:
            pass
    out: dict[str, float] = {}
    for n in names:
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        gc.collect()
        out[n] = round(statistics.median(samples), 3)
    spark.stop()
    sys.stdout.flush()
    print(json.dumps({
        "sf_dir": sf_dir,
        "scan_total": round(sum(out[c] for c in bench.CANARY_QUERIES), 3),
        "queries": {q: out[q] for q in args},
        "canaries": {c: out[c] for c in bench.CANARY_QUERIES},
    }, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
