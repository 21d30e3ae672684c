"""Round-11 optimization measurement harness (guide §1): for each named
query, capture ``explain("formatted")`` to plans/r11/<query>_<tag>.txt,
then time it median-of-3 with the bench methodology (count() action,
warmup at sf0.001 first) and record the per-query Spark job count via a
per-query job group. Prints one JSON line with timings + job/exchange
counts so before/after evidence is diffable.

Usage: python scripts/opt_measure.py TAG QUERY [QUERY ...] [--sf-dir DIR]
       TAG is the plan-file suffix ("before" / "after").
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12"),
)


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    tag, names = argv[0], argv[1:]
    if not names:
        print("usage: opt_measure.py TAG QUERY [QUERY ...]")
        return 1

    from datas_spark.registry import QUERIES
    from datas_spark.session import get_spark

    unknown = [q for q in names if q not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 1
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    warm_dir = "/root/testdata/sf0.001"
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        # plan capture (cheap: analysis only, no execution)
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        n_exch = len(re.findall(r"\bExchange\b", plan))
        n_pyeval = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
        )
        # warm
        if os.path.isdir(warm_dir):
            try:
                fn(spark, warm_dir).count()
            except Exception:
                pass
        spark.catalog.clearCache()
        gc.collect()
        # timed: median of 3 counts, bench methodology; job count via group
        tracker = sc.statusTracker()
        samples = []
        jobs0 = None
        for r in range(3):
            sc.setJobGroup(f"opt-{name}-{r}", name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            ids = tracker.getJobIdsForGroup(f"opt-{name}-{r}")
            if r == 0:
                jobs0 = len(ids)
            sc.setJobGroup(None, None)
        spark.catalog.clearCache()
        gc.collect()
        out[name] = {
            "median_s": round(statistics.median(samples), 3),
            "samples": [round(s, 3) for s in samples],
            "jobs_run0": jobs0,
            "exchanges_in_plan": n_exch,
            "py_eval_nodes": n_pyeval,
        }
        print(f"  {name}: {out[name]}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
