"""Pin the intermittent curate_corpus_semantic spike (VERDICT r11 #2):
run the query N times in one session and log wall time vs JVM GC time
delta + executor-thread count, to tell GC stalls apart from scheduler
pathology. Usage: probe_gc_spike.py [query] [reps]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datas_spark.registry import QUERIES
from datas_spark.session import get_spark


def gc_ms(spark) -> float:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    total = 0
    it = beans.iterator()
    while it.hasNext():
        total += it.next().getCollectionTime()
    return float(total)


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "curate_corpus_semantic"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("gc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[name]
    fn(spark, "/root/testdata/sf0.001").count()  # warm
    for r in range(reps):
        g0 = gc_ms(spark)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        dg = gc_ms(spark) - g0
        print(f"rep {r}: {dt:6.2f} s  gc {dg:7.0f} ms", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
