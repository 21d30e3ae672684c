"""Interleaved same-JVM A/B of the hamming bucket pair generator:
A = per-member F.slice (current), B = F.when-guarded sequence + F.get.
Runs the full simhash_cap_agreement shape at the given sf.
Usage: ab_pairarr.py [sf_dir] [reps]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import dedup as D
from datas_spark.operators.dedup import _hamming_banded
from datas_spark.session import get_spark


def pair_arr(shape):
    ms = F.col("__ms")
    if shape == "A":
        return F.flatten(
            F.transform(
                ms,
                lambda x, i: F.transform(
                    F.slice(ms, i + 2, F.greatest(F.size(ms) - i - 1, F.lit(0))),
                    lambda y: F.struct(
                        x["__id"].alias("id_a"),
                        y["__id"].alias("id_b"),
                        F.bit_count(x["simhash"].bitwiseXOR(y["simhash"]))
                        .cast("int")
                        .alias("hamming"),
                    ),
                ),
            )
        )
    return F.flatten(
        F.transform(
            ms,
            lambda x, i: F.transform(
                F.when(
                    i + 1 <= F.size(ms) - 1, F.sequence(i + 1, F.size(ms) - 1)
                ).otherwise(F.array().cast("array<int>")),
                lambda j: F.struct(
                    x["__id"].alias("id_a"),
                    F.get(ms, j)["__id"].alias("id_b"),
                    F.bit_count(
                        x["simhash"].bitwiseXOR(F.get(ms, j)["simhash"])
                    )
                    .cast("int")
                    .alias("hamming"),
                ),
            ),
        )
    )


def build(spark, sf_dir, shape):
    docs = read_table(spark, sf_dir, "documents")
    sig = D.simhash(docs, "text", 60).select("doc_id", "simhash")
    banded, _ = _hamming_banded(sig, "doc_id", "simhash", 60, 4)
    buckets = banded.groupBy("band", "bval").agg(
        F.sort_array(F.collect_list(F.struct("__id", "simhash"))).alias("__ms")
    ).withColumn("__ok", F.size("__ms") <= F.lit(64))
    per_pair = (
        buckets.select("__ok", F.explode(pair_arr(shape)).alias("__pp"))
        .select("__ok", "__pp.id_a", "__pp.id_b", "__pp.hamming")
        .where(F.col("hamming") <= 3)
        .groupBy("id_a", "id_b")
        .agg(F.max(F.col("__ok").cast("int")).alias("__in_capped"))
    )
    return per_pair


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-pairarr")
    spark.sparkContext.setLogLevel("ERROR")
    for shape in ("A", "B"):
        build(spark, "/root/testdata/sf0.001", shape).count()
    ra = sorted(map(tuple, build(spark, "/root/testdata/sf0.01", "A").collect()))
    rb = sorted(map(tuple, build(spark, "/root/testdata/sf0.01", "B").collect()))
    print("pairs equal at sf0.01:", ra == rb, flush=True)
    for r in range(reps):
        for shape in ("A", "B"):
            df = build(spark, sf_dir, shape)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            print(f"rep {r} {shape}: {time.perf_counter() - t0:6.2f} s", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
