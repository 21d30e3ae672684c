"""Interleaved same-JVM A/B of bootstrap_mean_ci replica-fan shapes:
A = explode per replica (x32), B = posexplode per digest (x8, 4 lanes).
Usage: ab_bootstrap.py [sf_dir] [reps]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.registry_eval import _B, _G, _POIS_HEX
from datas_spark.session import get_spark


def build(spark, sf_dir, shape):
    orders = read_table(spark, sf_dir, "orders")
    digests = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.transform(
            F.sequence(F.lit(0), F.lit(_G - 1)),
            lambda g: F.md5(
                F.concat(
                    F.col("o_orderkey").cast("string"), F.lit(":"), g.cast("string")
                )
            ),
        ).alias("__h"),
    )
    if shape in ("A", "C"):
        reps = digests.select(
            "cents", "__h", F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b")
        )
        win = F.substring(
            F.element_at(F.col("__h"), (F.col("b") / 4).cast("int") + 1),
            F.lit(1) + 8 * (F.col("b") % 4),
            F.lit(8),
        )
        if shape == "C":
            # nested short-circuit: first threshold ABOVE u wins
            w = F.lit(len(_POIS_HEX))
            for k in range(len(_POIS_HEX) - 1, -1, -1):
                w = F.when(win < F.lit(_POIS_HEX[k]), k).otherwise(w)
            w = w.cast("long")
        else:
            w = sum(F.when(win >= F.lit(t), 1).otherwise(0) for t in _POIS_HEX).cast("long")
        per_rep = (
            reps.select("b", w.alias("w"), "cents")
            .groupBy("b")
            .agg(F.sum(F.col("w") * F.col("cents")).alias("wsum"), F.sum("w").alias("n"))
            .where(F.col("n") > 0)
        )
    else:
        gd = digests.select("cents", F.posexplode(F.col("__h")).alias("g", "dg"))
        wins = [F.substring(F.col("dg"), 1 + 8 * j, 8) for j in range(4)]
        ws = [
            sum(F.when(win >= F.lit(t), 1).otherwise(0) for t in _POIS_HEX).cast("long")
            for win in wins
        ]
        wcols = gd.select(
            "cents", "g", *[w.alias(f"w{j}") for j, w in enumerate(ws)]
        )
        per_g = wcols.groupBy("g").agg(
            *[
                c
                for j in range(4)
                for c in (
                    F.sum(F.col(f"w{j}") * F.col("cents")).alias(f"ws{j}"),
                    F.sum(f"w{j}").alias(f"n{j}"),
                )
            ]
        )
        per_rep = (
            per_g.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                (F.col("g") * 4 + j).alias("b"),
                                F.col(f"ws{j}").alias("wsum"),
                                F.col(f"n{j}").alias("n"),
                            )
                            for j in range(4)
                        ]
                    )
                ).alias("__r")
            )
            .select("__r.b", "__r.wsum", "__r.n")
            .where(F.col("n") > 0)
        )
    return per_rep


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-bootstrap")
    spark.sparkContext.setLogLevel("ERROR")
    for shape in ("A", "C"):
        build(spark, "/root/testdata/sf0.001", shape).count()  # warm
    # equality check once (sorted rows)
    ra = sorted(map(tuple, build(spark, "/root/testdata/sf0.01", "A").collect()))
    rb = sorted(map(tuple, build(spark, "/root/testdata/sf0.01", "C").collect()))
    print("per_rep equal at sf0.01:", ra == rb, flush=True)
    for r in range(reps):
        for shape in ("A", "C"):
            df = build(spark, sf_dir, shape)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            print(f"rep {r} {shape}: {time.perf_counter() - t0:6.2f} s", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
