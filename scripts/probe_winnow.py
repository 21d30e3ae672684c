"""Stage split of winnowing_fingerprints at sf1 (round 12): time the
gram-hash projection, the per-doc window selection, and the final
distinct separately with noop sinks, same JVM."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datas_spark.io.sources import read_table
from datas_spark.operators import dedup as D
from datas_spark.session import get_spark


def t(df, label):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label:28s} {time.perf_counter() - t0:6.2f} s", flush=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata/sf1"
    spark = get_spark("probe-winnow")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents")
    docs.count()  # warm scan

    from datas_spark.functions.text import word_tokens
    from datas_spark.functions.text import hash60

    k, w = 5, 8
    toks = docs.select(F.col("doc_id").alias("__wid"), word_tokens("text").alias("__w"))
    cnt = F.size("__w") - (k - 1)
    positioned = toks.select(
        "__wid",
        F.when(
            cnt >= 1,
            F.transform(
                F.sequence(F.lit(0), cnt - 1),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    hash60(
                        F.concat_ws(" ", *[F.get(F.col("__w"), i + j) for j in range(k)])
                    ).alias("h"),
                ),
            ),
        )
        .otherwise(F.array().cast("array<struct<pos:int,h:bigint>>"))
        .alias("__gs"),
    )
    grams = (
        positioned.select("__wid", F.explode_outer("__gs").alias("__g"))
        .where(F.col("__g").isNotNull())
        .select("__wid", F.col("__g.pos").alias("pos"), F.col("__g.h").alias("h"))
    )
    for rep in range(2):
        t(toks, "tokens only")
        t(grams, "grams (hash explode)")
        fps = D.winnowing_fingerprints(docs, "doc_id", "text", k=5, w=8)
        t(fps, "full fingerprints")
        t(D.winnowing_near_dup_pairs(docs, "doc_id", "text", k=5, w=8), "near_dup_pairs")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
