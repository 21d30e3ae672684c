"""Table maintenance for parquet lakes: small-file compaction and
physical table stats.

Why this is a first-class 100 TB concern: streaming sinks and
fine-grained batch writes leave thousands of KB-scale files per
partition; every downstream scan then pays per-file open/footer costs
and the driver pays listing time. Periodic compaction to
near-`target_bytes` files is the standard fix (Delta OPTIMIZE /
Iceberg rewrite_data_files); this is the vanilla-parquet version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["table_stats", "compact_parquet"]


def table_stats(spark: SparkSession, path: str) -> dict:
    """Physical stats of a parquet dir from the file system + footers:
    ``{n_files, total_bytes, avg_file_bytes, n_rows}``. Driver-side
    listing only — no data scan (rows come from footer metadata via a
    count(), which parquet answers from row-group stats)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    sizes = [
        st.getLen()
        for st in fs.listStatus(p)
        if st.getPath().getName().endswith(".parquet")
        or st.getPath().getName().startswith("part-")
    ]
    n_rows = spark.read.parquet(path).count()  # metadata-only count
    total = int(sum(sizes))
    return {
        "n_files": len(sizes),
        "total_bytes": total,
        "avg_file_bytes": int(total / len(sizes)) if sizes else 0,
        "n_rows": n_rows,
    }


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    order_col: str | None = None,
) -> dict:
    """Rewrite ``src_path`` into ``dst_path`` with files sized near
    ``target_file_bytes``.

    The output file count comes from the SOURCE's physical size (the
    only honest estimate without writing twice): ``ceil(total_bytes /
    target)``. With ``order_col`` the rewrite is a range exchange +
    in-partition sort, preserving (or establishing) clustering so
    row-group min/max pruning keeps working after compaction —
    compacting a z-ordered table with ``order_col='zkey'`` keeps the
    curve. Without it, a plain ``repartition`` (round-robin) balances
    bytes evenly.

    Returns the post-compaction `table_stats` of ``dst_path``.
    """
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    before = table_stats(spark, src_path)
    n_files = max(1, -(-before["total_bytes"] // target_file_bytes))
    df: DataFrame = spark.read.parquet(src_path)
    if order_col is not None:
        out = df.repartitionByRange(n_files, F.col(order_col)).sortWithinPartitions(
            order_col
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_path)
    return table_stats(spark, dst_path)
