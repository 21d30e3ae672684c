"""Sinks (SURVEY §2.1 S3-S6).

Reference writes a single pretty-printed JSON file
(``/root/reference/main.py:263,482`` ``Dataset.to_json(indent=4)``).
Distributed engines write JSONL part-files; ``single_file=True`` gives
the reference's one-file behavior via ``coalesce(1)`` (fine for the
small selected subsets the reference emits; never used for bulk data).
Parquet is the intermediate/cache format replacing the reference's
``.pt`` feature caches (``main.py:168-171,263``) — columnar, prunable,
and partitionable by model/stage (``src/utils/get_info.py:118-140``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_json(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """S3: JSONL sink. ``single_file`` mirrors the reference's one-file
    ``to_json`` for small result sets only."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """S5/S6: Parquet intermediate store; ``partition_by`` replaces the
    reference's per-model artifact directories (partition pruning at
    read time)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def _cache_marker_exists(spark: SparkSession, path: str) -> bool:
    """Check for the ``_SUCCESS`` marker through the Hadoop FileSystem
    API, so the guard works for ANY supported filesystem scheme
    (hdfs://, s3a://, file:/...) — ``os.path.exists`` only sees the
    driver's local disk and would silently rewrite a remote cache on
    every call."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    marker = jvm.org.apache.hadoop.fs.Path(path, "_SUCCESS")
    fs = marker.getFileSystem(hconf)
    return bool(fs.exists(marker))


def parquet_cache(
    spark: SparkSession, df: DataFrame, path: str, recompute: bool = False
) -> DataFrame:
    """C5/S5: materialized feature cache with a skip-if-exists guard
    (main.py:168-171 raises on existing ``.pt``; :312-314 reloads).

    Returns a DataFrame reading ``path``; computes + writes only when
    the cache is missing (or ``recompute``). Downstream stages read the
    Parquet — pruned, pushdown-capable — instead of re-running the
    (potentially model-backed) producer plan. The existence check goes
    through the Hadoop FileSystem of ``path``'s scheme, so remote
    stores (hdfs://, s3a://) honor the skip-if-exists contract too.
    """
    if recompute or not _cache_marker_exists(spark, path):
        df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def write_table(
    df: DataFrame,
    path: str,
    file_format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Format-generic table writer: parquet (default), orc (native in
    Spark core — the other columnar container a lake migration meets),
    json (JSONL), or csv. Partitioning and codec pass through; the
    parquet default inherits the session codec (zstd/snappy per
    deployment)."""
    if file_format not in ("parquet", "orc", "json", "csv"):
        raise ValueError(f"unsupported format: {file_format}")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression is not None:
        w = w.option("compression", compression)
    if file_format == "csv":
        w = w.option("header", "true")
    getattr(w, file_format)(path)


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    payload_cols: list[str],
    n_shards: int = 8,
    size_col: str | None = None,
) -> DataFrame:
    """Export rows as WebDataset-style tar shards —
    ``shard-%05d.tar`` each holding one ``{key}.{column}`` member per
    payload column (string columns utf-8 encoded, binary columns raw):
    the de-facto sequential-read format for multimodal training
    loaders, which stream tars instead of seeking small files.

    Sharding is deterministic: balanced by ``size_col`` through
    `training.balanced_shards` (near-equal bytes per shard — loader
    workers finish together) when given, else md5(key) mod n. Each
    shard is written by ONE `applyInPandas` group (members sorted by
    key, fixed zero mtime/uid), so a re-export is byte-identical —
    tars diff clean across runs. Returns the manifest
    (``shard``, ``n_members``, ``n_bytes``) — the action that also
    performs the write.

    Scale: one shuffle on the shard id; each task streams its group
    through ``tarfile`` without materializing the shard in memory
    beyond Arrow's batch. Payloads never shuffle twice.
    """
    import os

    import pandas as pd

    from pyspark.sql import functions as F

    if not payload_cols:
        raise ValueError("write_webdataset() needs at least one payload column")
    os.makedirs(path, exist_ok=True)
    if size_col is not None:
        from datas_spark.operators.training import balanced_shards

        work = balanced_shards(df, key_col, size_col, n_shards)
    else:
        work = df.withColumn(
            "shard",
            F.pmod(
                F.conv(F.md5(F.col(key_col).cast("string")).substr(1, 15), 16, 10)
                .cast("long"),
                F.lit(n_shards),
            ).cast("int"),
        )
    sel = work.select(key_col, "shard", *payload_cols)

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        import io
        import tarfile

        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(key_col)
        out = os.path.join(path, f"shard-{shard:05d}.tar")
        n_bytes = 0
        with tarfile.open(out, "w") as tar:
            for _, row in pdf.iterrows():
                for col in payload_cols:
                    v = row[col]
                    data = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
                    info = tarfile.TarInfo(name=f"{row[key_col]}.{col}")
                    info.size = len(data)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(bytes(data)))
                    n_bytes += len(data)
        return pd.DataFrame(
            {"shard": [shard], "n_members": [len(pdf) * len(payload_cols)],
             "n_bytes": [n_bytes]}
        )

    return sel.groupBy("shard").applyInPandas(
        _write, "shard int, n_members long, n_bytes long"
    )
