"""Multimodal columns — north-star extension (SURVEY §2.9).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages. The Spark-side plumbing
(schemas, batch iteration, partitioning) is real and tested; the codec
call itself is pluggable because media libraries (PIL/ffmpeg/torchaudio)
are not in this container — ``decoder=None`` raises NotImplementedError
at execution, and tests inject a deterministic fake decoder.

Scale notes: media blobs dominate row size — never shuffle them.
Transforms here are map-only (mapInPandas), and ``media_metadata``
projects the struct so downstream filters/joins touch only metadata
while Parquet column pruning skips the bytes entirely.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "media_exact_dedup",
    "media_payload_dedup",
    "decode_features",
    "resize_media",
    "frame_sample",
    "media_phash",
]

# media row: opaque payload + typed metadata (mime sniffed or declared)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("meta", StructType([
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("duration_ms", LongType()),
        ])),
    ]
)

Decoder = Callable[[bytes], "list[float]"]


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap metadata without decoding: byte length + magic-byte mime
    sniff (expression-only; the blob never leaves the JVM)."""
    c = F.col(content_col)
    mime = (
        F.when(F.substring(F.hex(c), 1, 8) == "89504E47", "image/png")
        .when(F.substring(F.hex(c), 1, 4) == "FFD8", "image/jpeg")
        .when(F.substring(c.cast("string"), 1, 4) == "RIFF", "audio/wav")
        .otherwise("application/octet-stream")
    )
    return df.withColumn("n_bytes", F.length(c).cast("long")).withColumn("mime", mime)


def decode_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    dim: int = 8,
    decoder: Decoder | None = None,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode → feature-extract as an Arrow-batched ``mapInPandas``
    stage: (id, features array<float>) per media row.

    ``decoder`` runs executor-side per payload. None → the documented
    stub raises NotImplementedError *at execution* (plumbing still
    analyzes/optimizes; swap a real codec in production, a fake in
    tests)."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None:
                raise NotImplementedError(
                    "no media decoder installed in this environment; pass "
                    "decoder= (e.g. a PIL/ffmpeg-backed callable) — the "
                    "Spark plumbing around it is complete"
                )
            feats = [
                (decoder(bytes(b)) + [0.0] * dim)[:dim] if b is not None else None
                for b in pdf[content_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, content_col).mapInPandas(run, schema=out_schema)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "media_id",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize: binary in → binary out plus the new dimensions,
    as an Arrow-batched ``mapInPandas`` stage (same stub discipline as
    ``decode_features`` — the codec is pluggable, the plumbing real).

    Map-only by design: blobs transform in place per partition and
    never shuffle; downstream writers should partition on metadata,
    not content.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("content", BinaryType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resizer is None:
                raise NotImplementedError(
                    "no image codec in this environment; pass resizer= "
                    "(e.g. a PIL-backed callable) — the Spark plumbing "
                    "around it is complete"
                )
            out = [
                resizer(bytes(b), width, height) if b is not None else None
                for b in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": out,
                    "width": [width] * len(out),
                    "height": [height] * len(out),
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, schema=out_schema)


def frame_sample(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    every_ms: int = 1000,
    frame_extractor: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video → sampled frames, one output row per frame (mapInPandas
    with row expansion — output cardinality > input is fine because
    mapInPandas is an iterator contract, not 1:1)."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if frame_extractor is None:
                raise NotImplementedError(
                    "no video codec in this environment; pass frame_extractor="
                )
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                for i, frame in enumerate(frame_extractor(bytes(blob), every_ms)):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(frame)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, content_col).mapInPandas(run, schema=out_schema)


def media_exact_dedup(df: DataFrame, content_col: str, order_col: str) -> DataFrame:
    """Exact dedup of media payloads by full byte content — the
    content-addressed pass a multimodal corpus runs before any decode
    (identical blobs are common: re-uploads, mirrored crawls). Keeps
    the first row per payload in ``order_col`` order via the same
    map-side ``min_by`` election as text ``exact_dedup``; the group key
    is a 64-bit hash of the bytes, so blobs never shuffle.
    """
    cols = df.columns
    surv = (
        df.withColumn("__fp", F.xxhash64(F.col(content_col)))
        .groupBy("__fp")
        .agg(F.min_by(F.struct(*cols), F.col(order_col)).alias("__row"))
    )
    return surv.select(*[F.col(f"__row.{c}").alias(c) for c in cols])


def media_payload_dedup(
    df: DataFrame, content_col: str, order_col: str
) -> DataFrame:
    """Container-insensitive media dedup: strip the container header
    (magic bytes) by sniffing, then dedup on the remaining PAYLOAD —
    catches the same underlying content re-encapsulated in different
    containers (the multimodal twin of normalized-text dedup; full
    transcode-invariance needs a decode pass, this is the cheap
    byte-level tier above it). Header sniff and payload slice are
    string ops over the hex view — map-only, codegen'd, and
    reproducible in SQL; blobs still never shuffle (64-bit payload
    hash key).
    """
    cols = df.columns
    h = F.hex(F.col(content_col))
    payload = (
        F.when(h.startswith("89504E47"), F.substring(h, 9, 2_000_000_000))
        .when(h.startswith("FFD8"), F.substring(h, 5, 2_000_000_000))
        .otherwise(h)
    )
    surv = (
        df.withColumn("__fp", F.xxhash64(payload))
        .groupBy("__fp")
        .agg(F.min_by(F.struct(*cols), F.col(order_col)).alias("__row"))
    )
    return surv.select(*[F.col(f"__row.{c}").alias(c) for c in cols])


def media_phash(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    phash_fn=None,
    out_col: str = "phash",
) -> DataFrame:
    """Perceptual-hash stage: (id, 64-bit signature) per media row via
    Arrow-batched ``mapInPandas`` — the multimodal analogue of
    ``dedup.simhash``. Feed the result to
    ``dedup.hamming_near_dup_pairs`` for banded near-dup detection
    (perceptually-similar images differ in few signature bits, so the
    pigeonhole banding contract applies unchanged).

    ``phash_fn(payload: bytes) -> int`` runs executor-side per payload
    (a real deployment plugs a DCT pHash / aHash over the decoded
    image; this container has no image codec, so None raises the
    documented NotImplementedError at execution while the plan still
    analyzes). NULL payloads yield NULL signatures.
    """
    out_schema = StructType(
        [StructField(id_col, LongType()), StructField(out_col, LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if phash_fn is None:
                raise NotImplementedError(
                    "no perceptual-hash backend installed in this "
                    "environment; pass phash_fn= (e.g. a PIL+DCT pHash) — "
                    "the Spark plumbing around it is complete"
                )
            sigs = [
                int(phash_fn(bytes(b))) if b is not None else None
                for b in pdf[content_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: sigs})

    return df.select(id_col, content_col).mapInPandas(run, schema=out_schema)
