"""Registry batch 57 — perceptual-hash media near-dup: the
binary-payload → Arrow-batched phash → banded hamming join pipeline
(`multimodal.media_phash` + `dedup.hamming_near_dup_pairs`).

The container has no image codec, so the registered query plugs a
deterministic byte-level stand-in phash (container-stripped payload →
md5-prefix 60-bit signature) that the DuckDB oracle replays exactly: a
real deployment swaps in a DCT pHash and keeps every other stage —
schema, batching, banding, verification — unchanged.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datas_spark.operators import dedup as D
from datas_spark.operators import multimodal as MM
from datas_spark.registry10 import _MEDIA_DUP_SQL, _synth_media_dups
from datas_spark.registry_core import register


def _fake_phash(payload: bytes) -> int:
    """Deterministic stand-in perceptual hash: strip the container
    magic (PNG/JPEG) from the hex view, then a 60-bit md5 prefix —
    equal payloads get equal signatures (hamming 0), mirrored in SQL
    as ``('0x' || substr(md5(payload_hex), 1, 15))::BIGINT``."""
    h = payload.hex().upper()
    if h.startswith("89504E47"):
        h = h[8:]
    elif h.startswith("FFD8"):
        h = h[4:]
    return int(hashlib.md5(h.encode()).hexdigest()[:15], 16)


@register(
    "media_phash_near_dup",
    oracle=f"""
    WITH m AS ({_MEDIA_DUP_SQL}), p AS (
      SELECT media_id,
        ('0x' || substr(md5(
          CASE WHEN hex(content) LIKE '89504E47%' THEN substr(hex(content), 9)
               WHEN hex(content) LIKE 'FFD8%' THEN substr(hex(content), 5)
               ELSE hex(content) END), 1, 15))::BIGINT AS phash
      FROM m
    )
    SELECT a.media_id AS id_a, b.media_id AS id_b, 0 AS hamming
    FROM p a JOIN p b ON a.phash = b.phash AND a.media_id < b.media_id
    """,
)
def q_media_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dup via perceptual-hash banding: binary payloads →
    mapInPandas phash (container-stripped, so the planted same-payload/
    different-container pairs collide) → banded hamming pairs. The
    stand-in phash makes only hamming-0 pairs possible — the oracle is
    exact; the hamming>0 recall contract is proven separately on
    ``simhash_near_dup`` (same banding engine)."""
    media = _synth_media_dups(spark, sf_dir)
    sig = MM.media_phash(media, "content", "media_id", phash_fn=_fake_phash)
    pairs = D.hamming_near_dup_pairs(
        sig, "media_id", "phash", bits=60, bands=4, max_hamming=3
    )
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )
