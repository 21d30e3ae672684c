"""Multimodal binary-column plumbing: schema contracts, mapInPandas
batch shapes, and the documented NotImplementedError stubs."""

import pytest
from pyspark.sql import functions as F

from datas_spark.operators import multimodal as MM
from datas_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    decode_features,
    resize_media,
    frame_sample,
)

PNG_MAGIC = bytes([0x89, 0x50, 0x4E, 0x47])
JPEG_MAGIC = bytes([0xFF, 0xD8])


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, PNG_MAGIC + b"payload-one", None, None),
        (2, JPEG_MAGIC + b"payload-two!", None, None),
        (3, b"RIFFxxxxWAVE", None, None),
        (4, b"plain bytes here", None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_media_schema_roundtrip(media):
    assert [f.name for f in media.schema] == ["media_id", "content", "mime", "meta"]
    assert media.count() == 4


def test_metadata_sniff(media):
    got = {
        r.media_id: (r.mime, r.n_bytes)
        for r in attach_media_metadata(media.drop("mime")).collect()
    }
    assert got[1] == ("image/png", 15)
    assert got[2] == ("image/jpeg", 14)
    assert got[3] == ("audio/wav", 12)
    assert got[4] == ("application/octet-stream", 16)


def test_decode_features_fake_codec(media):
    feats = decode_features(
        media, dim=3, decoder=lambda b: [float(len(b)), float(b[0])]
    )
    assert feats.schema.simpleString() == "struct<media_id:bigint,features:array<float>>"
    got = {r.media_id: r.features for r in feats.collect()}
    assert got[4] == [16.0, float(b"p"[0]), 0.0]  # padded to dim


def test_decode_features_stub_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|no media decoder"):
        decode_features(media).collect()


def test_frame_sample_row_expansion(media):
    frames = frame_sample(
        media,
        frame_extractor=lambda b, ms: [b[i : i + 4] for i in range(0, len(b), 4)],
    )
    got = frames.collect()
    # 15+14+12+16 bytes in chunks of 4 -> 4+4+3+4 frames
    assert len(got) == 15
    by_id = {(r.media_id, r.frame_idx): bytes(r.frame) for r in got}
    assert by_id[(3, 0)] == b"RIFF"
    assert by_id[(1, 3)] == b"one"  # ragged tail preserved


def test_frame_sample_stub_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|no video codec"):
        frame_sample(media).collect()


def test_resize_media_truncates_and_stamps_dims(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 100)), (2, bytearray(b"y" * 10))],
        "media_id long, content binary",
    )
    out = resize_media(df, 8, 8, resizer=lambda b, w, h: b[: w * h]).collect()
    got = {r.media_id: (len(r.content), r.width, r.height) for r in out}
    assert got == {1: (64, 8, 8), 2: (10, 8, 8)}


def test_resize_media_without_codec_raises(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "media_id long, content binary")
    plan = resize_media(df, 4, 4)  # analyzes fine — stub fails at execution
    with pytest.raises(Exception, match="NotImplementedError|no image codec"):
        plan.collect()


# --- perceptual-hash plumbing (batch 57) --------------------------------

def test_media_phash_gated_without_backend(spark):
    df = spark.createDataFrame([(1, bytearray(b"xx"))], "media_id long, content binary")
    out = MM.media_phash(df, "content", "media_id")
    with pytest.raises(Exception, match="NotImplementedError|perceptual-hash"):
        out.collect()


def test_media_phash_near_dup_pipeline_with_fake(spark):
    # two payload-equal blobs in different containers + one distinct
    rows = [
        (1, bytearray(b"\x89PNG" + b"samebytes")),
        (2, bytearray(b"\xff\xd8" + b"samebytes")),
        (3, bytearray(b"\x89PNG" + b"otherbytes")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    from datas_spark.registry_dedup import _fake_phash
    from datas_spark.operators import dedup as D

    sig = MM.media_phash(df, "content", "media_id", phash_fn=_fake_phash)
    got = {r.media_id: r.phash for r in sig.collect()}
    assert got[1] == got[2] != got[3]
    pairs = D.hamming_near_dup_pairs(
        sig, "media_id", "phash", bits=60, bands=4, max_hamming=3
    ).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [(1, 2, 0)]


def test_media_phash_null_payload_yields_null(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"x")), (2, None)], "media_id long, content binary"
    )
    got = {
        r.media_id: r.phash
        for r in MM.media_phash(
            df, "content", "media_id", phash_fn=lambda b: 7
        ).collect()
    }
    assert got[1] == 7 and got[2] is None
