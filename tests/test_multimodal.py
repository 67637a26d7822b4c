from __future__ import annotations

import pytest

from dedupe_spark.operators.multimodal import (
    decode_image_real,
    extract_features,
    sniff_media_type,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=24).persist()


def test_sniff_magic_bytes(spark, media):
    got = media.withColumn("mt", sniff_media_type(media.payload))
    counts = {r["mt"]: r["count"] for r in got.groupBy("mt").count().collect()}
    assert set(counts) == {
        "image/png", "image/jpeg", "audio/wav", "audio/mp3", "video/webm", "image/gif",
    }
    assert sum(counts.values()) == 24


def test_feature_extraction_schema_and_determinism(media):
    f1 = extract_features(media, out_dim=16)
    rows1 = {r["media_id"]: r for r in f1.collect()}
    rows2 = {r["media_id"]: r for r in extract_features(media, out_dim=16).collect()}
    assert len(rows1) == 24
    for mid, r in rows1.items():
        assert len(r["features"]) == 16
        assert all(0.0 <= x <= 1.0 for x in r["features"])
        assert r["n_bytes"] > 64
        assert rows2[mid]["features"] == r["features"]


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG\r\n\x1a\nxxxx")
