"""Recursive directory sources (S2): transcript trees + binary media."""

from __future__ import annotations

from dedupe_spark import fixtures
from dedupe_spark.sources.files import read_media_dir, read_transcript_dir


def test_recursive_transcript_dir(spark, tmp_path):
    tr = fixtures.transcripts(spark, n_conv=20)
    # nested layout: two "daily" subdirectories
    a = tr.where("conv_id < 'c0010'")
    b = tr.where("conv_id >= 'c0010'")
    a.write.parquet(str(tmp_path / "ingest" / "day=01" / "batch1"))
    b.write.parquet(str(tmp_path / "ingest" / "day=02" / "nested" / "batch2"))

    got = read_transcript_dir(spark, str(tmp_path / "ingest"))
    assert got.count() == tr.count()
    # parquet round-trips relax nullability; names/types must match exactly
    assert [(f.name, f.dataType) for f in got.schema] == [
        (f.name, f.dataType) for f in tr.schema
    ]
    assert (
        got.select("conv_id").distinct().count()
        == tr.select("conv_id").distinct().count()
    )


def test_recursive_media_dir(spark, tmp_path):
    d = tmp_path / "media" / "sub"
    d.mkdir(parents=True)
    (d / "a.png").write_bytes(b"\x89PNG\r\n\x1a\n" + b"x" * 32)
    (d / "b.jpg").write_bytes(b"\xff\xd8\xff" + b"y" * 32)
    (tmp_path / "media" / "c.bin").write_bytes(b"plain payload")

    got = read_media_dir(spark, str(tmp_path / "media"))
    types = {r["src_path"].split("/")[-1]: r["media_type"] for r in got.collect()}
    assert types == {
        "a.png": "image/png",
        "b.jpg": "image/jpeg",
        "c.bin": "application/octet-stream",
    }
    assert got.where("media_id IS NULL").count() == 0
