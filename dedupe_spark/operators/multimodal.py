"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side machinery is real and tested: schema, partition-friendly
batch iteration (``mapInPandas``), Arrow batch shapes, and deterministic
fake feature extraction. The actual codec calls (PIL/librosa/ffmpeg) are
STUBBED — those libraries are not in this container — behind
``decode_image_real`` which raises NotImplementedError; the
deterministic fake (`_fake_decode`) keeps every downstream stage
exercisable.

Reference analog: application-aware chunking sniffs magic bytes to pick
a policy (/root/reference/src/FileType.cpp:24-56); ``sniff_media_type``
is the same longest-prefix magic-byte dispatch as an expression.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

# magic-byte table, longest prefix first — mirrors FileType::get_file_type
# (/root/reference/src/FileType.cpp:58-96) as data, not code.
_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x1aE\xdf\xa3", "video/webm"),
    (b"GIF8", "image/gif"),
]


def sniff_media_type(payload: Column) -> Column:
    """Longest-prefix magic-byte dispatch as a CASE WHEN chain (JVM-side)."""
    expr = F.lit("application/octet-stream")
    for magic, mtype in sorted(_MAGIC, key=lambda kv: len(kv[0])):
        hexpat = magic.hex()
        expr = F.when(
            F.lower(F.hex(F.substring(payload, 1, len(magic)))) == hexpat, F.lit(mtype)
        ).otherwise(expr)
    return expr


def decode_image_real(payload: bytes):  # pragma: no cover - container lacks codecs
    """Real decoder — requires PIL; intentionally stubbed in this env."""
    raise NotImplementedError(
        "image codecs not available in this container; plug PIL/torchvision here"
    )


def _fake_decode(payload: bytes, out_dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: a seeded
    projection of the payload digest. Keeps schema/batch plumbing real."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    reps = int(np.ceil(out_dim / raw.size))
    return np.tile(raw, reps)[:out_dim] / 255.0


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def extract_features(df: DataFrame, out_dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: one Arrow batch of (media_id, payload, ...) in, one
    pandas frame of (media_id, media_type, n_bytes, features) out —
    exactly how a real decode (resize / frame-sample / mel-spec) plugs
    in; swap `_fake_decode` for the codec call on a real deployment.
    """

    def run(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf.get("media_type", pd.Series([None] * len(pdf))),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "features": payloads.map(lambda b: _fake_decode(bytes(b), out_dim).tolist()),
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic binary fixture: payloads with real magic prefixes."""
    rows = []
    magics = [m for m, _ in _MAGIC]
    for i in range(n):
        rng = np.random.default_rng(1000 + i)
        body = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        payload = magics[i % len(magics)] + body
        rows.append((i, payload, None, None, None, None))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
