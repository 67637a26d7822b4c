"""Explicit schemas — no inference, fail fast on drift.

The reference hard-codes its record layout as C structs
(/root/reference/include/deduplication.h:59-91); the Spark analog is an
explicit StructType per table. The transcript schema matches
BASELINE.json ``input_hint`` exactly.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input: Iceberg/parquet table of multi-turn conversation transcripts.
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Ground truth for F1 (FIXTURES.md §2).
LABELED_PAIRS = T.StructType(
    [
        T.StructField("conv_id_a", T.StringType(), False),
        T.StructField("conv_id_b", T.StringType(), False),
        T.StructField("is_dup", T.BooleanType(), False),
        T.StructField("dup_class", T.StringType(), False),
    ]
)

# Clustering oracle (FIXTURES.md §3).
EXPECTED_CLUSTERS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), False),
    ]
)

# unique_turns: the reference's logic-block dictionary
# (/root/reference/include/deduplication.h:73-78) — one row per distinct
# normalized turn text, first-writer-wins block_id.
UNIQUE_TURNS = T.StructType(
    [
        T.StructField("fp", T.StringType(), False),  # md5 hex of normalized text
        T.StructField("text", T.StringType(), False),  # original text of canonical copy
        T.StructField("len", T.IntegerType(), False),
        T.StructField("block_id", T.LongType(), False),
    ]
)

# membership: the reference's per-file block_id list
# (/root/reference/include/deduplication.h:81-91).
MEMBERSHIP = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("block_id", T.LongType(), False),
    ]
)

CLUSTERS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), False),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
    ]
)
