"""Adversarial hot-key skew (VERDICT r2 task 8).

A real transcript corpus has ultra-hot patterns — thousands of
near-identical greeting/preamble conversations whose shingles collide
on the same LSH band keys. Without the stop-band cap those keys
enumerate O(hot^2) candidate pairs (1,400 hot docs -> ~1M pairs from a
single key); with it, hot keys are dropped from candidate generation,
the drop is surfaced in the metrics table (never silent), and the
byte-identical subset still clusters via the linear exact-fp path.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from dedupe_spark import fixtures, pipeline, schemas

N_HOT = 1400
N_VARIANTS = 7  # hot docs come in 7 near-identical flavors


@pytest.fixture(scope="module")
def skewed_transcripts(spark):
    base = fixtures.transcripts(spark, n_conv=50)
    t0 = datetime(2026, 3, 1, tzinfo=timezone.utc)
    rows = [
        (
            f"hot{i:05d}",
            0,
            "user",
            # one varying token out of ~14: byte-identical within a
            # flavor, near-identical across flavors -> massive band-key
            # collisions across all 1400 conversations
            f"hello there i would like some help with my account "
            f"settings please variant {i % N_VARIANTS}",
            None,
            t0 + timedelta(seconds=i),
        )
        for i in range(N_HOT)
    ]
    hot = spark.createDataFrame(rows, schemas.TRANSCRIPTS)
    return base.unionByName(hot).persist()


def test_stopband_engages_and_bounds_candidates(spark, skewed_transcripts):
    cfg = pipeline.PipelineConfig(compute_metrics=True)
    res = pipeline.run(skewed_transcripts, cfg)
    metrics = {r["metric"]: r["value"] for r in res.metrics.collect()}

    # the cap engaged and said so in metrics
    assert metrics["n_stopband_keys_dropped"] > 0
    assert metrics["n_stopband_rows_dropped"] >= metrics["n_stopband_keys_dropped"]
    # candidate pairs stay far below the quadratic blowup a single hot
    # band key would produce (C(1400,2) ~ 1M)
    assert metrics["n_candidate_pairs"] < 100_000

    # byte-identical hot conversations still collapse through the linear
    # exact-fp path: each flavor forms one cluster
    clusters = {
        r["conv_id"]: r["cluster_id"]
        for r in res.clusters.where(F.col("conv_id").startswith("hot")).collect()
    }
    assert len(clusters) == N_HOT
    for v in range(N_VARIANTS):
        flavor = {clusters[f"hot{i:05d}"] for i in range(N_HOT) if i % N_VARIANTS == v}
        assert len(flavor) == 1, f"flavor {v} split into {len(flavor)} clusters"
    res.release()


def test_salted_tier_spreads_moderately_hot_keys(spark):
    """Keys hotter than salt_threshold but under max_block go through the
    salted self-join and still produce the exact pair set."""
    from dedupe_spark.operators import blocking

    # one key with 40 rows (> threshold 16, <= cap 64), plus cold keys
    rows = [(i, "hotkey") for i in range(40)] + [(100 + i, f"cold{i % 5}") for i in range(20)]
    blocks = spark.createDataFrame(rows, "id long, band_key string")
    pairs = blocking.candidate_pairs(blocks)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    expect = {(a, b) for a in range(40) for b in range(40) if a < b}
    for i in range(20):
        for j in range(20):
            a, b = 100 + i, 100 + j
            if a < b and i % 5 == j % 5:
                expect.add((a, b))
    assert got == expect
