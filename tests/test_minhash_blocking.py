from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators import blocking, minhash


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden outside"
    )
    near = base.replace("quick", "fast").replace("warm", "sunny")
    other = (
        "completely different content about distributed query engines and "
        "shuffle partitioning strategies for large scale analytical workloads"
    )
    rows = [("d1", base), ("d2", base), ("d3", near), ("d4", other)]
    df = spark.createDataFrame(rows, "conv_id string, doc string").withColumn(
        "doc_len", F.length("doc")
    )
    return minhash.with_minhash_bands(df, "doc").persist()


def test_signature_deterministic_across_partitionings(spark, docs):
    df = docs.select("conv_id", "doc", "doc_len")
    a = minhash.with_minhash_bands(df.repartition(1), "doc").select("conv_id", "bands").collect()
    b = minhash.with_minhash_bands(df.repartition(7), "doc").select("conv_id", "bands").collect()
    assert {r["conv_id"]: r["bands"] for r in a} == {r["conv_id"]: r["bands"] for r in b}


def test_identical_docs_share_all_bands(docs):
    rows = {r["conv_id"]: r["bands"] for r in docs.select("conv_id", "bands").collect()}
    assert rows["d1"] == rows["d2"]


def test_near_docs_share_some_band_and_far_docs_none(docs):
    rows = {r["conv_id"]: set(r["bands"]) for r in docs.select("conv_id", "bands").collect()}
    assert rows["d1"] & rows["d3"], "near-duplicate must collide in >=1 LSH band"
    assert not rows["d1"] & rows["d4"], "unrelated docs must not collide"


def test_band_count_and_format(docs):
    rows = docs.select("bands").collect()
    for r in rows:
        assert len(r["bands"]) == minhash.DEFAULT_BANDS
        assert all(b.startswith("b") and ":" in b for b in r["bands"])


def test_candidate_pairs_match_bruteforce(spark):
    # many rows sharing keys: candidate_pairs must equal the brute-force
    # pair set regardless of salting tier
    rows = [(f"id{i:03d}", f"k{i % 5}") for i in range(80)]
    df = spark.createDataFrame(rows, "id string, band_key string")
    got = {
        (r["id_a"], r["id_b"])
        for r in blocking.candidate_pairs(
            df, max_block=100, salt_threshold=8, salt_groups=4
        ).collect()
    }
    expect = {
        (a, b)
        for a, ka in rows
        for b, kb in rows
        if ka == kb and a < b
    }
    assert got == expect


def test_stop_band_suppression(spark):
    rows = [(f"id{i:03d}", "hot") for i in range(50)] + [("a", "cold"), ("b", "cold")]
    df = spark.createDataFrame(rows, "id string, band_key string")
    got = blocking.candidate_pairs(df, max_block=10).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {("a", "b")}


def test_bloom_preprune_keeps_only_pairable(spark):
    rows = [("a", "k1"), ("b", "k1"), ("c", "k2"), ("d", "k3"), ("e", "k3"), ("f", "k3")]
    df = spark.createDataFrame(rows, "id string, band_key string")
    kept = {(r["id"], r["band_key"]) for r in blocking.bloom_preprune(df).collect()}
    assert kept == {("a", "k1"), ("b", "k1"), ("d", "k3"), ("e", "k3"), ("f", "k3")}


def test_exact_key_pairs_first_writer_wins(spark):
    rows = [("a", "x"), ("c", "x"), ("b", "x"), ("z", "y"), ("q", "solo")]
    df = spark.createDataFrame(rows, "id string, k string")
    got = {(r["id_a"], r["id_b"]) for r in blocking.exact_key_pairs(df, "id", "k").collect()}
    assert got == {("a", "b"), ("a", "c")}


def test_exact_key_pairs_no_group_size_cap(spark):
    """A giant exact-duplicate group (boilerplate at scale) must yield
    first-writer-wins edges for EVERY member — output is linear in group
    size, so no stop-band cap applies here."""
    n = 20_000
    df = spark.createDataFrame(
        [(i, "same") for i in range(n)] + [(n, "other")], "id long, k string"
    )
    edges = blocking.exact_key_pairs(df, "id", "k")
    assert edges.count() == n - 1
    assert edges.agg(F.min("id_a"), F.max("id_b")).collect()[0] == (0, n - 1)


def test_blocking_quality_ignores_null_keys(spark):
    """NULL keys never join, so they must not contribute candidates."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, None), (5, None)], "id long, k string"
    )
    (r,) = blocking.blocking_quality(df, "id", "k").collect()
    assert r["candidate_pairs"] == 1  # only the "a" block
    assert r["n_blocks"] == 1
