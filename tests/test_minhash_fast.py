"""Property tests for the production MinHash path (q21_fast):
xxhash64 shingles + numpy permutations + bloom pre-prune + salted join.

The hash family is not ANSI-SQL-expressible, so instead of a DuckDB
oracle these pin the deterministic guarantees the pipeline relies on.
"""

from __future__ import annotations

from dedupe_spark.operators import blocking, minhash

SF_DIR = "/root/testdata/sf0.001"


def _pairs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, doc string")
    banded = minhash.with_minhash_bands(df, "doc", num_perm=128, bands=32)
    blocks = blocking.explode_blocks(banded, "doc_id", "bands")
    blocks = blocking.bloom_preprune(blocks, mode="bloom")
    return {(r["id_a"], r["id_b"]) for r in blocking.candidate_pairs(blocks).collect()}


def test_exact_duplicates_always_candidates(spark):
    """Identical docs -> identical signatures -> every band collides."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [("a", base), ("b", base), ("c", "totally different words about engines")]
    assert ("a", "b") in _pairs(spark, rows)


def test_disjoint_docs_never_candidates(spark):
    """Disjoint shingle sets collide only via 64-bit hash collisions."""
    rows = [
        ("a", "one two three four five six seven eight nine ten"),
        ("b", "red green blue yellow purple orange cyan magenta black white"),
    ]
    assert _pairs(spark, rows) == set()


def test_fast_query_deterministic(spark):
    import __spark_entry__ as entrymod

    q = entrymod.queries()["q21_fast_minhash_pairs"]
    a = sorted(map(tuple, q(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q(spark, SF_DIR).collect()))
    assert a == b


def test_fast_path_recall_vs_exact_jaccard(spark):
    """At 128 perms / 32 bands (r=4), every sf0.001 doc pair with exact
    3-gram Jaccard >= 0.7 must be a candidate (deterministic under the
    fixed Philox seed; s-curve collision probability ~0.9998/pair)."""
    import __spark_entry__ as entrymod
    from dedupe_spark.operators.dedup import ngram_jaccard_pairs

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    truth = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.7).collect()
    }
    fast = {
        (r["id_a"], r["id_b"])
        for r in entrymod.queries()["q21_fast_minhash_pairs"](spark, SF_DIR).collect()
    }
    assert truth <= fast, f"missed {truth - fast}"


def test_minhash_udf_mixed_empty_rows(spark):
    """A batch mixing empty and non-empty shingle arrays: empty rows get
    the all-zero sentinel (same as an all-empty batch) and non-empty
    rows keep the exact signature they'd get alone — regardless of
    which rows around them are empty (reduceat's empty-segment
    semantics must never leak a neighbor's data)."""
    from dedupe_spark.operators.minhash import make_minhash_udf

    udf = make_minhash_udf(num_perm=8)
    rows = [(1, [5, 7]), (2, []), (3, [11]), (4, [])]  # trailing empty
    df = spark.createDataFrame(rows, "id long, sh array<long>")
    got = {r["id"]: r["sig"] for r in df.select("id", udf("sh").alias("sig")).collect()}
    alone = {
        r["id"]: r["sig"]
        for r in spark.createDataFrame([(1, [5, 7]), (3, [11])], "id long, sh array<long>")
        .select("id", udf("sh").alias("sig"))
        .collect()
    }
    assert got[1] == alone[1] and got[3] == alone[3]
    assert got[2] == [0] * 8 and got[4] == [0] * 8


def test_band_keys_divisibility_guard():
    """bands must divide num_perm: r=0 (all docs share all keys) and a
    silently-truncated signature are both config errors, not behaviors."""
    import pytest

    from dedupe_spark.operators.minhash import band_keys

    with pytest.raises(ValueError):
        band_keys("sig", bands=256, num_perm=128)
    with pytest.raises(ValueError):
        band_keys("sig", bands=48, num_perm=128)
