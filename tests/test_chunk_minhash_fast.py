"""Property tests for the production chunk-level MinHash path (q34_fast):
token chunking + xxhash64 shingles + Philox permutations + bloom
pre-prune + salted join, all at CHUNK granularity.

Like q21_fast, the hash family is not ANSI-SQL-expressible, so instead
of a DuckDB oracle these pin the guarantees the operator relies on:
identical chunks always pair, disjoint documents never do, results are
deterministic, and recall covers every high-Jaccard chunk pair the
exact (oracle-checked) n-gram join finds.
"""

from __future__ import annotations

from dedupe_spark.operators.dedup import (
    chunk_documents,
    chunk_minhash_pairs_fast,
    ngram_jaccard_pairs,
)

SF_DIR = "/root/testdata/sf0.001"

# exactly 32 tokens — one full chunk at the default chunk_tokens=32
PARA32 = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strange potions under a harvest moon and count silver coins "
    "beside the river bank waiting for the morning ferry"
)
# exactly 32 tokens of filler so PARA32 lands on a chunk boundary in doc b
FILLER32 = " ".join(f"filler{i}" for i in range(32))


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = chunk_minhash_pairs_fast(df, "doc_id", "text", **kw)
    return {(r["id_a"], r["id_b"]) for r in got.collect()}


def test_copied_paragraph_links_different_docs(spark):
    """A paragraph pasted into two otherwise-disjoint documents at a
    chunk boundary yields an IDENTICAL chunk in both -> identical
    signatures -> all 32 bands collide -> guaranteed candidate pair."""
    rows = [
        ("a", PARA32 + " unrelated tail about gardening tomatoes and soil"),
        ("b", FILLER32 + " " + PARA32),
    ]
    pairs = _pairs(spark, rows)
    assert ("a:0", "b:1") in pairs, pairs


def test_disjoint_docs_no_chunk_pairs(spark):
    rows = [
        ("a", "one two three four five six seven eight nine ten eleven twelve"),
        ("b", "red green blue yellow purple orange cyan magenta black white grey pink"),
    ]
    assert _pairs(spark, rows) == set()


def test_fast_chunk_query_deterministic(spark):
    import __spark_entry__ as entrymod

    q = entrymod.queries()["q34_fast_chunk_minhash_pairs"]
    a = sorted(map(tuple, q(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q(spark, SF_DIR).collect()))
    assert a == b
    entrymod.release_query_caches()


def test_fast_chunk_recall_vs_exact_jaccard(spark):
    """Every chunk pair with exact 3-gram Jaccard >= 0.7 must be a
    candidate (128 perms / 32 bands, r=4: collision probability for
    s=0.7 is ~0.9998 and the seed is fixed, so this is deterministic)."""
    import __spark_entry__ as entrymod

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    chunks = chunk_documents(d, "doc_id", "text", 32).selectExpr(
        "concat(cast(doc_id as string), ':', cast(chunk_idx as string)) AS cid",
        "chunk_text",
    )
    truth = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            chunks, "cid", "chunk_text", n=3, threshold=0.7
        ).collect()
    }
    fast = {
        (r["id_a"], r["id_b"])
        for r in entrymod.queries()["q34_fast_chunk_minhash_pairs"](
            spark, SF_DIR
        ).collect()
    }
    entrymod.release_query_caches()
    assert truth <= fast, f"missed {truth - fast}"
