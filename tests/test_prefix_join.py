from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.dedup import ngram_jaccard_pairs, ngram_jaccard_pairs_prefix


def test_prefix_filtered_join_equals_naive(spark):
    """PPJoin prefix filtering is an optimization, not an approximation:
    outputs must match the naive inverted-index join exactly."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing outside in the garden"
    )
    rows = [
        (1, base),
        (2, base),
        (3, base.replace("quick", "fast").replace("cat", "kitten")),
        (4, base.replace("dog", "wolf")),
        (5, "a totally different text about adaptive query execution in spark"),
        (6, "short text"),
        (7, "another unrelated document mentioning the quick brown fox once only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.4, 0.6, 0.8):
        naive = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
            for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=t).collect()
        }
        fast = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
            for r in ngram_jaccard_pairs_prefix(df, "doc_id", "text", threshold=t).collect()
        }
        assert fast == naive, f"threshold {t}: {fast} != {naive}"


def test_containment_catches_what_jaccard_misses(spark):
    """A short doc quoted verbatim inside a much larger one: containment
    1.0 but symmetric Jaccard far below threshold — the containment join
    must find it, the Jaccard join must not. The prefix-filtered result
    must also equal the naive all-shared-grams computation exactly."""
    from dedupe_spark.operators.dedup import (
        ngram_containment_pairs_prefix,
        token_ngrams,
    )

    quote = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    filler = " ".join(f"word{i} token{i} item{i}" for i in range(30))
    rows = [
        (1, quote),                      # fully contained in 2
        (2, filler + " " + quote + " " + filler.replace("word", "mot")),
        (3, "completely unrelated text about query optimizers and joins"),
        (4, quote.replace("gamma", "changed")),  # ~70% contained in 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["id_sub"], r["id_super"]): r["containment"]
        for r in ngram_containment_pairs_prefix(
            df, "doc_id", "text", n=3, threshold=0.9
        ).collect()
    }
    assert got.get((1, 2)) == pytest.approx(1.0)
    assert (4, 2) not in got  # below the 0.9 bar
    assert (2, 1) not in got  # containment is asymmetric
    assert all(id_sub != 3 and id_super != 3 for id_sub, id_super in got)

    # symmetric jaccard of (1, 2) is tiny — the pair is invisible to it
    jac = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    }
    assert (1, 2) not in jac

    # exactness vs naive: every ordered pair sharing any gram, verified
    grams = df.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(token_ngrams(F.col("text"), 3))).alias("g"),
    )
    naive = (
        grams.alias("a")
        .join(grams.alias("b"), "g")
        .where(F.col("a.id") != F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_sub"), F.col("b.id").alias("id_super"))
        .count()
        .join(
            grams.groupBy(F.col("id").alias("id_sub")).agg(F.count("*").alias("sz")),
            "id_sub",
        )
        .where(F.col("count") / F.col("sz") >= 0.9)
    )
    naive_pairs = {
        (r["id_sub"], r["id_super"]): round(r["count"] / r["sz"], 6)
        for r in naive.collect()
    }
    assert {k: round(v, 6) for k, v in got.items()} == naive_pairs


def test_containment_max_gram_df_cap(spark):
    """The skew cap skips hot prefix grams: a doc made entirely of
    corpus-hot boilerplate loses its candidates (surfaced trade), while
    pairs found via rare grams are untouched; cap=None stays exact."""
    from dedupe_spark.operators.dedup import ngram_containment_pairs_prefix

    hot = "common boiler plate text here"          # appears in many docs
    rows = [(i, f"{hot} filler{i} pad{i} end{i}") for i in range(10)]
    rows.append((100, hot))                        # hot-only doc, contained in all
    rows.append((101, "rare alpha beta gamma delta unique"))
    rows.append((102, "rare alpha beta gamma delta unique plus extra tail tokens"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    exact = {
        (r["id_sub"], r["id_super"])
        for r in ngram_containment_pairs_prefix(df, "doc_id", "text", threshold=0.9).collect()
    }
    assert (100, 0) in exact and (101, 102) in exact

    capped = {
        (r["id_sub"], r["id_super"])
        for r in ngram_containment_pairs_prefix(
            df, "doc_id", "text", threshold=0.9, max_gram_df=3
        ).collect()
    }
    assert (101, 102) in capped          # rare-gram pair survives
    assert all(s != 100 for s, _ in capped)  # hot-only doc's pairs traded away
    assert capped <= exact
