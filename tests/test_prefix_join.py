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
