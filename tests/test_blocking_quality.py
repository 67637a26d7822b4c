"""blocking_quality + sorted_neighborhood_pairs (operators/blocking.py).

Both checked against brute-force Python references on small frames; the
sf-table variants (q61/q62) get the full DuckDB-oracle treatment in
test_entry_oracle.py.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.blocking import blocking_quality, sorted_neighborhood_pairs


def test_blocking_quality_exact_counts(spark):
    keys = ["a", "a", "a", "b", "b", "c"]
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "id long, k string"
    )
    row = blocking_quality(df, "id", "k").collect()[0]
    assert row["n_records"] == 6
    assert row["n_blocks"] == 3
    assert row["max_block"] == 3
    assert row["singleton_blocks"] == 1
    # C(3,2) + C(2,2) + C(1,2) = 3 + 1 + 0
    assert row["candidate_pairs"] == 4
    assert row["reduction_ratio"] == pytest.approx(1 - 4 / 15, abs=1e-6)


def test_blocking_quality_all_unique_keys(spark):
    df = spark.range(10).withColumn("k", F.col("id").cast("string"))
    row = blocking_quality(df, "id", "k").collect()[0]
    assert row["candidate_pairs"] == 0
    assert row["singleton_blocks"] == 10
    assert row["reduction_ratio"] == pytest.approx(1.0)


def _brute_snm(rows: list[tuple[int, str]], window: int) -> set[tuple[int, int, int]]:
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (id_a, _) in enumerate(order):
        for gap in range(1, window):
            if i + gap < len(order):
                out.add((id_a, order[i + gap][0], gap))
    return out


@pytest.mark.parametrize("window", [2, 3, 5])
def test_sorted_neighborhood_matches_brute_force(spark, window):
    # keys with ties and near-misses; ids deliberately NOT in key order
    rows = [
        (7, "alpha"), (1, "alpha"), (3, "alphb"), (9, "beta"),
        (2, "beta"), (5, "gamma"), (0, "alph"), (4, "zz"),
    ]
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        (r["id_a"], r["id_b"], r["rank_gap"])
        for r in sorted_neighborhood_pairs(df, "id", "k", window=window).collect()
    }
    assert got == _brute_snm(rows, window)


def test_sorted_neighborhood_pair_count(spark):
    # n records, window w -> sum_{g=1..w-1} (n - g) pairs
    n, w = 50, 4
    df = spark.range(n).withColumn("k", F.format_string("k%03d", F.col("id")))
    cnt = sorted_neighborhood_pairs(df, "id", "k", window=w).count()
    assert cnt == sum(n - g for g in range(1, w))


def test_sorted_neighborhood_rejects_degenerate_window(spark):
    df = spark.range(3).withColumn("k", F.col("id").cast("string"))
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "id", "k", window=1)
