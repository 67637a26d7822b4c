"""semantic_dedup (SemDeDup) and the end-to-end curate() composite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


EN1 = (
    "the cat and the dog went to the park and it was a sunny day "
    "for everyone involved in the big happy outing today"
)
# near-dup of EN1: one token differs -> 3-gram jaccard ~0.76 >= 0.6
EN1_NEAR = EN1.replace("sunny", "rainy")
BENCH_RUN = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
CONTAMINATED = (
    f"the report said that {BENCH_RUN} and it was clear to all of the team members"
)


def test_semantic_dedup_greedy_keep(spark):
    from dedupe_spark.operators.similarity import semantic_dedup

    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),   # cos(0,1) ~ 0.994 -> dup of 0
            (2, [0.0, 1.0]),
            (3, [0.1, 0.9]),   # cos(2,3) ~ 0.994 -> dup of 2
            (4, [0.7, 0.7]),   # cell 0 (tie -> lowest cid), no >=0.95 mate
        ],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, cv array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            vecs, n_centroids=2, threshold=0.95, centroids=cents
        ).collect()
    }
    assert {i: out[i]["keep"] for i in range(5)} == {
        0: True, 1: False, 2: True, 3: False, 4: True
    }
    assert {i: out[i]["cell"] for i in range(5)} == {0: 0, 1: 0, 2: 1, 3: 1, 4: 0}
    assert out[0]["n_dups"] == 1 and out[4]["n_dups"] == 0
    assert out[1]["nn_sim"] == pytest.approx(0.993884, abs=1e-5)


def test_semantic_dedup_singleton_cell(spark):
    from dedupe_spark.operators.similarity import semantic_dedup

    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid long, cv array<double>"
    )
    out = {r["vec_id"]: r for r in semantic_dedup(vecs, centroids=cents).collect()}
    # each vector alone in its cell: kept, nn_sim sentinel -1
    assert all(out[i]["keep"] for i in (0, 1))
    assert out[0]["nn_sim"] == -1.0 and out[0]["n_dups"] == 0


def test_curate_verdict_per_stage(spark):
    from dedupe_spark.operators.curation import curate

    docs = spark.createDataFrame(
        [
            (1, EN1),                      # keep
            (2, "tiny"),                   # too_short (funnel)
            (3, EN1.upper()),              # exact dup of 1 after normalization
            (5, EN1_NEAR),                 # verified near-dup of 1
            (7, CONTAMINATED),             # shares >=3 8-grams with bench
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, BENCH_RUN)], "doc_id long, text string")
    got = {r["doc_id"]: r["verdict"] for r in curate(docs, bench).collect()}
    assert got == {
        1: "keep",
        2: "too_short",
        3: "exact_dup",
        5: "near_dup",
        7: "contaminated",
    }


def test_curate_exact_copy_never_drops_canonical(spark):
    """An exact copy must not vote its canonical out via the near-dup
    stage (the copy is removed BEFORE candidate generation)."""
    from dedupe_spark.operators.curation import curate

    docs = spark.createDataFrame(
        [(1, EN1), (2, EN1)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(100, BENCH_RUN)], "doc_id long, text string")
    got = {r["doc_id"]: r["verdict"] for r in curate(docs, bench).collect()}
    assert got == {1: "keep", 2: "exact_dup"}


def test_curation_report_zero_filled(spark):
    from dedupe_spark.operators.curation import CURATE_VERDICTS, curation_report

    verdicts = spark.createDataFrame(
        [(1, "keep"), (2, "keep"), (3, "too_short"), (4, "near_dup")],
        "doc_id long, verdict string",
    )
    rows = curation_report(verdicts).collect()
    assert [r["verdict"] for r in rows] == list(CURATE_VERDICTS)
    by = {r["verdict"]: r for r in rows}
    assert by["keep"]["n_docs"] == 2 and by["keep"]["frac"] == 0.5
    assert by["exact_dup"]["n_docs"] == 0 and by["exact_dup"]["frac"] == 0.0
