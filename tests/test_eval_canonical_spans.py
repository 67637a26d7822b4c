"""Unit tests for cluster_eval, golden_records, duplicated_spans —
hand-computed adversarial cases; the sf-table variants (q65-q67) get the
DuckDB-oracle treatment in test_entry_oracle.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.canonical import golden_records
from dedupe_spark.operators.dedup import duplicated_spans
from dedupe_spark.operators.evaluation import cluster_eval


# ---------------------------------------------------------------- evaluation


def _eval_row(spark, rows):
    df = spark.createDataFrame(rows, "pred string, gold string")
    (r,) = cluster_eval(df, "pred", "gold").collect()
    return r


def test_perfect_clustering_scores_one(spark):
    rows = [("a", "x")] * 3 + [("b", "y")] * 2
    r = _eval_row(spark, rows)
    for m in ("b3_precision", "b3_recall", "b3_f1", "pair_precision", "pair_recall", "pair_f1"):
        assert r[m] == pytest.approx(1.0)
    assert r["n_items"] == 5


def test_all_singletons_pred(spark):
    # predicted singletons: perfect precision, poor recall, no predicted pairs
    rows = [(f"p{i}", "x") for i in range(4)]
    r = _eval_row(spark, rows)
    assert r["b3_precision"] == pytest.approx(1.0)
    assert r["b3_recall"] == pytest.approx(0.25)  # 1/|gold cluster|
    assert r["pair_precision"] is None  # 0 predicted pairs -> undefined
    assert r["pair_recall"] == pytest.approx(0.0)


def test_one_big_pred_cluster(spark):
    # everything merged: recall 1, precision = gold purity
    rows = [("p", "x")] * 2 + [("p", "y")] * 2
    r = _eval_row(spark, rows)
    assert r["b3_recall"] == pytest.approx(1.0)
    assert r["b3_precision"] == pytest.approx(0.5)
    assert r["pair_recall"] == pytest.approx(1.0)
    # pairs: tp = 2*C(2,2 within cells)=2, pp = C(4,2)=6
    assert r["pair_precision"] == pytest.approx(2 / 6)


def test_bcubed_hand_example(spark):
    # Amigo et al. style: pred A={x,x,y}, B={y}
    rows = [("A", "x"), ("A", "x"), ("A", "y"), ("B", "y")]
    r = _eval_row(spark, rows)
    # per-item precision: x-items 2/3 each, y-in-A 1/3, y-in-B 1
    assert r["b3_precision"] == pytest.approx((2 / 3 + 2 / 3 + 1 / 3 + 1) / 4)
    # per-item recall: x-items 2/2, y-items 1/2 each
    assert r["b3_recall"] == pytest.approx((1 + 1 + 0.5 + 0.5) / 4)


# ------------------------------------------------------------------ golden


@pytest.fixture(scope="module")
def golden(spark):
    rows = [
        # cluster 1: lengths 10, 12, 12 -> canonical = id 2 (longest, tie min id)
        (1, "short one", "en", "s1", 10),
        (2, "longer text1", "en", "s2", 12),
        (3, "longer text2", "fr", "s2", 12),
        # cluster 2: singleton
        (9, "solo", "de", "s9", 4),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "doc_id long, cluster_id long"
    )
    return {r["cluster_id"]: r for r in golden_records(docs, assign).collect()}


def test_canonical_longest_then_min_id(golden):
    assert golden[1]["canonical_id"] == 2
    assert golden[1]["text"] == "longer text1"
    assert golden[1]["cluster_size"] == 3


def test_mode_with_tiebreak(golden):
    assert golden[1]["lang"] == "en"  # 2 en vs 1 fr
    assert golden[1]["source"] == "s2"  # 2 s2 vs 1 s1
    assert golden[9]["lang"] == "de" and golden[9]["cluster_size"] == 1


def test_mode_tie_takes_smallest_value(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb", "en", "sB", 5), (2, "cc dd", "fr", "sA", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assign = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, cluster_id long")
    (r,) = golden_records(docs, assign).collect()
    assert r["lang"] == "en" and r["source"] == "sA"  # 1-1 ties -> min value
    assert r["canonical_id"] == 1  # equal length -> min id


# ------------------------------------------------------------------- spans


def _spans(spark, docs, k=4):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = duplicated_spans(df, "doc_id", "text", k=k)
    return sorted((r["id"], r["span_start"], r["span_end"], r["span_tokens"]) for r in out.collect())


def test_shared_span_found_in_both_docs(spark):
    shared = "w1 w2 w3 w4 w5"  # 5 tokens -> two overlapping 4-windows, one span
    docs = [
        (1, f"a b c {shared} d e"),
        (2, f"{shared} x y z q"),
    ]
    got = _spans(spark, docs, k=4)
    # doc 1: shared starts at token 4 -> span tokens 4..8; doc 2: 1..5
    assert (1, 4, 8, 5) in got and (2, 1, 5, 5) in got
    assert len(got) == 2


def test_within_doc_repeat_is_not_cross_doc_dup(spark):
    docs = [
        (1, "p q r s p q r s"),  # repeats within one doc only
        (2, "totally different words here now"),
    ]
    assert _spans(spark, docs, k=4) == []


def test_adjacent_windows_merge_disjoint_spans_split(spark):
    blockA = "a1 a2 a3 a4"
    blockB = "b1 b2 b3 b4"
    docs = [
        (1, f"{blockA} gap1 gap2 gap3 gap4 gap5 {blockB}"),
        (2, f"{blockA} other tokens {blockB}"),
    ]
    got = _spans(spark, docs, k=4)
    d1 = [g for g in got if g[0] == 1]
    assert len(d1) == 2  # two maximal spans, not merged across the gap
    assert (1, 1, 4, 4) in d1 and (1, 10, 13, 4) in d1


def test_docs_shorter_than_k_are_skipped(spark):
    docs = [(1, "a b"), (2, "a b")]
    assert _spans(spark, docs, k=4) == []


def test_hash_fingerprint_path_equals_text_path(spark):
    """The production 128-bit xxhash64 shuffle key yields the identical
    span set as the exact window-string key."""
    docs = [
        (1, "a b c d e f g h gap1 gap2 gap3 gap4 gap5 p q r s"),
        (2, "a b c d e f g h filler p q r s t u v"),
        (3, "nothing shared with anyone here at all today ok"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = sorted(map(tuple, duplicated_spans(df, k=4).collect()))
    hashed = sorted(
        map(tuple, duplicated_spans(df, k=4, fingerprint="xxhash64").collect())
    )
    assert exact == hashed and len(exact) > 0


def test_remove_spans_cuts_only_covered_tokens(spark):
    from dedupe_spark.operators.dedup import remove_spans

    docs = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8"), (2, "u1 u2 u3")],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [(1, 3, 5), (1, 7, 7)], "id long, span_start long, span_end long"
    )
    got = {r["id"]: r for r in remove_spans(docs, spans).collect()}
    assert got[1]["clean_text"] == "t1 t2 t6 t8"
    assert got[1]["n_tokens"] == 8 and got[1]["n_removed"] == 4
    # span-free doc passes through untouched
    assert got[2]["clean_text"] == "u1 u2 u3" and got[2]["n_removed"] == 0


def test_remove_spans_keep_one_copy_policy(spark):
    """Caller-side ownership: filter the span table to non-owner docs
    before cutting — the canonical copy keeps its text."""
    from dedupe_spark.operators.dedup import duplicated_spans, remove_spans

    shared = "s1 s2 s3 s4"
    docs = spark.createDataFrame(
        [(1, f"{shared} tail1 tail2"), (2, f"{shared} other3 other4")],
        "doc_id long, text string",
    )
    spans = duplicated_spans(docs, k=4)
    owners = spans.groupBy("span_start", "span_end").agg(F.min("id").alias("owner"))
    cut = spans.join(owners, ["span_start", "span_end"]).where(
        F.col("id") != F.col("owner")
    ).select("id", "span_start", "span_end")
    got = {r["id"]: r for r in remove_spans(docs, cut).collect()}
    assert got[1]["n_removed"] == 0  # owner keeps the span
    assert got[2]["clean_text"] == "other3 other4"  # copy trimmed


# ---------------------------------------------------------------- scorer_auc


def test_scorer_auc_perfect_and_inverted(spark):
    """A scorer that ranks every positive above every negative has
    AUC 1; the inverted scorer has AUC 0; hand-checked ties count
    half (Mann-Whitney)."""
    from dedupe_spark.operators.evaluation import scorer_auc

    perfect = spark.createDataFrame(
        [(10, True), (9, True), (2, False), (1, False)],
        "score long, is_match boolean",
    )
    (r,) = scorer_auc(perfect, "score", "is_match").collect()
    assert (r["auc"], r["n_pos"], r["n_neg"]) == (1.0, 2, 2)

    inverted = spark.createDataFrame(
        [(1, True), (2, True), (9, False), (10, False)],
        "score long, is_match boolean",
    )
    (r,) = scorer_auc(inverted, "score", "is_match").collect()
    assert r["auc"] == 0.0

    # one positive at 5, one negative tied at 5, one negative at 3:
    # AUC = (1*(1 + 0.5*1)) / (1*2) = 0.75
    ties = spark.createDataFrame(
        [(5, True), (5, False), (3, False)], "score long, is_match boolean"
    )
    (r,) = scorer_auc(ties, "score", "is_match").collect()
    assert r["auc"] == 0.75


def test_scorer_auc_single_class_is_null(spark):
    """AUC is undefined with one class — NULL, not a misleading 0/1."""
    from dedupe_spark.operators.evaluation import scorer_auc

    one_class = spark.createDataFrame(
        [(5, True), (7, True)], "score long, is_match boolean"
    )
    (r,) = scorer_auc(one_class, "score", "is_match").collect()
    assert r["auc"] is None and r["n_pos"] == 2 and r["n_neg"] == 0


def test_golden_record_mode_tie_prefers_populated_value(spark):
    """On a frequency tie between NULL and a real value, survivorship
    picks the real value (asc_nulls_last), not NULL."""
    from dedupe_spark.operators.canonical import golden_records

    docs = spark.createDataFrame(
        [
            (1, "text one long", None, "s", 13),
            (2, "text two long!", None, "s", 14),
            (3, "text three xl!!", "en", "s", 15),
            (4, "text four xxl!!!", "en", "s", 16),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assign = spark.createDataFrame([(i, 1) for i in (1, 2, 3, 4)], "doc_id long, cluster_id long")
    (r,) = golden_records(docs, assign).collect()
    assert r["lang"] == "en"
