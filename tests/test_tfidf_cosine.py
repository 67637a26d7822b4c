"""tfidf_cosine_on_pairs vs a brute-force numpy reference.

The sf-table variant (q63) gets the DuckDB-oracle treatment in
test_entry_oracle.py; here the math itself is checked on a corpus small
enough to hand-verify, including the degenerate norms.
"""

from __future__ import annotations

import math

import pytest

from dedupe_spark.operators.scoring import tfidf_cosine_on_pairs


def _brute(docs: dict[int, str], id_a: int, id_b: int) -> float:
    n = len(docs)
    tf: dict[int, dict[str, int]] = {}
    for i, text in docs.items():
        tf[i] = {}
        for t in text.strip().split():
            tf[i][t] = tf[i].get(t, 0) + 1
    df = {}
    for i in tf:
        for t in tf[i]:
            df[t] = df.get(t, 0) + 1
    w = {i: {t: c * math.log(n / df[t]) for t, c in tf[i].items()} for i in tf}
    dot = sum(w[id_a][t] * w[id_b].get(t, 0.0) for t in w[id_a])
    na = math.sqrt(sum(v * v for v in w[id_a].values()))
    nb = math.sqrt(sum(v * v for v in w[id_b].values()))
    if na == 0 or nb == 0:
        return 0.0
    return dot / (na * nb)


DOCS = {
    1: "the quick brown fox jumps",
    2: "the quick brown fox leaps",
    3: "completely different transcript content here",
    4: "the the the",  # only a corpus-universal token -> weight depends on df
    5: "quick brown quick brown",
}


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(list(DOCS.items()), "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 5), (1, 4)], "id_a long, id_b long"
    )
    return docs, pairs


def test_matches_brute_force(spark, frames):
    docs, pairs = frames
    got = {
        (r["id_a"], r["id_b"]): r["tfidf_cosine"]
        for r in tfidf_cosine_on_pairs(docs, pairs, "doc_id", "text").collect()
    }
    assert set(got) == {(1, 2), (1, 3), (2, 5), (1, 4)}
    for (a, b), v in got.items():
        assert v == pytest.approx(round(_brute(DOCS, a, b), 6), abs=1e-6)


def test_disjoint_pair_scores_zero(spark, frames):
    docs, pairs = frames
    got = {
        (r["id_a"], r["id_b"]): r["tfidf_cosine"]
        for r in tfidf_cosine_on_pairs(docs, pairs, "doc_id", "text").collect()
    }
    assert got[(1, 3)] == 0.0


def test_identical_docs_score_one(spark):
    rows = [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "unrelated words only")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    (r,) = tfidf_cosine_on_pairs(docs, pairs, "doc_id", "text").collect()
    assert r["tfidf_cosine"] == pytest.approx(1.0, abs=1e-6)


def test_null_text_side_scores_zero_not_dropped(spark):
    """A pair whose side has NULL text (or is missing from docs) must
    appear in the output with cosine 0 — not silently vanish."""
    from dedupe_spark.operators.scoring import tfidf_cosine_on_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, None)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 99)], "id_a long, id_b long"  # 99 absent from docs
    )
    got = {
        (r["id_a"], r["id_b"]): r["tfidf_cosine"]
        for r in tfidf_cosine_on_pairs(docs, pairs, "doc_id", "text").collect()
    }
    assert got == {(1, 2): 0.0, (1, 99): 0.0}
