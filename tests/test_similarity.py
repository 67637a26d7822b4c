from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.similarity import brute_force_topk, bucketed_topk


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 8)).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(60)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist(), vecs


def _numpy_topk(vecs, qids, k):
    norms = np.linalg.norm(vecs, axis=1)
    out = {}
    for q in qids:
        cos = vecs @ vecs[q] / (norms * norms[q])
        order = sorted(range(len(vecs)), key=lambda i: (-cos[i], i))
        out[q] = [i for i in order if i != q][:k]
    return out


def test_brute_force_matches_numpy(spark, vectors):
    df, vecs = vectors
    queries = df.where(F.col("vec_id") < 3)
    got = {}
    for r in brute_force_topk(df, queries, k=5).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    expect = _numpy_topk(vecs, [0, 1, 2], 5)
    for q in expect:
        assert [n for _, n in sorted(got[q])] == expect[q]


def test_bucketed_finds_planted_near_duplicates(spark):
    # the bucketed path's contract: near-identical vectors share the sign
    # bucket (their projections barely move), so planted near-dups are found
    rng = np.random.default_rng(11)
    base = rng.normal(size=(20, 8)).astype(np.float32)
    rows = []
    for i in range(20):
        rows.append((i, base[i].tolist()))
        rows.append((100 + i, (base[i] + rng.normal(scale=0.01, size=8).astype(np.float32)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.where(F.col("vec_id") < 20)
    got = {}
    for r in bucketed_topk(df, queries, k=1, planes=2, dim=8).collect():
        got[r["query_id"]] = r["neighbor_id"]
    hits = sum(1 for q, n in got.items() if n == q + 100)
    assert hits >= 18, f"only {hits}/20 planted near-dups found"


def test_multiprobe_lifts_recall(spark, vectors):
    """Multi-probe (Hamming-1 buckets) recall vs brute-force is >= the
    single-bucket probe's, and strictly higher on this fixture (random
    gaussian vectors put many queries near a hyperplane boundary).
    Documented tradeoff: 1 -> 1+planes buckets probed per query."""
    df, vecs = vectors
    queries = df.where(F.col("vec_id") < 20)
    truth = _numpy_topk(vecs, range(20), 5)

    def recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hit = sum(len(got.get(q, set()) & set(t)) for q, t in truth.items())
        return hit / sum(len(t) for t in truth.values())

    single = recall(bucketed_topk(df, queries, k=5, planes=3, dim=8).collect())
    multi = recall(bucketed_topk(df, queries, k=5, planes=3, multiprobe=True, dim=8).collect())
    assert multi >= single
    assert multi > single  # boundary queries exist in this fixture
    assert multi >= 0.6


def test_multiprobe_no_duplicate_neighbors(spark, vectors):
    df, _ = vectors
    queries = df.where(F.col("vec_id") < 5)
    rows = bucketed_topk(df, queries, k=50, planes=2, multiprobe=True, dim=8).collect()
    seen = set()
    for r in rows:
        assert (r["query_id"], r["neighbor_id"]) not in seen
        seen.add((r["query_id"], r["neighbor_id"]))


def test_bucketed_is_subset_semantics(spark, vectors):
    df, _ = vectors
    queries = df.where(F.col("vec_id") < 5)
    rows = bucketed_topk(df, queries, k=3, planes=2, dim=8).collect()
    # ranks are dense 1..k' per query and neighbors never include the query
    by_q = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_hyperplane_buckets_beat_axis_aligned_on_correlated_embeddings():
    """VERDICT r3 #4: axis-aligned first-k-coordinate sign buckets are
    weak LSH for real embeddings (leading dims correlated/low-variance).
    On a fixture shaped like that, the Philox-seeded random-hyperplane
    buckets (the shipped implementation) must (a) recover near-dup pairs
    at least as often and (b) avoid the degenerate all-one-bucket layout
    the axis variant collapses to. Pure-numpy check of the identical
    plane matrix `hyperplane_rows` feeds the Spark/DuckDB expressions."""
    import numpy as np

    from dedupe_spark.operators.dedup import hyperplane_rows

    rng = np.random.default_rng(7)
    n, dim, planes = 400, 64, 3
    base = rng.standard_normal((n, dim))
    # real-embedding shape 1: leading dims near-zero (low variance)
    base[:, :8] = rng.standard_normal((n, 8)) * 0.01
    dup = base + rng.standard_normal((n, dim)) * 0.05  # cosine ~0.99 pairs

    planes_m = np.array(hyperplane_rows(planes, dim))

    def hp_bits(x):
        return x @ planes_m.T > 0

    def ax_bits(x):  # the removed round-3 scheme, kept here as the baseline
        return x[:, :planes] > 0

    hp_recall = float(np.mean((hp_bits(base) == hp_bits(dup)).all(axis=1)))
    ax_recall = float(np.mean((ax_bits(base) == ax_bits(dup)).all(axis=1)))
    assert hp_recall >= ax_recall
    assert hp_recall >= 0.9  # projections dominated by signal, signs stable

    def max_bucket_frac(bits):
        keys = bits @ (2 ** np.arange(planes))
        _, counts = np.unique(keys, return_counts=True)
        return counts.max() / len(keys)

    # real-embedding shape 2: leading dims biased positive (correlated) —
    # the axis scheme collapses every vector into ONE bucket; random
    # hyperplanes keep the layout usable
    base2 = base.copy()
    base2[:, :planes] += 3.0
    assert max_bucket_frac(ax_bits(base2)) == 1.0
    assert max_bucket_frac(hp_bits(base2)) < max_bucket_frac(ax_bits(base2))
    assert max_bucket_frac(hp_bits(base)) <= 0.5  # balanced on centered data


def test_zero_norm_vector_scores_zero_not_crash(spark):
    """ANSI mode (Spark 4 default) aborts on divide-by-zero: a zero-norm
    embedding (empty doc) must score cosine 0, not kill the job."""
    from dedupe_spark.operators.similarity import brute_force_topk

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    queries = vecs.where("vec_id = 1")
    rows = brute_force_topk(
        vecs, queries, id_col="vec_id", vec_col="embedding", k=5
    ).collect()
    assert len(rows) == 2  # both non-query vectors ranked, no crash
