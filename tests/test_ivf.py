"""IVF ANN properties: full-probe exactness, deterministic training,
Lloyd refinement, empty-cell handling. The q39 oracle covers the
zero-iteration quantizer; these cover what SQL can't (iterative
averaging diverges across engines' float paths, so Lloyd is
property-tested instead of oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_topk,
    ivf_train,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_ivf_full_probe_equals_brute_force(spark):
    """nprobe = n_centroids probes every cell, and each vector lives in
    exactly one cell — the union of probed cells is the whole corpus, so
    IVF must reproduce exact brute-force top-k."""
    e = _emb(spark)
    q = e.where(F.col("vec_id") < 5)
    cents = ivf_train(e, n_centroids=8, iterations=0)
    exact = sorted(
        map(tuple, brute_force_topk(e, q, k=5).select("query_id", "neighbor_id", "rank").collect())
    )
    full = sorted(
        map(tuple, ivf_topk(e, q, cents, k=5, nprobe=8).select("query_id", "neighbor_id", "rank").collect())
    )
    assert full == exact


def test_ivf_train_deterministic(spark):
    e = _emb(spark)
    a = sorted(map(tuple, ivf_train(e, n_centroids=4, iterations=2).collect()))
    b = sorted(map(tuple, ivf_train(e, n_centroids=4, iterations=2).collect()))
    assert a == b


def test_lloyd_iteration_reduces_distortion(spark):
    """One Lloyd step reassigns vectors to data-adapted centroids; mean
    quantization distortion (1 - cosine to assigned centroid) must not
    increase vs the arbitrary lowest-id init."""
    e = _emb(spark)

    def distortion(cents):
        a = ivf_assign(e, cents)
        c = cents.select(F.col("cid").alias("cell"), "cv")
        from dedupe_spark.operators.similarity import _dot, _norm

        j = a.join(F.broadcast(c), "cell").withColumn(
            "cos", _dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * _norm(F.col("cv")))
        )
        return j.agg(F.avg(1 - F.col("cos"))).collect()[0][0]

    d0 = distortion(ivf_train(e, n_centroids=8, iterations=0))
    d1 = distortion(ivf_train(e, n_centroids=8, iterations=1))
    assert d1 <= d0 + 1e-9, (d0, d1)


def test_lloyd_empty_cell_keeps_previous_centroid(spark):
    """Two identical init vectors -> every point assigns to the lower
    cid (tie-break) -> the other cell is empty and must survive the
    iteration with its previous centroid instead of vanishing."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),  # duplicate of vec 0 -> init c1 == c0
        (2, [0.9, 0.1, 0.0]),
        (3, [0.8, 0.2, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_train(df, n_centroids=2, iterations=1)
    got = {r["cid"]: [round(x, 4) for x in r["cv"]] for r in cents.collect()}
    assert set(got) == {0, 1}
    assert got[1] == [1.0, 0.0, 0.0]  # empty cell kept its init centroid


def test_q39_matches_duckdb_oracle(spark):
    """Local replica of the driver gate for q39 at sf0.001."""
    import duckdb

    import __spark_entry__ as entrymod

    got = sorted(
        map(tuple, entrymod.queries()["q39_ivf_ann_topk"](spark, SF_DIR).collect())
    )
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    want = sorted(map(tuple, duck.execute(entrymod.oracle_sql()["q39_ivf_ann_topk"]).fetchall()))
    assert got == want
