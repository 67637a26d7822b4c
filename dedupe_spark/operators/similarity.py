"""Similarity search over embedding columns (`embeddings` table).

Baseline: brute-force cosine top-k — a broadcast join of the (small)
query set against all vectors, dot products via ``zip_with`` (JVM-side,
codegen'd), top-k via a per-query window. Scale path: IVF-style
bucketing — assign every vector to a deterministic coarse bucket, probe
only matching buckets. At 100 TB the bucketed variant turns an O(N*Q)
scan into O(N/k * Q) with the bucket assignment done once and stored.

No UDFs anywhere in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dedupe_spark.operators.dedup import _sign_bucket


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    The query side is broadcast (small); ranking is a window partitioned
    by query — parallel across queries, no global sort. Ties broken by
    neighbor id for determinism.
    """
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v"), _norm(F.col(vec_col)).alias("nv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), _norm(F.col(vec_col)).alias("nq")
    )
    scored = (
        v.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("v"), F.col("qv")) / (F.col("nv") * F.col("nq")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _flip_bit(bucket: Column, i: int, planes: int) -> Column:
    """The bucket string with bit ``i`` flipped (Hamming-1 neighbor)."""
    return F.concat(
        F.substring(bucket, 1, i),
        F.when(F.substring(bucket, i + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
        F.substring(bucket, i + 2, planes - i - 1),
    )


def bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = 3,
    multiprobe: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: probe only vectors in the query's sign bucket.

    The bucket key is a deterministic sign pattern (no randomness —
    reproducible across runs/clusters). Recall trades off with ``planes``;
    at scale, store the bucket as a table column and partition by it so a
    probe touches 1/2^planes of the data (partition pruning does the rest).

    ``multiprobe=True`` (off by default) additionally probes every
    Hamming-1 neighboring bucket — the standard multi-probe LSH recall
    lift for queries near a hyperplane boundary. Cost scales from 1 to
    1+planes buckets per query (still partition-pruned at scale: the
    probe list is explicit bucket keys, never a scan). Each vector lives
    in exactly one bucket, so probes never duplicate a neighbor.

    ``dim``: embedding dimensionality (defaults to the testdata tables';
    the hyperplane normals must span exactly the vector length).
    """
    from dedupe_spark.operators.dedup import EMBEDDING_DIM

    dim = dim or EMBEDDING_DIM
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("nv"),
        _sign_bucket(F.col(vec_col), planes, dim=dim).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("nq"),
        _sign_bucket(F.col(vec_col), planes, dim=dim).alias("bucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"), *[_flip_bit(F.col("bucket"), i, planes) for i in range(planes)]
        )
        q = q.withColumn("bucket", F.explode(probes))
    scored = (
        v.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _dot(F.col("v"), F.col("qv")) / (F.col("nv") * F.col("nq")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
