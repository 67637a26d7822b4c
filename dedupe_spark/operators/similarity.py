"""Similarity search over embedding columns (`embeddings` table).

Baseline: brute-force cosine top-k — a broadcast join of the (small)
query set against all vectors, dot products via ``zip_with`` (JVM-side,
codegen'd), top-k via a per-query window. Two scale paths, both turning
the O(N*Q) scan into O(N/cells * Q * nprobe) with the assignment done
once and stored as a partition column:

  * sign-bucket LSH (``bucketed_topk``) — fixed Philox-seeded random
    hyperplanes, no training, optional Hamming-1 multi-probe;
  * IVF (``ivf_train``/``ivf_topk``) — data-adapted coarse centroids
    (deterministic init + Lloyd iterations as DataFrame aggregates),
    nprobe nearest cells per query.

No UDFs anywhere in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dedupe_spark.operators.dedup import _sign_bucket


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _cosine(dot: Column, na: Column, nb: Column) -> Column:
    """dot/(na*nb) with a zero-norm guard: Spark 4 defaults to ANSI mode,
    where an unguarded division by a zero-norm vector (empty/whitespace
    doc embedded as all-zeros) raises DIVIDE_BY_ZERO and aborts the whole
    job — a zero vector has no direction, score it 0, not a crash."""
    denom = na * nb
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


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
        .withColumn("cosine", _cosine(_dot(F.col("v"), F.col("qv")), F.col("nv"), F.col("nq")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest coarse centroid (highest
    cosine, ties -> lowest centroid id): (id, v, nv, cell).

    ``centroids`` is a SMALL (cid, cv) frame — broadcast; the assignment
    is one codegen'd projection + per-vector window over n_centroids
    rows, no UDF, no wide shuffle (the window partitions by vector id).
    At 100 TB the cell becomes a stored partition column exactly like
    the sign bucket — written once at ingest, pruned at probe time.
    """
    c = centroids.select(
        F.col("cid"), F.col("cv"), _norm(F.col("cv")).alias("nc")
    )
    scored = (
        vectors.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"), _norm(F.col(vec_col)).alias("nv")
        )
        .join(F.broadcast(c))
        .withColumn("s", _cosine(_dot(F.col("v"), F.col("cv")), F.col("nv"), F.col("nc")))
    )
    w = Window.partitionBy("id").orderBy(F.desc("s"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "v", "nv", F.col("cid").alias("cell"))
    )


def ivf_train(
    vectors: DataFrame,
    n_centroids: int = 8,
    iterations: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse-quantizer training: (cid, cv).

    Init: the embeddings of the ``n_centroids`` lowest vector ids (no
    RNG — reproducible across runs and cluster sizes, the determinism
    rule SURVEY §7 sets). Each Lloyd iteration reassigns every vector to
    its nearest centroid and recomputes centroids as the element-wise
    mean of their members: posexplode -> groupBy(cell, pos) -> avg ->
    re-assemble, all JVM-side aggregates (one shuffle keyed on
    (cell, dim-index) per iteration — never a collect of the vectors).
    Empty cells keep their previous centroid.
    """
    init = (
        vectors.orderBy(F.asc(id_col))
        .limit(n_centroids)
        .select(F.col(id_col).cast("long").alias("_oid"), F.col(vec_col).alias("cv"))
    )
    w0 = Window.orderBy(F.asc("_oid"))
    cents = init.select(
        (F.row_number().over(w0) - 1).cast("long").alias("cid"), "cv"
    )
    for _ in range(iterations):
        assigned = ivf_assign(vectors, cents, id_col=id_col, vec_col=vec_col)
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                F.col("cell").alias("cid"),
                F.transform("pm", lambda s: s["m"].cast("float")).alias("cv"),
            )
        )
        # empty cells keep their previous centroid (left join fills gaps)
        cents = (
            cents.select("cid", F.col("cv").alias("cv_old"))
            .join(means.select("cid", F.col("cv").alias("cv_new")), "cid", "left")
            .select("cid", F.coalesce("cv_new", "cv_old").alias("cv"))
        )
    return cents


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` cells nearest to each
    query, brute-force only inside them: (query_id, neighbor_id, cosine,
    rank).

    The inverted-file structure is the cell assignment (``ivf_assign``);
    at scale it is a stored partition column, so a probe reads
    nprobe/n_centroids of the data via partition pruning — the IVF scale
    path the sign-bucket LSH variant (``bucketed_topk``) trades against:
    IVF adapts cells to the data distribution (trained centroids),
    LSH needs no training. With ``nprobe >= n_centroids`` the result
    equals brute force exactly (tested).
    """
    v = ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col).select(
        F.col("id").alias("neighbor_id"), "v", "nv", "cell"
    )
    c = centroids.select("cid", "cv", _norm(F.col("cv")).alias("nc"))
    qs = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), _norm(F.col(vec_col)).alias("nq")
        )
        .join(F.broadcast(c))
        .withColumn("s", _cosine(_dot(F.col("qv"), F.col("cv")), F.col("nq"), F.col("nc")))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("cid"))
    probes = (
        qs.withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= nprobe)
        .select("query_id", "qv", "nq", F.col("cid").alias("cell"))
    )
    scored = (
        v.join(F.broadcast(probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _cosine(_dot(F.col("v"), F.col("qv")), F.col("nv"), F.col("nq")))
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
        # outer + not-null: see blocking.explode_blocks (the inferred
        # size>0 filter would substitute the sign-bucket tree per probe)
        q = q.withColumn("bucket", F.explode_outer(probes)).where(
            F.col("bucket").isNotNull()
        )
    scored = (
        v.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", _cosine(_dot(F.col("v"), F.col("qv")), F.col("nv"), F.col("nq")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )

def semantic_dedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    threshold: float = 0.95,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): semantic near-duplicate
    pruning via embedding clusters — (id, cell, nn_sim, n_dups, keep).

    Cluster the corpus into coarse cells (the IVF quantizer), compute
    pairwise cosine only WITHIN each cell, and drop every vector that
    has a sufficiently-similar cell-mate with a lower id (the greedy
    lowest-id-representative policy: deterministic, one pass, and the
    published SemDeDup recipe's "keep one per similar group" semantics
    without an iterative clustering step; exact transitive resolution
    is available by feeding the >=threshold pairs to
    operators.clustering.cluster_edges instead). ``nn_sim`` is the max
    cosine to any other cell member (-1.0 for singleton cells) — the
    diagnostic the threshold is tuned against.

    Scale shape: the only quadratic work is per-cell, bounded by cell
    size — exactly the paper's trick; the cell id is a stored partition
    column at 100 TB (written once at ingest), so each executor handles
    whole cells with no cross-cell traffic, and the assignment itself
    is a broadcast join. ``centroids`` defaults to the deterministic
    zero-iteration ``ivf_train`` init so the whole operator is
    SQL-oracle-expressible; pass Lloyd-trained centroids in production.
    Replaces nothing in the reference (it has no embedding ops) — this
    is part of the training-data-pipeline surface next to q30/q35/q39.
    """
    cents = centroids if centroids is not None else ivf_train(
        vectors, n_centroids=n_centroids, iterations=0, id_col=id_col, vec_col=vec_col
    )
    a = ivf_assign(vectors, cents, id_col=id_col, vec_col=vec_col)
    l = a.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nv").alias("na"), "cell")
    r = a.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nv").alias("nb"), "cell")
    pairs = (
        l.join(r, "cell")
        .where(F.col("id_a") != F.col("id_b"))
        .withColumn("cos", _cosine(_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")))
    )
    per_id = pairs.groupBy("id_a").agg(
        F.max("cos").alias("nn_sim"),
        F.sum((F.col("cos") >= F.lit(threshold)).cast("long")).alias("n_dups"),
        F.max(
            ((F.col("cos") >= F.lit(threshold)) & (F.col("id_b") < F.col("id_a"))).cast("int")
        ).alias("has_lower_dup"),
    )
    return (
        a.select(F.col("id").alias("id_a"), "cell")
        .join(per_id, "id_a", "left")
        .select(
            F.col("id_a").alias(id_col),
            "cell",
            F.round(F.coalesce("nn_sim", F.lit(-1.0)), 6).alias("nn_sim"),
            F.coalesce("n_dups", F.lit(0)).cast("long").alias("n_dups"),
            (F.coalesce("has_lower_dup", F.lit(0)) == 0).alias("keep"),
        )
    )
