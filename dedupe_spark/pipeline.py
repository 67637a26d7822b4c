"""End-to-end entity-resolution pipeline over transcript tables.

The reference's flagship flow (``insert_files``,
/root/reference/src/deduplication.cpp:517-655) becomes one declarative
batch job:

  transcripts
    -> register_turns (unique-turn registry + membership)     [D1]
    -> conversation docs (stable turn order)                  [S6 analog]
    -> blocking keys: exact md5 + MinHash/LSH bands           [C1, C2]
    -> bloom pre-prune + salted skew-aware self-join          [I1, D1]
    -> vectorized pair scoring (Jaccard gate -> Jaro-Winkler) [D2]
    -> thresholded edges + exact-fp edges
    -> large-star/small-star connected components             [clusters]
    -> clusters / metrics committed as catalog snapshots      [S4]
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dedupe_spark.catalog import SnapshotCatalog
from dedupe_spark.operators import blocking, clustering, lifecycle, minhash, normalize, scoring


@dataclass
class PipelineConfig:
    shingle_k: int = 3
    num_perm: int = 128
    bands: int = 32
    seed: int = 42
    max_block: int = blocking.DEFAULT_MAX_BLOCK
    salt_threshold: int = blocking.DEFAULT_SALT_THRESHOLD
    salt_groups: int = blocking.DEFAULT_SALT_GROUPS
    min_len_ratio: float = scoring.MIN_LEN_RATIO
    # ambiguous-band second-stage scorer: "levenshtein" (pure JVM, fastest)
    # or "jaro_winkler" (batch-vectorized Arrow UDF — the north star's
    # named scorer; same F1 on the labeled fixture, see test_scoring)
    decider: str = "levenshtein"
    # "bloom" = explicit map-side Bloom pre-prune (functions/bloom.py);
    # "semi" = semi-join + Catalyst runtime bloom filter;
    # "auto" (default) = bloom while the repeated-key bitmap fits
    # bloom_max_driver_bytes, semi beyond it — the 10^12-key registry
    # can never pin a multi-TB bitmap on the driver
    bloom_mode: str = "auto"
    bloom_shards: int = 1
    bloom_max_driver_bytes: int = blocking.DEFAULT_BLOOM_BUDGET_BYTES
    # chunk_aac-style blocking-key policy (C4, reference
    # src/deduplication.cpp:1350-1390): conversations dominated by
    # tool-role turns (machine output) get exact-fp keys only — the
    # MinHash signature is never computed for them
    aac_policy: bool = True
    aac_exact_tool_frac: float = 0.6
    checkpoint_dir: str | None = None
    resume: bool = False
    # metrics cost ~6 extra jobs (counts); opt in when publishing a run
    compute_metrics: bool = False
    extra: dict = field(default_factory=dict)


@dataclass
class PipelineResult:
    clusters: DataFrame
    edges: DataFrame
    scored_pairs: DataFrame
    candidate_pairs: DataFrame
    docs: DataFrame
    unique_turns: DataFrame
    membership: DataFrame
    metrics: DataFrame
    persisted: list = field(default_factory=list)

    def release(self) -> None:
        """Unpersist every intermediate this run cached. Call after the
        final action on the result DataFrames — repeated pipeline runs in
        one session (bench, notebooks) otherwise accumulate cached tables
        in executor memory."""
        for df in self.persisted:
            df.unpersist()
        self.persisted.clear()


def run(
    transcripts: DataFrame,
    config: PipelineConfig | None = None,
    catalog: SnapshotCatalog | None = None,
) -> PipelineResult:
    cfg = config or PipelineConfig()
    spark = transcripts.sparkSession
    persisted: list[DataFrame] = []

    # 1. turn-level registry (exact dedup of turns, the reference's core)
    unique_turns, membership = lifecycle.register_turns(transcripts, deps=persisted)

    # 2. conversation documents in stable (conv_id, turn_idx) order
    docs = normalize.conversation_docs(transcripts)
    docs = docs.withColumn("exact_fp", F.md5("doc"))
    if cfg.aac_policy:
        # C4 dispatch: tool-dominated conversations skip the signature
        # UDF entirely (empty band set -> exact-fp edges only); the
        # identical agg subtrees under both filters collapse via
        # Catalyst's ReuseExchange, so this costs no extra shuffle
        is_exact_only = F.col("tool_frac") >= F.lit(cfg.aac_exact_tool_frac)
        dyn = minhash.with_minhash_bands(
            docs.where(~is_exact_only),
            "doc", k=cfg.shingle_k, num_perm=cfg.num_perm, bands=cfg.bands, seed=cfg.seed,
            keep_shingles=True,
        )
        # exact-only docs never reach LSH blocking (empty band set) so
        # their shingle array is never read — an empty placeholder keeps
        # the union schema aligned without paying for shingles
        stat = (
            docs.where(is_exact_only)
            .withColumn("bands", F.array().cast("array<string>"))
            .withColumn("sh", F.array().cast("array<long>"))
        )
        docs = dyn.unionByName(stat)
    else:
        docs = minhash.with_minhash_bands(
            docs, "doc", k=cfg.shingle_k, num_perm=cfg.num_perm, bands=cfg.bands, seed=cfg.seed,
            keep_shingles=True,
        )
    # the doc table is reused by blocking AND scoring — cache it once
    docs = docs.persist()
    persisted.append(docs)

    # 3. exact-duplicate edges: linear-size first-writer-wins links
    exact_edges = blocking.exact_key_pairs(docs, "conv_id", "exact_fp")

    # 4. LSH candidate pairs: explode bands -> bloom prune -> salted join
    blocks = blocking.explode_blocks(docs, "conv_id", "bands")
    bloom_stats: dict = {}
    blocks = blocking.bloom_preprune(
        blocks,
        mode=cfg.bloom_mode,
        stats=bloom_stats,
        shards=cfg.bloom_shards,
        max_driver_bytes=cfg.bloom_max_driver_bytes,
        deps=persisted,  # the Bloom's cached broadcast is released with the caches
    )
    cands = blocking.candidate_pairs(
        blocks,
        max_block=cfg.max_block,
        salt_threshold=cfg.salt_threshold,
        salt_groups=cfg.salt_groups,
    )
    # exact pairs need no scoring — drop them from the candidate set
    cands = cands.join(
        exact_edges.withColumnRenamed("id_a", "ea").withColumnRenamed("id_b", "eb"),
        (F.col("id_a") == F.col("ea")) & (F.col("id_b") == F.col("eb")),
        "left_anti",
    )

    # 5. verification scoring (cheap -> expensive)
    scored = scoring.score_pairs(
        cands,
        docs.select("conv_id", "doc", "doc_len", "sh"),
        min_len_ratio=cfg.min_len_ratio,
        decider=cfg.decider,
        sh_col="sh",
        deps=persisted,
    )
    sim_edges = scored.where("is_dup").select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )

    # 6. transitive clustering
    edges = exact_edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(sim_edges)
    # durable-by-default iteration state: when this run has a catalog,
    # CC snapshots land under its warehouse — localCheckpoint state dies
    # with an executor at real scale, a warehouse parquet snapshot doesn't
    # (the loop still uses localCheckpoint for lineage truncation; the
    # warehouse snapshots are the resume/verify points)
    checkpoint_dir = cfg.checkpoint_dir
    if checkpoint_dir is None and catalog is not None:
        warehouse = getattr(catalog, "warehouse", None)
        if warehouse:
            import os

            checkpoint_dir = os.path.join(warehouse, "_cc_checkpoints")
    cc = clustering.connected_components(
        edges, checkpoint_dir=checkpoint_dir, resume=cfg.resume
    )
    clusters = clustering.clusters_with_singletons(docs.select("conv_id"), cc)

    if cfg.compute_metrics or catalog is not None:
        metrics = _metrics(docs, blocks, cands, scored, clusters, bloom_stats, cfg)
    else:
        metrics = spark.createDataFrame([], "metric string, value double")

    result = PipelineResult(
        clusters=clusters,
        edges=edges,
        scored_pairs=scored,
        candidate_pairs=cands,
        docs=docs,
        unique_turns=unique_turns,
        membership=membership,
        metrics=metrics,
        persisted=persisted,
    )
    if catalog is not None:
        commit(result, catalog)
    return result


def _metrics(docs, blocks, cands, scored, clusters, bloom_stats=None, cfg=None) -> DataFrame:
    spark = docs.sparkSession
    max_block = cfg.max_block if cfg else blocking.DEFAULT_MAX_BLOCK
    # stop-band suppression is never silent: count the keys/rows the
    # df > max_block cap removed from candidate generation (one extra agg)
    dropped = (
        blocking.block_frequencies(blocks)
        .where(F.col("df") > max_block)
        .agg(
            F.count("*").alias("keys"),
            F.coalesce(F.sum("df"), F.lit(0)).alias("rows"),
        )
        .first()
    )
    bloom_mode = (bloom_stats or {}).get("bloom_mode_used", "")
    rows = [
        ("n_conversations", float(docs.count())),
        ("n_block_rows_after_prune", float(blocks.count())),
        ("n_stopband_keys_dropped", float(dropped["keys"])),
        ("n_stopband_rows_dropped", float(dropped["rows"])),
        ("bloom_mode_is_bloom", 1.0 if bloom_mode.startswith("bloom") else 0.0),
        *[
            (k, float(v))
            for k, v in (bloom_stats or {}).items()
            if isinstance(v, (int, float))
        ],
        ("n_candidate_pairs", float(cands.count())),
        ("n_scored_pairs", float(scored.count())),
        ("n_duplicate_pairs", float(scored.where("is_dup").count())),
        ("n_clusters", float(clusters.select("cluster_id").distinct().count())),
    ]
    return spark.createDataFrame(rows, "metric string, value double")


def commit(result: PipelineResult, catalog: SnapshotCatalog) -> None:
    """Atomic publish of all output tables (reference: splice + rename,
    src/deduplication.cpp:612-640). The unique-turn registry is laid out
    bucket-partitioned on fp — the SURVEY §1.2 mapping of HashDB's
    bucketed disk KV (src/HashDB.cpp:339-450) — so registry probes
    (incremental/streaming ingest) prune to the buckets they touch
    instead of rescanning the whole table."""
    catalog.write(
        "unique_turns",
        lifecycle.with_fp_bucket(result.unique_turns),
        partition_by=["fp_bucket"],
    )
    catalog.write("membership", result.membership)
    catalog.write("clusters", result.clusters)
    catalog.write("edges", result.edges)
    catalog.write("metrics", result.metrics)
