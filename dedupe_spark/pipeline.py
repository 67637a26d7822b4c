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

from pyspark.sql import Column, DataFrame, SparkSession, Window
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
    # ambiguous-band second-stage scorer: "levenshtein" (pure JVM, fastest),
    # "jaro_winkler" (batch-vectorized Arrow UDF — the north star's named
    # scorer; same F1 on the labeled fixture, see test_scoring), or
    # "fellegi_sunter" (EM-learned accept rule over the band's comparison
    # vectors, operators/linkage.py — no hand-tuned accept threshold)
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
    # PII scrub BEFORE fingerprinting (operators/privacy.py): two turns
    # differing only in an email/IP/phone still collide on their blocking
    # key, and no raw identifier ever reaches a committed table. Pure
    # codegen'd regex — the 10^12-turn cost is scan bandwidth
    scrub_pii: bool = False
    # per-conversation structural lint table (operators/transcript_qa.py),
    # committed next to clusters so a broken conversation is visible
    # before it becomes its cluster's canonical copy
    lint: bool = False
    # triangle-support cluster repair (operators/clustering.py:
    # prune_weak_edges): accepted near-dup edges with no common neighbor
    # in the full duplicate graph are dropped unless their jaccard is
    # high-confidence — transitive clustering otherwise merges two real
    # entities through one spurious score. Exact-fp edges are certain:
    # they count as witnesses and are never pruned
    cluster_repair: bool = False
    cluster_repair_min_support: int = 1
    cluster_repair_strong: float = 0.9
    checkpoint_dir: str | None = None
    resume: bool = False
    # metrics cost ~6 extra jobs (counts); opt in when publishing a run
    compute_metrics: bool = False
    # A↔B linkage assignment mode (pipeline.link only):
    #   "one_to_one"  — exact links assigned by per-fingerprint rank-zip
    #                   (guaranteed 1:1), fuzzy residual by reciprocal
    #                   best match; no record appears twice
    #   "many_to_one" — every A record keeps its single best link (a
    #                   probe batch matched against a registry; several
    #                   A records may hit the same B record)
    #   "all"         — every accepted link, unassigned (caller resolves)
    link_mode: str = "one_to_one"
    # link(catalog=...) also commits the registry-side probe state
    # (fp index, band blocks, docs+shingles) so link_incremental can
    # probe later batches without re-blocking the registry; disable when
    # the warehouse should hold only the links table (the state costs
    # O(registry) storage and is dead weight if no batches follow)
    link_commit_registry_state: bool = True
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
    lint: DataFrame | None = None
    persisted: list = field(default_factory=list)

    def release(self) -> None:
        """Unpersist every intermediate this run cached. Call after the
        final action on the result DataFrames — repeated pipeline runs in
        one session (bench, notebooks) otherwise accumulate cached tables
        in executor memory."""
        for df in self.persisted:
            df.unpersist()
        self.persisted.clear()


def _docs_with_bands(transcripts: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Conversation docs + exact fp + MinHash band keys (+ shingles).

    Shared by the batch and incremental paths so both derive IDENTICAL
    blocking keys from the same text — key parity is what makes the
    incremental candidate probe equivalent to the batch self-join.
    """
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
        return dyn.unionByName(stat)
    return minhash.with_minhash_bands(
        docs, "doc", k=cfg.shingle_k, num_perm=cfg.num_perm, bands=cfg.bands, seed=cfg.seed,
        keep_shingles=True,
    )


def run(
    transcripts: DataFrame,
    config: PipelineConfig | None = None,
    catalog: SnapshotCatalog | None = None,
) -> PipelineResult:
    cfg = config or PipelineConfig()
    spark = transcripts.sparkSession
    persisted: list[DataFrame] = []

    # 0. optional per-turn hygiene, BEFORE any fingerprint/key derivation
    lint_df = None
    if cfg.lint:
        from dedupe_spark.operators.transcript_qa import transcript_lint

        lint_df = transcript_lint(transcripts)
    if cfg.scrub_pii:
        from dedupe_spark.operators.privacy import redact_expr

        transcripts = transcripts.withColumn("text", redact_expr(F.col("text")))

    # 1. turn-level registry (exact dedup of turns, the reference's core)
    unique_turns, membership = lifecycle.register_turns(transcripts, deps=persisted)

    # 2. conversation documents in stable (conv_id, turn_idx) order
    docs = _docs_with_bands(transcripts, cfg)
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
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "jaccard"
    )
    if cfg.cluster_repair:
        sim_edges = clustering.prune_weak_edges(
            sim_edges,
            min_support=cfg.cluster_repair_min_support,
            strong_score=cfg.cluster_repair_strong,
            score_col="jaccard",
            witness_edges=exact_edges.select(
                F.col("id_a").alias("src"), F.col("id_b").alias("dst")
            ),
        )
    sim_edges = sim_edges.select("src", "dst")

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
        lint=lint_df,
        persisted=persisted,
    )
    if catalog is not None:
        commit(result, catalog)
    return result


@dataclass
class LinkResult:
    links: DataFrame
    scored_pairs: DataFrame
    candidate_pairs: DataFrame
    docs_a: DataFrame
    docs_b: DataFrame
    metrics: DataFrame
    persisted: list = field(default_factory=list)

    def release(self) -> None:
        for df in self.persisted:
            df.unpersist()
        self.persisted.clear()


#: Unit-separator side tag: prepended to conv_ids internally so the two
#: sources can share id values without colliding anywhere in the shared
#: blocking/scoring machinery; stripped from every output column.
_SIDE_A = "a\x1f"
_SIDE_B = "b\x1f"


def _tag_side(transcripts: DataFrame, tag: str) -> DataFrame:
    return transcripts.withColumn("conv_id", F.concat(F.lit(tag), F.col("conv_id")))


def _strip_side(col: str) -> Column:
    return F.substring(F.col(col), len(_SIDE_A) + 1, 2**30).alias(col)


def link(
    transcripts_a: DataFrame,
    transcripts_b: DataFrame,
    config: PipelineConfig | None = None,
    catalog: SnapshotCatalog | None = None,
) -> LinkResult:
    """A↔B record linkage: link every conversation in ``transcripts_a``
    to its duplicate in ``transcripts_b`` (two sources describing
    overlapping entities), reusing the self-dedup machinery stage for
    stage — the reference's probe-stream-vs-build-registry flow
    (/root/reference/src/deduplication.cpp:1393-1461) generalized from
    "batch probes its own registry" to "table A probes table B":

      1. per-side docs + exact fp + MinHash band keys (IDENTICAL key
         derivation to ``run`` — _docs_with_bands — so a corpus linked
         today and self-deduped tomorrow agrees on its blocks);
      2. exact links across tables on the fingerprint; one-to-one mode
         rank-zips each fingerprint group (k A-copies × j B-copies give
         min(k, j) links, linear output, no quadratic group fan-out);
      3. fuzzy candidates: Bloom probe of A's blocks against B's key
         set, then the salted skew-aware CROSS join
         (blocking.cross_candidate_pairs — no id_a < id_b, the sides
         are distinct namespaces);
      4. the same cheap→expensive verification scoring as ``run``
         (Jaccard gate → configured decider) over the union doc table;
      5. assignment per ``config.link_mode``: reciprocal-best one-to-one
         (the distributed relaxation of Fellegi-Sunter's 1:1 rule),
         best-per-A many-to-one, or all accepted links.

    Output ``links``: (conv_id_a, conv_id_b, score, link_type) with
    link_type in ('exact', 'near'); exact links carry score 2.0 so they
    outrank any fuzzy score in assignment. Committed to the catalog as
    the ``links`` table when one is passed.
    """
    cfg = config or PipelineConfig()
    if cfg.link_mode not in ("one_to_one", "many_to_one", "all"):
        raise ValueError(f"unknown link_mode: {cfg.link_mode!r}")
    spark = transcripts_a.sparkSession
    persisted: list[DataFrame] = []

    docs_a = _docs_with_bands(_tag_side(transcripts_a, _SIDE_A), cfg).persist()
    docs_b = _docs_with_bands(_tag_side(transcripts_b, _SIDE_B), cfg).persist()
    persisted += [docs_a, docs_b]

    # 2. exact cross links (linear in group size on both sides)
    if cfg.link_mode == "one_to_one":
        wa = Window.partitionBy("exact_fp").orderBy("conv_id")
        ra = docs_a.select("conv_id", "exact_fp").withColumn(
            "_r", F.row_number().over(wa)
        )
        rb = docs_b.select(
            F.col("conv_id").alias("_bid"), "exact_fp"
        ).withColumn("_r", F.row_number().over(Window.partitionBy("exact_fp").orderBy("_bid")))
        exact = ra.join(rb, ["exact_fp", "_r"]).select(
            F.col("conv_id").alias("id_a"), F.col("_bid").alias("id_b")
        )
    else:
        bmin = docs_b.groupBy("exact_fp").agg(F.min("conv_id").alias("id_b"))
        exact = docs_a.select("conv_id", "exact_fp").join(bmin, "exact_fp").select(
            F.col("conv_id").alias("id_a"), "id_b"
        )
    exact = exact.persist()
    persisted.append(exact)

    # 3. fuzzy candidates: bloom probe + salted cross join
    blocks_a = blocking.explode_blocks(docs_a, "conv_id", "bands")
    blocks_b = blocking.explode_blocks(docs_b, "conv_id", "bands")
    bloom_stats: dict = {}
    blocks_a, blocks_b = blocking.cross_bloom_preprune(
        blocks_a, blocks_b,
        mode=cfg.bloom_mode, stats=bloom_stats, shards=cfg.bloom_shards,
        max_driver_bytes=cfg.bloom_max_driver_bytes, deps=persisted,
    )
    cands = blocking.cross_candidate_pairs(
        blocks_a, blocks_b,
        max_block=cfg.max_block,
        salt_threshold=cfg.salt_threshold,
        salt_groups=cfg.salt_groups,
    )
    # exact links need no scoring; sides are distinct namespaces so the
    # orientation is already canonical (id_a from A, id_b from B)
    cands = cands.join(exact, ["id_a", "id_b"], "left_anti")

    # 4. verification scoring over the union doc table (tagged ids make
    # the two sources collision-free in one keyed table)
    scoring_docs = docs_a.select("conv_id", "doc", "doc_len", "sh").unionByName(
        docs_b.select("conv_id", "doc", "doc_len", "sh")
    )
    scored = scoring.score_pairs(
        cands, scoring_docs,
        min_len_ratio=cfg.min_len_ratio, k=cfg.shingle_k,
        decider=cfg.decider, sh_col="sh", deps=persisted,
    )
    near = scored.where("is_dup").select(
        "id_a", "id_b", F.col("jaccard").cast("double").alias("score")
    )

    # 5. assignment
    exact_links = exact.select(
        "id_a", "id_b", F.lit(2.0).alias("score"), F.lit("exact").alias("link_type")
    )
    near_links = near.select("id_a", "id_b", "score", F.lit("near").alias("link_type"))
    if cfg.link_mode == "one_to_one":
        # exact links are 1:1 by rank-zip construction and outrank any
        # fuzzy score; reciprocal-best runs on the residual records only.
        # (Reciprocal-best must NOT see the zip-ranked exact pairs: its
        # smaller-partner tie-break would keep only each group's first
        # rank and drop the rest of a perfectly valid 1:1 assignment.)
        residual = (
            near_links.join(exact_links.select("id_a"), "id_a", "left_anti")
            .join(exact_links.select("id_b"), "id_b", "left_anti")
        )
        from dedupe_spark.operators.linkage import reciprocal_best_links

        links = exact_links.unionByName(
            reciprocal_best_links(residual, "id_a", "id_b", "score")
        )
    elif cfg.link_mode == "many_to_one":
        w = Window.partitionBy("id_a").orderBy(F.col("score").desc(), F.col("id_b").asc())
        links = (
            exact_links.unionByName(near_links)
            .withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .drop("_r")
        )
    else:
        links = exact_links.unionByName(near_links)

    links = links.select(
        _strip_side("id_a").alias("conv_id_a"),
        _strip_side("id_b").alias("conv_id_b"),
        "score",
        "link_type",
    )

    if cfg.compute_metrics or catalog is not None:
        # the links DAG is read up to three times below (n_links metric,
        # catalog.write, the caller's own count) — persist it so the
        # salted cross join + scoring run once, not per action
        links = links.persist()
        persisted.append(links)
        n_a = docs_a.count()
        n_b = docs_b.count()
        n_cand = cands.count()
        n_links = links.count()
        metrics = spark.createDataFrame(
            [
                ("n_records_a", float(n_a)),
                ("n_records_b", float(n_b)),
                ("n_candidate_pairs", float(n_cand)),
                ("n_links", float(n_links)),
                ("link_rate_a", float(n_links) / n_a if n_a else 0.0),
                # 1.0 = map-side Bloom pruned the probe; 0.0 = semi-join
                # fallback (budget or config) — visible from the artifact
                ("bloom_mode_is_bloom", 1.0 if bloom_stats.get("bloom_mode_used") == "bloom" else 0.0),
            ],
            "metric string, value double",
        )
    else:
        metrics = spark.createDataFrame([], "metric string, value double")

    # every exposed frame speaks the caller's id namespace: the internal
    # side tags are stripped from ids on ALL outputs, not just links
    # (note: ids come back as strings — _tag_side stringifies non-string
    # conv_ids; q82 casts back where the source ids were numeric)
    result = LinkResult(
        links=links,
        scored_pairs=scored.withColumn("id_a", _strip_side("id_a")).withColumn(
            "id_b", _strip_side("id_b")
        ),
        candidate_pairs=cands.withColumn("id_a", _strip_side("id_a")).withColumn(
            "id_b", _strip_side("id_b")
        ),
        docs_a=docs_a.withColumn("conv_id", _strip_side("conv_id")),
        docs_b=docs_b.withColumn("conv_id", _strip_side("conv_id")),
        metrics=metrics,
        persisted=persisted,
    )
    if catalog is not None:
        catalog.write("links", links)
        catalog.write("link_metrics", metrics)
    if catalog is not None and cfg.link_commit_registry_state:
        # registry-side probe state, so later probe batches can link
        # against this registry WITHOUT re-blocking it
        # (link_incremental): the registry's exact-fp index and band
        # blocks bucket-partitioned for pruned probes (the same layout
        # the self-dedup incremental path uses), and the normalized
        # registry docs id-bucketed (WITH their distinct-shingle arrays,
        # so per-batch scoring reuses them instead of re-deriving the
        # tokenize+shingle tree every batch). Ids are committed UNTAGGED
        # (the caller's namespace).
        reg_docs = docs_b.select(
            _strip_side("conv_id"), "doc", "doc_len", "sh"
        )
        catalog.write(
            "link_registry_docs",
            lifecycle.with_fp_bucket(
                reg_docs, key_col="conv_id", out_col="id_bucket"
            ),
            partition_by=["id_bucket"],
        )
        catalog.write(
            "link_registry_index",
            _with_key_bucket(
                docs_b.select(_strip_side("conv_id"), "exact_fp"), "exact_fp"
            ),
            partition_by=["key_bucket"],
        )
        catalog.write(
            "link_registry_blocks",
            _with_key_bucket(
                blocking.explode_blocks(docs_b, "conv_id", "bands").select(
                    _strip_side("id").alias("conv_id"), "band_key"
                ),
                "band_key",
            ),
            partition_by=["key_bucket"],
        )
    return result


def link_incremental(
    new_probe: DataFrame,
    catalog: SnapshotCatalog,
    config: PipelineConfig | None = None,
) -> LinkResult:
    """Link a NEW batch of probe conversations against the registry a
    prior ``link(..., catalog=...)`` committed — the linkage analogue of
    ``run_incremental``: nothing re-blocks, re-fingerprints, or
    re-scores the registry side.

      1. the batch's docs + band keys derive exactly as in ``link``
         (key parity is what makes the probe equivalent to the batch
         cross join);
      2. exact links: batch fps probe the committed
         ``link_registry_index`` (bucket-pruned: the scan is statically
         restricted to the batch's key buckets) → per-fp registry
         minimum;
      3. fuzzy candidates: batch bands probe the committed
         ``link_registry_blocks`` pruned to touched (bucket, key) pairs;
         the per-side stop band and salted cross join are the same
         ``cross_candidate_pairs`` machinery;
      4. scoring reads ONLY the touched registry docs
         (``link_registry_docs`` id-bucket-pruned + semi-joined to the
         candidate ids) — O(candidates), not O(registry);
      5. assignment is batch-local, so only ``many_to_one`` and
         ``all`` are valid: each probe record appears in exactly one
         batch, making the per-batch best-link assignment globally
         consistent. ``one_to_one`` needs cross-batch state (a registry
         record consumed by batch 1 must reject batch 2) and is refused
         loudly rather than silently mis-assigned.
      6. the links delta appends to the committed ``links`` table.

    Equivalence contract (tested): with ``many_to_one`` and no band key
    crossing the stop band across the batch split, the union of
    incremental link deltas equals ``link()`` over the concatenated
    probe input.
    """
    cfg = config or PipelineConfig()
    if cfg.link_mode not in ("many_to_one", "all"):
        raise ValueError(
            "link_incremental supports link_mode 'many_to_one' or 'all'; "
            "one_to_one assignment needs cross-batch state (re-run link() "
            "over the full probe set instead)"
        )
    spark = new_probe.sparkSession
    persisted: list[DataFrame] = []

    # re-probe guard: a probe record the committed links table already
    # links must not link again (a re-delivered or overlapping batch
    # would otherwise append duplicate conv_id_a rows, silently breaking
    # many_to_one's at-most-one-link invariant). Previously-probed-but-
    # UNLINKED records re-probe harmlessly: against an unchanged
    # registry they produce the same no-link.
    if catalog.exists("links"):
        new_probe = new_probe.join(
            catalog.read("links").select(F.col("conv_id_a").alias("conv_id")),
            "conv_id",
            "left_anti",
        )

    ndocs = _docs_with_bands(_tag_side(new_probe, _SIDE_A), cfg).persist()
    persisted.append(ndocs)

    def _tag_b(df: DataFrame, col: str = "conv_id") -> DataFrame:
        return df.withColumn(col, F.concat(F.lit(_SIDE_B), F.col(col)))

    # static partition pruning, same rationale as the registry probe:
    # DPP cannot see through the batch side (lifecycle.bucket_pruned)
    _bucket_prune = lifecycle.bucket_pruned

    # 2. exact links against the committed fp index
    new_idx = _with_key_bucket(
        ndocs.select("conv_id", "exact_fp"), "exact_fp"
    ).persist()
    persisted.append(new_idx)
    reg_idx = _bucket_prune(
        catalog.read("link_registry_index"), "key_bucket", new_idx
    ).join(
        new_idx.select("key_bucket", "exact_fp").distinct(),
        ["key_bucket", "exact_fp"],
    )
    bmin = reg_idx.groupBy("key_bucket", "exact_fp").agg(
        F.min("conv_id").alias("_rid")
    )
    exact = (
        new_idx.join(bmin, ["key_bucket", "exact_fp"])
        .select(
            F.col("conv_id").alias("id_a"),
            F.concat(F.lit(_SIDE_B), F.col("_rid")).alias("id_b"),
        )
        .persist()
    )
    persisted.append(exact)

    # 3. fuzzy candidates: batch bands x committed registry blocks
    nblocks = _with_key_bucket(
        blocking.explode_blocks(ndocs, "conv_id", "bands"), "band_key"
    ).persist()
    persisted.append(nblocks)
    reg_blocks = (
        _bucket_prune(catalog.read("link_registry_blocks"), "key_bucket", nblocks)
        .join(
            nblocks.select("key_bucket", "band_key").distinct(),
            ["key_bucket", "band_key"],
        )
        .persist()  # pruned to touched keys — small
    )
    persisted.append(reg_blocks)
    # persisted: the candidate join is read by the bucket collect below,
    # the scoring plan, and the links write — one execution, not three
    cands = blocking.cross_candidate_pairs(
        nblocks.select("band_key", F.col("id")),
        _tag_b(reg_blocks, "conv_id").select("band_key", F.col("conv_id").alias("id")),
        max_block=cfg.max_block,
        salt_threshold=cfg.salt_threshold,
        salt_groups=cfg.salt_groups,
    ).join(exact, ["id_a", "id_b"], "left_anti").persist()
    persisted.append(cands)

    # 4. scoring over the batch docs + ONLY the touched registry docs
    # (committed with their distinct-shingle arrays, so sh_col reuse
    # skips the per-batch tokenize+shingle recompute on both sides)
    pair_b_idx = lifecycle.with_fp_bucket(
        cands.select(
            F.substring("id_b", len(_SIDE_B) + 1, 2**30).alias("conv_id")
        ).distinct(),
        key_col="conv_id",
        out_col="id_bucket",
    ).persist()
    persisted.append(pair_b_idx)
    reg_docs = (
        _bucket_prune(catalog.read("link_registry_docs"), "id_bucket", pair_b_idx)
        .join(pair_b_idx.select("conv_id"), "conv_id", "left_semi")
    )
    scoring_docs = ndocs.select("conv_id", "doc", "doc_len", "sh").unionByName(
        _tag_b(reg_docs).select("conv_id", "doc", "doc_len", "sh")
    )
    scored = scoring.score_pairs(
        cands, scoring_docs,
        min_len_ratio=cfg.min_len_ratio, k=cfg.shingle_k,
        decider=cfg.decider, sh_col="sh", deps=persisted,
    )
    near = scored.where("is_dup").select(
        "id_a", "id_b", F.col("jaccard").cast("double").alias("score")
    )

    # 5. batch-local assignment (valid globally: each probe record
    # appears in exactly one batch)
    exact_links = exact.select(
        "id_a", "id_b", F.lit(2.0).alias("score"), F.lit("exact").alias("link_type")
    )
    near_links = near.select("id_a", "id_b", "score", F.lit("near").alias("link_type"))
    if cfg.link_mode == "many_to_one":
        w = Window.partitionBy("id_a").orderBy(F.col("score").desc(), F.col("id_b").asc())
        links = (
            exact_links.unionByName(near_links)
            .withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .drop("_r")
        )
    else:
        links = exact_links.unionByName(near_links)

    links = links.select(
        _strip_side("id_a").alias("conv_id_a"),
        _strip_side("id_b").alias("conv_id_b"),
        "score",
        "link_type",
    ).persist()
    persisted.append(links)

    # 6. O(delta) append + refreshed metrics snapshot (the committed
    # link_metrics would otherwise go silently stale after the first
    # incremental batch)
    catalog.write("links", links, mode="append")
    n_delta = links.count()
    n_total = catalog.read("links").count()
    metrics = spark.createDataFrame(
        [
            ("n_links", float(n_total)),
            ("n_links_delta", float(n_delta)),
            ("n_records_a_delta", float(ndocs.count())),
            ("n_candidate_pairs_delta", float(cands.count())),
        ],
        "metric string, value double",
    )
    catalog.write("link_metrics", metrics)

    # NOTE: docs_b here is the TOUCHED registry docs slice
    # (conv_id, doc, doc_len, sh, id_bucket) — narrower and smaller than
    # link()'s full banded registry table; consumers needing the full
    # registry read link_registry_docs from the catalog
    result = LinkResult(
        links=links,
        scored_pairs=scored.withColumn("id_a", _strip_side("id_a")).withColumn(
            "id_b", _strip_side("id_b")
        ),
        candidate_pairs=cands.withColumn("id_a", _strip_side("id_a")).withColumn(
            "id_b", _strip_side("id_b")
        ),
        docs_a=ndocs.withColumn("conv_id", _strip_side("conv_id")),
        docs_b=reg_docs,  # committed ids are already the caller's namespace
        metrics=metrics,
        persisted=persisted,
    )
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
    if result.lint is not None:
        catalog.write("lint", result.lint)
    # blocking-key index tables: what an incremental batch probes instead
    # of re-blocking the corpus (run_incremental). Both bucket-partitioned
    # like the registry so a probe prunes to the buckets it touches.
    # doc_blocks is written UNPRUNED (singleton bands included): a band
    # that pairs with nothing today may pair with tomorrow's batch.
    catalog.write(
        "doc_index",
        _with_key_bucket(result.docs.select("conv_id", "exact_fp"), "exact_fp"),
        partition_by=["key_bucket"],
    )
    catalog.write(
        "doc_blocks",
        _with_key_bucket(
            blocking.explode_blocks(result.docs, "conv_id", "bands"), "band_key"
        ),
        partition_by=["key_bucket"],
    )


def _with_key_bucket(df: DataFrame, key_col: str) -> DataFrame:
    """key_bucket partition column for the doc-level index tables —
    delegates to lifecycle.with_fp_bucket so the bucket formula AND
    modulus live in exactly one place (a drifted copy here would
    silently miss every committed key on incremental probes)."""
    return lifecycle.with_fp_bucket(
        df, n_buckets=lifecycle.REGISTRY_BUCKETS, key_col=key_col, out_col="key_bucket"
    )


def current_clusters(catalog: SnapshotCatalog) -> DataFrame:
    """Latest-wins view of cluster assignments: the base ``clusters``
    table merged with the ``cluster_updates`` append log (merge-on-read,
    Iceberg MoR semantics). Incremental runs append ONLY changed/new
    rows — O(delta) per commit — so the read view must pick each
    conv_id's newest assignment; ``compact_clusters`` folds the log back
    into the base table when it grows."""
    from pyspark.sql import Window

    base = catalog.read("clusters").select(
        "conv_id", "cluster_id", F.lit(0).alias("_v")
    )
    if catalog.exists("cluster_updates"):
        base = base.unionByName(
            catalog.read("cluster_updates").select("conv_id", "cluster_id", "_v")
        )
    w = Window.partitionBy("conv_id").orderBy(F.desc("_v"))
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("conv_id", "cluster_id")
    )


def compact_clusters(catalog: SnapshotCatalog) -> None:
    """Fold the cluster_updates append log into the base clusters table
    (one overwrite snapshot each) — same motivation as catalog.compact:
    the merge-on-read window must not pay for unbounded update history."""
    merged = current_clusters(catalog)
    catalog.write("clusters", merged)
    if catalog.exists("cluster_updates"):
        catalog.write("cluster_updates", catalog.read("cluster_updates").limit(0))


def run_incremental(
    new_transcripts: DataFrame,
    catalog: SnapshotCatalog,
    config: PipelineConfig | None = None,
) -> PipelineResult:
    """Fold a NEW batch of conversations into a committed pipeline state
    — the reference's incremental ``insert_files`` against an existing
    package (prepare_insert + splice,
    /root/reference/src/deduplication.cpp:612-637, 658-792) at the
    cluster level. Nothing re-blocks, re-scores, or re-clusters the
    existing corpus:

      1. registry: ``register_turns_incremental`` (bloom-split probe,
         dense-id continuation) — appends O(batch) delta snapshots;
      2. blocking: the batch's band keys / exact fps probe the committed
         ``doc_blocks`` / ``doc_index`` tables (bucket-pruned joins), so
         candidates = new×old ∪ new×new — never old×old, whose verdicts
         the committed clusters already encode;
      3. the stop-band cap applies to the key's TOTAL frequency
         (committed df + batch df), matching what a from-scratch run
         over the full corpus would drop;
      4. scoring reads only the touched old docs, reconstructed from the
         registry (membership ⋈ unique_turns, semi-joined to the
         candidate ids) — O(candidates), not O(corpus);
      5. clustering: ``incremental_components`` unions the committed
         assignment's star edges with the delta edges — O(delta)
         contraction work;
      6. commit: registry/index/edges tables take append-mode deltas;
         cluster assignments append ONLY changed+new rows to the
         ``cluster_updates`` log (``current_clusters`` is the
         merge-on-read view, ``compact_clusters`` folds it).

    Equivalence contract (tested): when no band key crosses the
    stop-band threshold across the split, ``current_clusters`` after
    increments equals ``run()`` over the concatenated input exactly.
    (A key that crosses mid-stream is dropped later than a full-corpus
    run would have dropped it — already-committed edges stay; the same
    monotonicity the reference's registry has.)
    """
    cfg = config or PipelineConfig()
    persisted: list[DataFrame] = []

    unique_turns = catalog.read("unique_turns")
    membership = catalog.read("membership")

    # 1. registry increment (probe bounded by bloom + bucket pruning)
    state: dict = {}
    merged_unique, merged_membership = lifecycle.register_turns_incremental(
        new_transcripts, unique_turns, membership,
        deps=persisted, bloom_shards=cfg.bloom_shards,
        max_driver_bytes=cfg.bloom_max_driver_bytes, state=state,
    )

    # 2. the batch's docs, keyed identically to the batch path
    ndocs = _docs_with_bands(new_transcripts, cfg).persist()
    persisted.append(ndocs)

    # 3. exact-fp delta edges: each new doc links to the committed
    # group minimum for its fp (bucket-pruned probe) + first-writer-wins
    # links among the batch's own docs
    new_idx = _with_key_bucket(ndocs.select("conv_id", "exact_fp"), "exact_fp")
    old_idx = catalog.read("doc_index")
    old_min = (
        old_idx.join(
            new_idx.select("key_bucket", "exact_fp").distinct(),
            ["key_bucket", "exact_fp"],
        )
        .groupBy("key_bucket", "exact_fp")
        .agg(F.min("conv_id").alias("id_a"))
    )
    exact_old = (
        new_idx.join(old_min, ["key_bucket", "exact_fp"])
        .where(F.col("id_a") != F.col("conv_id"))
        .select("id_a", F.col("conv_id").alias("id_b"))
    )
    exact_new = blocking.exact_key_pairs(ndocs, "conv_id", "exact_fp")
    exact_edges = exact_old.union(exact_new).distinct()

    # 4. LSH delta candidates: batch bands probe the committed block
    # index; the stop-band cap uses committed+batch TOTAL key frequency
    nblocks = _with_key_bucket(
        blocking.explode_blocks(ndocs, "conv_id", "bands"), "band_key"
    ).persist()
    persisted.append(nblocks)
    old_blocks = catalog.read("doc_blocks").join(
        nblocks.select("key_bucket", "band_key").distinct(),
        ["key_bucket", "band_key"],
    ).persist()  # pruned to touched keys — small
    persisted.append(old_blocks)
    df_total = (
        nblocks.groupBy("key_bucket", "band_key").agg(F.count("*").alias("dn"))
        .join(
            old_blocks.groupBy("key_bucket", "band_key").agg(F.count("*").alias("do")),
            ["key_bucket", "band_key"], "left",
        )
        .select(
            "key_bucket", "band_key",
            (F.col("dn") + F.coalesce(F.col("do"), F.lit(0))).alias("df"),
        )
    )
    live_keys = df_total.where(F.col("df") <= cfg.max_block).select(
        "key_bucket", "band_key"
    )
    nb_live = nblocks.join(live_keys, ["key_bucket", "band_key"])
    # new×old: the probe join (old side bounded by max_block per key);
    # new×new: the batch's own self-join via the salted machinery
    cand_no = (
        nb_live.select("key_bucket", "band_key", F.col("id").alias("_nid"))
        .join(
            old_blocks.select(
                "key_bucket", "band_key", F.col("id").alias("_oid")
            ),
            ["key_bucket", "band_key"],
        )
        .select(
            F.least("_nid", "_oid").alias("id_a"),
            F.greatest("_nid", "_oid").alias("id_b"),
        )
    )
    cand_nn = blocking.candidate_pairs(
        nb_live.select("id", "band_key"),
        max_block=cfg.max_block,
        salt_threshold=cfg.salt_threshold,
        salt_groups=cfg.salt_groups,
    )
    cands = cand_no.union(cand_nn).distinct()
    # anti-join on the CANONICAL orientation: cands are (least, greatest)
    # but exact_old edges are (old_group_min, new_id) — when a new id
    # sorts before the committed group min, a verbatim compare would
    # miss the pair and re-score an exact duplicate
    cands = cands.join(
        exact_edges.select(
            F.least("id_a", "id_b").alias("ea"),
            F.greatest("id_a", "id_b").alias("eb"),
        ),
        (F.col("id_a") == F.col("ea")) & (F.col("id_b") == F.col("eb")),
        "left_anti",
    )

    # 5. scoring over exactly the touched docs: batch docs as computed,
    # old docs reconstructed from the registry for the candidate ids only
    pair_ids = cands.select(
        F.explode(F.array("id_a", "id_b")).alias("conv_id")
    ).distinct()
    old_ids = pair_ids.join(ndocs.select("conv_id"), "conv_id", "left_anti")
    old_docs = normalize.conversation_docs(
        lifecycle.reconstruct(
            membership.join(old_ids, "conv_id", "left_semi"), unique_turns
        )
    )
    scoring_docs = ndocs.select("conv_id", "doc", "doc_len").unionByName(
        old_docs.select("conv_id", "doc", "doc_len")
    )
    scored = scoring.score_pairs(
        cands, scoring_docs,
        min_len_ratio=cfg.min_len_ratio, k=cfg.shingle_k,
        decider=cfg.decider, deps=persisted,
    )
    sim_edges = scored.where("is_dup").select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    edges = exact_edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(sim_edges)

    # 6. O(delta) cluster maintenance
    prev = current_clusters(catalog).select(
        F.col("conv_id").alias("node"), "cluster_id"
    ).persist()
    persisted.append(prev)
    merged_cc = clustering.incremental_components(prev, edges)
    all_ids = prev.select(F.col("node").alias("conv_id")).union(
        ndocs.select("conv_id")
    ).distinct()
    clusters = clustering.clusters_with_singletons(all_ids, merged_cc)

    # changed+new rows only — the O(delta) append the update log expects
    delta_rows = clusters.join(
        prev.select(F.col("node").alias("conv_id"), F.col("cluster_id").alias("_old")),
        "conv_id", "left",
    ).where(
        F.col("_old").isNull() | (F.col("_old") != F.col("cluster_id"))
    ).select("conv_id", "cluster_id")

    # 7. commit: every table takes an O(delta) append; the clusters log
    # carries a monotone version for the merge-on-read window. The
    # version is PIPELINE-OWNED (max _v in the log + 1), never a backend
    # snapshot id: SnapshotCatalog ids happen to be monotone but Iceberg
    # snapshot ids are random longs, and a non-monotone _v would rank an
    # older update above a newer one in current_clusters — silently
    # stale assignments on that backend
    if catalog.exists("cluster_updates"):
        prev_v = (
            catalog.read("cluster_updates").agg(F.max("_v")).collect()[0][0] or 0
        )
        v = int(prev_v) + 1
    else:
        v = 1
    catalog.write(
        "unique_turns",
        lifecycle.with_fp_bucket(state["new_unique"]),
        mode="append", partition_by=["fp_bucket"],
    )
    catalog.write("membership", state["new_membership"], mode="append")
    catalog.write("doc_index", new_idx, mode="append", partition_by=["key_bucket"])
    catalog.write(
        "doc_blocks",
        _with_key_bucket(
            blocking.explode_blocks(ndocs, "conv_id", "bands"), "band_key"
        ),
        mode="append", partition_by=["key_bucket"],
    )
    catalog.write("edges", edges, mode="append")
    catalog.write(
        "cluster_updates",
        delta_rows.select("conv_id", "cluster_id", F.lit(v).cast("long").alias("_v")),
        mode="append",
    )

    return PipelineResult(
        clusters=clusters,
        edges=edges,
        scored_pairs=scored,
        candidate_pairs=cands,
        docs=ndocs,
        unique_turns=merged_unique,
        membership=merged_membership,
        metrics=new_transcripts.sparkSession.createDataFrame(
            [], "metric string, value double"
        ),
        persisted=persisted,
    )
