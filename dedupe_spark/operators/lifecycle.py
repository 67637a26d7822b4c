"""Package lifecycle: unique-turn registry, reconstruction, GC, stats.

These are the reference's insert/extract/remove/stat flows re-expressed
as DataFrame jobs over two tables:

  unique_turns (fp, text, len, block_id)   — the logic-block dictionary
      (/root/reference/include/deduplication.h:73-78); block_id is a
      deterministic dense id (first-writer-wins by (conv_id, turn_idx)),
      not a file offset.
  membership (conv_id, turn_idx, role, tool, ts, block_id) — the
      per-file block-id list (include/deduplication.h:81-91).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedupe_spark.functions.ids import with_dense_id

# registry bucket count for the hive/Iceberg `bucket(n, fp)` layout —
# the SURVEY §1.2 mapping of HashDB's bucketed disk KV (reference
# src/HashDB.cpp:339-450, include/HashDB.h:30-34). 64 buckets keeps
# bench-scale files reasonable; at 100 TB raise it (the probe cost is
# per-bucket, so more buckets = finer pruning).
REGISTRY_BUCKETS = 64


def with_fp_bucket(
    df: DataFrame,
    n_buckets: int = REGISTRY_BUCKETS,
    key_col: str = "fp",
    out_col: str = "fp_bucket",
) -> DataFrame:
    """Deterministic bucket column for partitioned registry layout:
    ``pmod(xxhash64(key), n)``. Writers pass ``partition_by=[out_col]``
    to the catalog; probes filtered/joined on the same expression scan
    only the matching bucket directories (partition pruning / DPP).
    The SINGLE source of the bucket formula — the doc-level index
    tables (pipeline key_bucket) reuse it with a different key/out
    column so writer and probe can never drift."""
    return df.withColumn(
        out_col, F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int")
    )


def register_turns(
    transcripts: DataFrame, deps: list[DataFrame] | None = None
) -> tuple[DataFrame, DataFrame]:
    """register_block (src/deduplication.cpp:1393-1461) as two DataFrames.

    The reference walks records serially and assigns block ids in
    first-seen order; distributed first-writer-wins is the same
    semantics: the canonical copy of a fingerprint is the minimum
    (conv_id, turn_idx) that carries it, and block_id is a dense number
    over fingerprint order — assigned with the distributed dense-id
    helper (range partition + parallel windows + broadcast offsets), not
    a single-reducer global window.

    Fingerprints are md5 of the **raw** turn text: the reference's
    verification is byte-exact (blocks_cmp memcmp,
    src/deduplication.cpp:1510), and raw fingerprints are what make the
    reconstruction invariant (`extract(insert(X)) == X`, per-turn text
    equality) hold exactly. Normalized fingerprints are a *linkage*
    concept and live in the blocking stages, not the storage registry.

    NULL text is normalized to the empty string at this boundary: the
    declared schema is non-null, but parquet reads don't enforce
    StructField nullability, and a NULL fp would silently drop the row
    from membership (breaking the reconstruct round-trip invariant).
    Empty-string turns register and round-trip like any other.
    """
    t = transcripts.withColumn("text", F.coalesce(F.col("text"), F.lit(""))).withColumn(
        "fp", F.md5("text")
    )
    canon = (
        t.groupBy("fp")
        .agg(
            F.min(F.struct("conv_id", "turn_idx", "text")).alias("first"),
            F.count("*").alias("refcount"),
        )
        .select(
            "fp",
            F.col("first.text").alias("text"),
            F.length("first.text").cast("int").alias("len"),
            "refcount",
        )
    )
    unique_turns = with_dense_id(canon, ["fp"], id_col="block_id", deps=deps)
    membership = (
        t.join(unique_turns.select("fp", "block_id"), "fp")
        .select("conv_id", "turn_idx", "role", "tool", "ts", "block_id")
    )
    return unique_turns.drop("refcount"), membership


def bucket_pruned(df: DataFrame, bucket_col: str, probe_side: DataFrame) -> DataFrame:
    """Static bucket-partition pruning for a probe against a
    bucket-partitioned table: collect the probe side's distinct bucket
    values (<= n_buckets ints, one tiny job) and filter the scan with an
    IN — Catalyst's dynamic partition pruning cannot see through a
    bloom-flag/UDF probe side, so without this the scan reads every
    bucket (tests/test_partition_pruning.py). An empty probe set prunes
    every partition (the optimizer then deletes the join outright).
    Shared by the registry probe here and pipeline.link_incremental."""
    bks = [r[0] for r in probe_side.select(bucket_col).distinct().collect()]
    if not bks:
        return df.where(F.lit(False))
    return df.where(F.col(bucket_col).isin(bks))


def register_turns_incremental(
    new_transcripts: DataFrame,
    unique_turns: DataFrame,
    membership: DataFrame,
    fpp: float = 1e-4,
    deps: list[DataFrame] | None = None,
    registry_bloom=None,
    bloom_shards: int = 1,
    max_driver_bytes: int | None = 256 << 20,
    state: dict | None = None,
    n_buckets: int = REGISTRY_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Incremental ingest against an EXISTING registry — the reference's
    ``prepare_insert`` + ``register_block`` probe flow
    (src/deduplication.cpp:658-792, 1393-1461) with the HashDB bloom
    negative lookup (src/HashDB.cpp:429-431) done app-side:

      1. a Bloom filter over the existing registry's fingerprints splits
         incoming turns map-side: **definite-new turns never join against
         the registry at all** (the common case for fresh data), only the
         maybe-known sliver (true hits + fpp false positives) probes it;
      2. genuinely new fingerprints get dense block ids continuing after
         the registry's current maximum — existing ids are never renumbered
         (incremental stability: readers of old snapshots stay valid);
      3. membership rows for the new batch append against the merged
         registry.

    Scale bounds on step 1 (the full-registry fingerprint set is the
    10^12-key path — a monolithic bitmap there is TBs of driver memory):

      * ``registry_bloom``: a filter persisted from the previous batch
        (``Bloom.save``/``load`` or the object itself) — skips the
        rebuild entirely; the warm path for batch N>1.
      * ``bloom_shards``: shard the build (bounded per-shard aggregates).
      * ``max_driver_bytes``: when even the sharded bitmap exceeds this
        budget, fall back to the semi-join probe — every distinct
        incoming fp joins the registry (Catalyst's runtime bloom filter
        still prunes the scan), no driver bitmap at all.

    ``state`` (optional dict) receives ``state["bloom"]`` — the registry
    filter *including this batch's new fingerprints* (via shape-preserving
    ``insert_df``) for the caller to persist for the next batch — and
    ``state["bloom_mode_used"]``. It also receives the **append deltas**
    ``state["new_unique"]`` (only this batch's genuinely-new fingerprint
    rows, with their continued dense ids) and ``state["new_membership"]``
    (only this batch's membership rows): committing those with
    ``catalog.write(..., mode="append")`` makes the per-batch write
    O(batch) instead of O(registry) — the reference splices only new
    data onto the package (src/deduplication.cpp:612-637); rewriting the
    merged tables every micro-batch is write amplification that grows
    linearly with registry size (VERDICT r3).

    Returns (unique_turns', membership') — the merged tables (read
    views; callers that persist via snapshots should commit the deltas).
    """
    from dedupe_spark.functions.bloom import BloomBudgetError, build_bloom

    t = new_transcripts.withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    ).withColumn("fp", F.md5("text"))

    bloom = registry_bloom
    if bloom is None:
        try:
            bloom = build_bloom(
                unique_turns.select("fp"), "fp", fpp=fpp,
                shards=bloom_shards, max_driver_bytes=max_driver_bytes,
            )
        except BloomBudgetError:
            bloom = None

    # bucket-aware probe: when the registry was read from a
    # bucket-partitioned layout (catalog partition_by=["fp_bucket"]),
    # probe on (fp_bucket, fp) and STATICALLY restrict the registry scan
    # to the buckets this batch actually touches: the probed-bucket set
    # is collected first (<= n_buckets ints, one tiny job over the
    # batch's fingerprints — the scan-side pruning Catalyst's dynamic
    # partition pruning does NOT provide here, verified by plan: the
    # bloom-flagged probe side defeats DPP's selectivity heuristics, so
    # without the explicit IN filter the scan reads every bucket;
    # tests/test_partition_pruning.py pins PartitionFilters).
    # ``n_buckets`` MUST match the registry's written layout: the probe
    # recomputes fp_bucket for the incoming batch, and a mismatched
    # modulus silently misses every existing fingerprint (duplicate
    # block ids, broken reconstruct) rather than erroring. Registries
    # written with a non-default with_fp_bucket(n_buckets=...) must pass
    # the same value here (and in stream_register_turns).
    bucketed = "fp_bucket" in unique_turns.columns
    probe_keys = ["fp_bucket", "fp"] if bucketed else ["fp"]
    u_probe = unique_turns.select(*probe_keys, "block_id")

    def _bucket_pruned(probe_side: DataFrame) -> DataFrame:
        if not bucketed:
            return u_probe
        return bucket_pruned(u_probe, "fp_bucket", probe_side)

    flagged = t.select("fp").distinct()
    if bucketed:
        flagged = with_fp_bucket(flagged, n_buckets=n_buckets)
    if bloom is not None:
        flagged = bloom.flag(flagged, "fp", "_maybe")
        if deps is not None:
            # read by the bucket collect, the probe join, and the bloom
            # insert below — one batch-side computation, not three
            flagged = flagged.persist()
            deps.append(flagged)
        maybe = flagged.where("_maybe")
        probed = maybe.join(_bucket_pruned(maybe), probe_keys, "left")
        # bloom false positives fall through to the new-fp set
        new_fps = flagged.where(~F.col("_maybe")).select("fp").unionByName(
            probed.where(F.col("block_id").isNull()).select("fp")
        )
        if state is not None:
            state["bloom"] = bloom.insert_df(flagged.select("fp"), "fp")
            state["bloom_mode_used"] = "bloom"
        if deps is not None:
            deps.append(bloom)
    else:
        # budget fallback: no driver bitmap — probe the registry directly
        if deps is not None and bucketed:
            flagged = flagged.persist()
            deps.append(flagged)
        probed = flagged.join(_bucket_pruned(flagged), probe_keys, "left")
        new_fps = probed.where(F.col("block_id").isNull()).select("fp")
        if state is not None:
            state["bloom_mode_used"] = "semi_budget_fallback"

    canon = (
        t.join(new_fps, "fp", "left_semi")
        .groupBy("fp")
        .agg(F.min(F.struct("conv_id", "turn_idx", "text")).alias("first"))
        .select(
            "fp",
            F.col("first.text").alias("text"),
            F.length("first.text").cast("int").alias("len"),
        )
    )
    base = unique_turns.agg(
        F.coalesce(F.max("block_id"), F.lit(-1).cast("long")).alias("_base")
    )
    new_unique = (
        with_dense_id(canon, ["fp"], id_col="_nid", deps=deps)
        .crossJoin(F.broadcast(base))
        .select(
            "fp", "text", "len", (F.col("_nid") + F.col("_base") + 1).alias("block_id")
        )
    )
    merged_unique = unique_turns.select("fp", "text", "len", "block_id").unionByName(
        new_unique
    )
    new_membership = t.join(merged_unique.select("fp", "block_id"), "fp").select(
        "conv_id", "turn_idx", "role", "tool", "ts", "block_id"
    )
    if state is not None:
        state["new_unique"] = new_unique
        state["new_membership"] = new_membership
    return merged_unique, membership.unionByName(new_membership)


def reconstruct(membership: DataFrame, unique_turns: DataFrame) -> DataFrame:
    """extract_file (src/deduplication.cpp:1602-1726): join the id list
    back to block payloads in stable (conv_id, turn_idx) order. With
    raw-text fingerprints this is an exact inverse of register_turns —
    the per-turn text equality invariant (BASELINE.json input_hint).
    """
    return (
        membership.join(unique_turns.select("block_id", "text"), "block_id")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )


def remove_conversations(
    membership: DataFrame, unique_turns: DataFrame, removed_ids: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """remove_files (src/deduplication.cpp:154-515): drop records,
    refcount blocks, GC orphans, densely renumber survivors.

    removed_ids: single-column (conv_id) DataFrame.
    Returns (unique_turns', membership') with remapped dense block ids.
    """
    surviving = membership.join(removed_ids, "conv_id", "left_anti")
    refcounts = surviving.groupBy("block_id").agg(F.count("*").alias("refcount"))
    # new_id = old_id - removed_so_far (src/deduplication.cpp:344) — the
    # running renumber is exactly a dense numbering over surviving id order.
    survivors = with_dense_id(
        unique_turns.join(refcounts.select("block_id"), "block_id", "left_semi"),
        ["block_id"],
        id_col="new_id",
    )
    new_membership = (
        surviving.join(survivors.select("block_id", "new_id"), "block_id")
        .select("conv_id", "turn_idx", "role", "tool", "ts", F.col("new_id").alias("block_id"))
    )
    new_unique = survivors.select("fp", "text", "len", F.col("new_id").alias("block_id"))
    return new_unique, new_membership


def package_stats(membership: DataFrame, unique_turns: DataFrame) -> DataFrame:
    """package_stat (src/deduplication.cpp:1729-1908): dedup-ratio metrics
    computed **two independent ways** — the reference prints both as a
    self-check (:1867-1868); we return both columns so tests assert
    equality.

    way 1: from per-block refcounts (sum over unique blocks)
    way 2: from the raw traversal (total turns/bytes minus unique)
    """
    ref = membership.groupBy("block_id").agg(F.count("*").alias("refcount"))
    joined = unique_turns.join(ref, "block_id", "left").na.fill({"refcount": 0})
    way1 = joined.agg(
        F.count("*").alias("n_unique_blocks"),
        F.sum(F.col("len") * (F.col("refcount") - 1)).alias("saved_bytes_by_refcount"),
        F.sum(F.col("refcount")).alias("total_refs"),
    )
    total = membership.join(unique_turns.select("block_id", "len"), "block_id").agg(
        F.count("*").alias("n_turns_total"),
        F.sum("len").alias("total_bytes"),
    )
    uniq = unique_turns.agg(F.sum("len").alias("unique_bytes"))
    return (
        way1.crossJoin(total)
        .crossJoin(uniq)
        .select(
            "n_unique_blocks",
            "n_turns_total",
            "total_refs",
            "total_bytes",
            "unique_bytes",
            "saved_bytes_by_refcount",
            (F.col("total_bytes") - F.col("unique_bytes")).alias("saved_bytes_by_traversal"),
            (
                (F.col("total_bytes") - F.col("unique_bytes"))
                / F.when(F.col("total_bytes") > 0, F.col("total_bytes"))
            ).alias("dedup_ratio"),
        )
    )
