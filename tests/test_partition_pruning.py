"""The incremental registry probe must physically prune the
bucket-partitioned unique_turns scan to the batch's probed buckets
(VERDICT r4 task 8): PLANS.md claims it, this pins it with an
explain()-based assertion on PartitionFilters.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from dedupe_spark import fixtures, pipeline
from dedupe_spark.catalog import SnapshotCatalog
from dedupe_spark.operators import lifecycle


@pytest.fixture(scope="module")
def registry(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("prune") / "wh")
    tr = fixtures.transcripts(spark, n_conv=60).persist()
    res = pipeline.run(tr, catalog=SnapshotCatalog(spark, wh))
    res.release()
    cat = SnapshotCatalog(spark, wh)
    # tr stays persisted: the known-batch test re-registers a slice of
    # the registry's own source (build_plan is not prefix-stable across
    # n_conv, so a smaller fixture would NOT contain known turns)
    return cat.read("unique_turns"), cat.read("membership"), tr


def _registry_scan_filters(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [
        line
        for line in plan.split("\n")
        if "FileScan" in line and "unique_turns" in line
    ]


def test_probe_scan_lists_only_probed_buckets(spark, registry):
    unique_turns, membership, tr = registry
    # a tiny batch of KNOWN conversations: its fingerprints hit the
    # bloom (non-empty maybe set), so the probe join materializes, and
    # its few distinct fps touch only a subset of the 64 fp buckets
    batch = tr.where(F.col("conv_id").isin("conv-00000000", "conv-00000001"))
    deps: list = []
    state: dict = {}
    merged_unique, merged_membership = lifecycle.register_turns_incremental(
        batch, unique_turns, membership, deps=deps, state=state
    )
    # probe correctness first: re-registering known turns mints nothing
    assert state["new_unique"].count() == 0
    # the probe's registry scan sits inside the merged view's new-fps
    # lineage (the merged view additionally reads the full table for the
    # union branch, which rightly scans every bucket); require at least
    # one unique_turns scan carrying a static fp_bucket IN (...)
    # partition filter smaller than the full 64-bucket layout
    scans = _registry_scan_filters(merged_unique)
    pruned_scans = [
        line
        for line in scans
        if re.search(r"PartitionFilters: \[[^]]*fp_bucket#\d+ (IN|INSET)\b", line)
    ]
    assert pruned_scans, f"no fp_bucket IN/INSET partition filter; scans: {scans}"
    # the INSET display truncates, so verify the bucket count from the
    # same computation the operator collects: the batch's distinct
    # fp buckets must cover strictly fewer than all 64 partitions
    n_probed = (
        batch.withColumn("text", F.coalesce("text", F.lit("")))
        .select(
            F.pmod(F.xxhash64(F.md5("text")), F.lit(lifecycle.REGISTRY_BUCKETS))
        )
        .distinct()
        .count()
    )
    assert 0 < n_probed < lifecycle.REGISTRY_BUCKETS, (
        f"batch touches {n_probed} buckets — widen/narrow the fixture"
    )
    for d in deps:
        d.unpersist()


def test_all_new_batch_eliminates_probe_entirely(spark, registry):
    # a batch with NO registry hits has an empty maybe set: the pruned
    # probe relation folds to empty and the optimizer removes the
    # registry join outright — zero partitions read, and every batch fp
    # still mints a new block id
    unique_turns, membership, _tr = registry
    batch = fixtures.transcripts(spark, n_conv=2, seed=7)
    deps: list = []
    state: dict = {}
    lifecycle.register_turns_incremental(
        batch, unique_turns, membership, deps=deps, state=state
    )
    n_batch_fps = (
        batch.withColumn("text", F.coalesce("text", F.lit("")))
        .select(F.md5("text")).distinct().count()
    )
    assert state["new_unique"].count() == n_batch_fps
    scans = _registry_scan_filters(state["new_unique"])
    # the only unique_turns read left is the max-block_id base aggregate
    assert all("struct<block_id:bigint>" in s for s in scans), scans
    for d in deps:
        d.unpersist()


def test_empty_probe_set_prunes_everything(spark, registry):
    unique_turns, membership, _tr = registry
    schema = "conv_id string, turn_idx long, role string, text string, tool string, ts timestamp"
    empty = spark.createDataFrame([], schema)
    deps: list = []
    state: dict = {}
    merged_unique, _ = lifecycle.register_turns_incremental(
        empty, unique_turns, membership, deps=deps, state=state
    )
    assert state["new_unique"].count() == 0
    assert merged_unique.count() == unique_turns.count()
    for d in deps:
        d.unpersist()
