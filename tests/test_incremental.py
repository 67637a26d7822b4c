"""Incremental registry ingest (S5 prepare_insert + bloom negative lookup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark import fixtures
from dedupe_spark.operators.lifecycle import (
    reconstruct,
    register_turns,
    register_turns_incremental,
)


def test_incremental_matches_batch_semantics(spark):
    tr = fixtures.transcripts(spark, n_conv=60).persist()
    convs = sorted(r["conv_id"] for r in tr.select("conv_id").distinct().collect())
    split = convs[len(convs) // 2]
    batch1 = tr.where(F.col("conv_id") < split)
    batch2 = tr.where(F.col("conv_id") >= split)

    u1, m1 = register_turns(batch1)
    u1 = u1.persist()
    u2, m2 = register_turns_incremental(batch2, u1, m1)
    u2 = u2.persist()

    full_u, full_m = register_turns(tr)

    # same fingerprint set as the one-shot batch registry
    assert sorted(r["fp"] for r in u2.select("fp").collect()) == sorted(
        r["fp"] for r in full_u.select("fp").collect()
    )
    # ids stay dense 0..n-1
    n = u2.count()
    ids = sorted(r["block_id"] for r in u2.select("block_id").collect())
    assert ids == list(range(n))
    # existing ids are never renumbered (incremental stability)
    old = {r["fp"]: r["block_id"] for r in u1.collect()}
    merged = {r["fp"]: r["block_id"] for r in u2.collect()}
    assert all(merged[fp] == bid for fp, bid in old.items())

    # the reconstruction invariant holds over the merged tables
    rebuilt = reconstruct(m2, u2).select("conv_id", "turn_idx", "text")
    orig = tr.select("conv_id", "turn_idx", "text")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, orig.collect()))

    tr.unpersist()
    u1.unpersist()
    u2.unpersist()


def test_incremental_budget_fallback_same_result(spark):
    """With a driver budget too small for any bitmap, the semi-join
    fallback produces the identical merged registry."""
    tr = fixtures.transcripts(spark, n_conv=40).persist()
    convs = sorted(r["conv_id"] for r in tr.select("conv_id").distinct().collect())
    split = convs[len(convs) // 2]
    b1, b2 = tr.where(F.col("conv_id") < split), tr.where(F.col("conv_id") >= split)

    u1, m1 = register_turns(b1)
    u1 = u1.persist()
    state_bloom: dict = {}
    u_bloom, m_bloom = register_turns_incremental(b2, u1, m1, state=state_bloom)
    state_semi: dict = {}
    u_semi, m_semi = register_turns_incremental(
        b2, u1, m1, max_driver_bytes=8, state=state_semi
    )
    assert state_bloom["bloom_mode_used"] == "bloom"
    assert state_semi["bloom_mode_used"] == "semi_budget_fallback"
    assert sorted(map(tuple, u_bloom.select("fp", "block_id").collect())) == sorted(
        map(tuple, u_semi.select("fp", "block_id").collect())
    )
    assert m_bloom.count() == m_semi.count()
    tr.unpersist()
    u1.unpersist()


def test_incremental_persisted_bloom_across_batches(spark, tmp_path):
    """Batch N+1 reuses the filter persisted by batch N (state["bloom"]
    via save/load) instead of rebuilding over the registry — and the
    final registry matches the one-shot batch registry."""
    from dedupe_spark.functions.bloom import Bloom

    tr = fixtures.transcripts(spark, n_conv=45).persist()
    convs = sorted(r["conv_id"] for r in tr.select("conv_id").distinct().collect())
    s1, s2 = convs[len(convs) // 3], convs[2 * len(convs) // 3]
    b1 = tr.where(F.col("conv_id") < s1)
    b2 = tr.where((F.col("conv_id") >= s1) & (F.col("conv_id") < s2))
    b3 = tr.where(F.col("conv_id") >= s2)

    u, m = register_turns(b1)
    u = u.persist()
    state: dict = {}
    u, m = register_turns_incremental(b2, u, m, state=state)
    u = u.persist()
    path = str(tmp_path / "registry.bloom")
    state["bloom"].save(path)

    # warm batch: the loaded filter stands in for the registry rebuild
    u, m = register_turns_incremental(b3, u, m, registry_bloom=Bloom.load(path))

    full_u, _ = register_turns(tr)
    assert sorted(r["fp"] for r in u.select("fp").collect()) == sorted(
        r["fp"] for r in full_u.select("fp").collect()
    )
    ids = sorted(r["block_id"] for r in u.select("block_id").collect())
    assert ids == list(range(len(ids)))
    rebuilt = reconstruct(m, u).select("conv_id", "turn_idx", "text")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, tr.select("conv_id", "turn_idx", "text").collect())
    )
    tr.unpersist()


def test_incremental_into_empty_registry(spark):
    tr = fixtures.transcripts(spark, n_conv=10)
    u0, m0 = register_turns(tr.where("1=0"))  # empty registry
    u, m = register_turns_incremental(tr, u0, m0)
    full_u, _ = register_turns(tr)
    assert u.count() == full_u.count()
    assert m.count() == tr.count()
    ids = sorted(r["block_id"] for r in u.select("block_id").collect())
    assert ids == list(range(len(ids)))
