from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.operators.lifecycle import (
    package_stats,
    reconstruct,
    register_turns,
    remove_conversations,
)


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("conv_id", "turn_idx").collect()]


def test_roundtrip_invariant(spark, transcripts_small):
    """extract(insert(X)) == X — per-turn text equality under stable
    (conv_id, turn_idx) ordering (the north-rule invariant)."""
    ut, mem = register_turns(transcripts_small)
    back = reconstruct(mem, ut)
    orig = _sorted_rows(transcripts_small.select("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    got = _sorted_rows(back.select("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    assert got == orig


def test_block_ids_dense_and_stable(spark, transcripts_small):
    ut, mem = register_turns(transcripts_small)
    ids = [r["block_id"] for r in ut.select("block_id").collect()]
    assert sorted(ids) == list(range(len(ids)))
    # fp uniquely identifies a block
    assert ut.groupBy("fp").count().where("count > 1").count() == 0
    # membership references only existing blocks
    assert mem.join(ut, "block_id", "left_anti").count() == 0


def test_remove_gc_renumber(spark, transcripts_small):
    ut, mem = register_turns(transcripts_small)
    removed = spark.createDataFrame([("conv-00000000",), ("conv-00000003",)], "conv_id string")
    ut2, mem2 = remove_conversations(mem, ut, removed)
    # removed conversations are gone
    assert mem2.where(F.col("conv_id").isin("conv-00000000", "conv-00000003")).count() == 0
    # no orphan blocks: every surviving block is referenced
    assert ut2.join(mem2.select("block_id").distinct(), "block_id", "left_anti").count() == 0
    # dense renumbering 0..n-1
    ids = sorted(r["block_id"] for r in ut2.select("block_id").collect())
    assert ids == list(range(len(ids)))
    # surviving conversations reconstruct identically
    back = reconstruct(mem2, ut2)
    keep = transcripts_small.where(~F.col("conv_id").isin("conv-00000000", "conv-00000003"))
    assert _sorted_rows(back.select(*keep.columns)) == _sorted_rows(keep)


def test_stats_self_check(spark, transcripts_small):
    """The reference computes saved-bytes two independent ways and prints
    both (src/deduplication.cpp:1867-1868); here they must be equal."""
    ut, mem = register_turns(transcripts_small)
    row = package_stats(mem, ut).collect()[0]
    assert row["saved_bytes_by_refcount"] == row["saved_bytes_by_traversal"]
    assert row["total_refs"] == row["n_turns_total"]
    assert 0.0 <= row["dedup_ratio"] <= 1.0
