"""Structural QA over multi-turn transcripts: per-conversation lint.

Agent-transcript corpora rot in structural ways plain text never does:
conversations that open with the assistant, consecutive same-role
turns (a dropped message), empty turns, tool turns with no tool name,
gaps in the turn index. A curation pipeline flags these BEFORE dedup —
a structurally broken conversation should not become the canonical
copy of its cluster. The reference's analog is its file-header
validation on ingest (/root/reference/src/deduplication.cpp:680-742):
reject/flag malformed inputs before they enter the registry.

Scale shape: one shuffle on conv_id, shared by the lag window and the
aggregation (same partitioning key, so Catalyst reuses the exchange);
everything else is codegen'd expressions. Per-conversation state is a
handful of counters — no conversation's turns ever need to fit in one
task beyond the window sort, and conversations are small relative to
partitions at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transcript_lint(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
) -> DataFrame:
    """One row per conversation with structural-defect counters.

    Columns: conv_id, n_turns, starts_with_user, same_role_runs (count
    of adjacent same-role turn pairs), empty_turns, orphan_tool_turns
    (role='tool' but no tool name), idx_gaps (turn_idx not dense from
    0), clean (no defect fired).
    """
    w = Window.partitionBy("conv_id").orderBy("idx")
    t = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("idx"),
        F.col(role_col).alias("role"),
        F.col(text_col).alias("text"),
        F.col(tool_col).alias("tool"),
    ).withColumn("prev_role", F.lag("role").over(w))

    agg = t.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        (F.min_by("role", "idx") == F.lit("user")).alias("starts_with_user"),
        F.sum(
            F.when(F.col("role") == F.col("prev_role"), 1).otherwise(0)
        ).alias("same_role_runs"),
        F.sum(
            F.when(F.trim(F.coalesce("text", F.lit(""))) == "", 1).otherwise(0)
        ).alias("empty_turns"),
        F.sum(
            F.when(
                (F.col("role") == "tool")
                & (F.trim(F.coalesce("tool", F.lit(""))) == ""),
                1,
            ).otherwise(0)
        ).alias("orphan_tool_turns"),
        # dense 0..n-1 index <=> min==0 and max==n-1 and all distinct
        (
            ~(
                (F.min("idx") == 0)
                & (F.max("idx") == F.count("*") - 1)
                & (F.count_distinct("idx") == F.count("*"))
            )
        ).alias("idx_gaps"),
    )
    clean = (
        F.col("starts_with_user")
        & (F.col("same_role_runs") == 0)
        & (F.col("empty_turns") == 0)
        & (F.col("orphan_tool_turns") == 0)
        & ~F.col("idx_gaps")
    )
    return agg.select(
        "conv_id", "n_turns", "starts_with_user", "same_role_runs",
        "empty_turns", "orphan_tool_turns", "idx_gaps", clean.alias("clean"),
    )
