"""Dense, deterministic, *distributed* id assignment.

``row_number().over(Window.orderBy(x))`` collapses to a single reducer —
fine at fixture scale, fatal at 10^12 rows. This helper produces the
same dense 0..n-1 numbering with all-parallel stages:

  1. range-partition by the order columns (sampled range exchange)
  2. row_number within each partition (parallel windows)
  3. add per-partition offsets: a running sum over the tiny
     (one-row-per-partition) count table, broadcast-joined back

Everything is lazy — no driver collect — so callers can build the plan
without triggering jobs, and the only single-partition window runs over
O(num_partitions) rows.

The result is identical to the global window for unique keys, and
deterministic for any input partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_dense_id(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "block_id",
    num_partitions: int | None = None,
    deps: list[DataFrame] | None = None,
) -> DataFrame:
    """``deps``: optional list the persisted intermediate is appended to,
    so long-running callers can ``unpersist()`` it after their final
    action (pipeline.PipelineResult.release does this)."""
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # persisted because both the count branch and the numbering branch read
    # it: the range exchange must be sampled exactly once, or the two
    # branches could disagree on partition boundaries
    ranged = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    if deps is not None:
        deps.append(ranged)
    # running-sum offsets over the tiny per-partition count table.
    # partitionBy(pmod(_pid, 1)) routes the O(num_partitions) rows
    # through one deliberate partition WITHOUT tripping WindowExec's "no
    # partition defined" warning — a bare lit(0) is constant-folded out
    # of the partition spec, so the expression must reference a column.
    # The table is bounded by the partition count; a single reducer here
    # is by design, not an accident.
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = (
        Window.partitionBy(F.pmod(F.col("_pid"), F.lit(1)))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_offset")
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn("_rn", F.row_number().over(w).cast("long") - 1)
        .withColumn(id_col, F.col("_rn") + F.col("_offset").cast("long"))
        .drop("_pid", "_rn", "_offset")
    )
