"""Dense, deterministic, *distributed* id assignment.

``row_number().over(Window.orderBy(x))`` collapses to a single reducer —
fine at fixture scale, fatal at 10^12 rows. This helper produces the
same dense 0..n-1 numbering with all-parallel stages:

  1. range-partition by the order columns (sampled range exchange)
  2. row_number within each partition (parallel windows)
  3. add per-partition offsets (one tiny collect of partition counts,
     broadcast back as a literal map)

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
) -> DataFrame:
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.repartitionByRange(n, *[F.col(c) for c in order_cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    # per-partition counts -> starting offsets (tiny: one row per partition)
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_cnt")).collect()
    counts.sort(key=lambda r: r["_pid"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["_cnt"]
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col("_pid")
    ) if offsets else F.lit(0)

    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        ranged.withColumn("_rn", F.row_number().over(w).cast("long") - 1)
        .withColumn(id_col, (F.col("_rn") + offset_expr.cast("long")))
        .drop("_pid", "_rn")
    )
