"""Survivorship: one golden record per entity cluster.

The reference stops at dedup bookkeeping (keep the first-registered
block, refcount the rest — src/deduplication.cpp:612-637); a full ER
pipeline then *merges* each cluster into a canonical record. This
implements the standard survivorship rules as pure DataFrame ops:

- **canonical row**: the longest record wins (``length_col`` desc),
  ties broken by lowest id — deterministic, so re-runs and the DuckDB
  oracle agree,
- **field-level mode**: for each requested column, the most frequent
  value in the cluster, ties broken by the smallest value.

Scale shape: one shuffle keyed on cluster_id reused by every rule —
the canonical pick is a rank-1 window over (cluster), each mode is a
(cluster, value) hash agg (map-side combined) followed by a rank-1
window over (cluster), and the final assembly is cluster-keyed joins.
No rule ever sees more than one cluster's rows at a time, so skewed
mega-clusters bound memory per task, not per job.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def golden_records(
    docs: DataFrame,
    assign: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    length_col: str = "n_chars",
    carry_cols: Sequence[str] = ("text",),
    mode_cols: Sequence[str] = ("lang", "source"),
) -> DataFrame:
    """One row per cluster: (cluster_id, cluster_size, canonical_id,
    *carry_cols from the canonical row, *mode_cols as cluster modes).

    ``assign`` maps id -> cluster (one row per id). Ids missing from
    ``assign`` are dropped — pass a singleton-complete assignment (e.g.
    ``clusters_with_singletons``) to keep every record.
    """
    d = docs.join(assign.select(F.col(id_col), F.col(cluster_col)), id_col)

    w = Window.partitionBy(cluster_col).orderBy(
        F.col(length_col).desc(), F.col(id_col).asc()
    )
    canon = (
        d.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            cluster_col,
            F.col(id_col).alias("canonical_id"),
            *[F.col(c) for c in carry_cols],
        )
    )
    sizes = d.groupBy(cluster_col).agg(F.count("*").alias("cluster_size"))

    out = sizes.join(canon, cluster_col)
    for c in mode_cols:
        # asc_nulls_last: Spark's plain asc sorts NULL first, so on a
        # frequency tie between NULL and a real value the golden record
        # would come back NULL — survivorship prefers populated values
        # (and DuckDB's default ASC is NULLS LAST, keeping oracle parity)
        mw = Window.partitionBy(cluster_col).orderBy(
            F.col("_n").desc(), F.col(c).asc_nulls_last()
        )
        mode = (
            d.groupBy(cluster_col, c)
            .agg(F.count("*").alias("_n"))
            .withColumn("_rk", F.row_number().over(mw))
            .where(F.col("_rk") == 1)
            .select(cluster_col, c)
        )
        out = out.join(mode, cluster_col)
    return out.select(
        cluster_col,
        "cluster_size",
        "canonical_id",
        *carry_cols,
        *mode_cols,
    )
