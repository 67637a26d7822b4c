"""Entity-resolution quality metrics over cluster assignments.

The reference verifies its dedup decisions only by exact reconstruction
equality (extract round-trip, src/deduplication.cpp:1405-1417); an ER
pipeline operated at scale also needs *extrinsic* cluster quality
numbers against labeled data. This module adds the two standard
families in one pass:

- **B-cubed** precision/recall (Bagga & Baldwin 1998) — per-item
  overlap between its predicted cluster and its gold cluster, averaged
  over items; the metric of record for coreference/ER because it
  handles singleton-heavy distributions where pair counting saturates,
- **pairwise** precision/recall — fraction of same-cluster pairs that
  are truly same-entity and vice versa (the F1 BASELINE.json's
  headline criterion is stated in).

Scale shape: everything reduces over the (pred, gold) contingency
cells — one hash aggregate to build the cells (map-side combined), two
re-aggregations for the marginals, and a final single-row reduce. No
per-pair table is ever materialized: pair counts come from n*(n-1)/2
on the cell/marginal counts, so a trillion-row assignment costs three
shuffles of at most |clusters| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_eval(assign: DataFrame, pred_col: str, gold_col: str) -> DataFrame:
    """One-row DataFrame of B-cubed and pairwise precision/recall/F1 for
    a cluster assignment (one row per item, predicted + gold cluster ids).

    Columns: n_items, b3_precision, b3_recall, b3_f1, pair_precision,
    pair_recall, pair_f1. F1 terms are NULL when degenerate (no
    positive pairs on a side), never a divide-by-zero.
    """
    from pyspark.sql import Window

    # marginals as window sums over the (small) cell table, NOT re-
    # aggregations of `assign`: re-deriving them from the assignment
    # would scan the trillion-row table once per marginal (the first
    # plan did exactly that — three parquet scans); this shape scans it
    # once and every later step touches only |clusters| rows
    cells = assign.groupBy(pred_col, gold_col).agg(F.count("*").alias("n_cell"))
    j = cells.withColumn(
        "n_pred", F.sum("n_cell").over(Window.partitionBy(pred_col))
    ).withColumn("n_gold", F.sum("n_cell").over(Window.partitionBy(gold_col)))

    def pairs(n):  # n choose 2, in doubles
        return F.col(n) * (F.col(n) - 1) / 2.0

    tot = j.agg(
        F.sum("n_cell").alias("n_items"),
        # B-cubed: item-weighted average of per-item cell/|cluster| ratios
        (
            F.sum(F.col("n_cell") * F.col("n_cell") / F.col("n_pred"))
            / F.sum("n_cell")
        ).alias("b3_precision"),
        (
            F.sum(F.col("n_cell") * F.col("n_cell") / F.col("n_gold"))
            / F.sum("n_cell")
        ).alias("b3_recall"),
        F.sum(pairs("n_cell")).alias("tp"),
        # marginals repeat across cells — divide each cell's share out so
        # one aggregate pass suffices (sum n_cell/n_pred * C(n_pred,2))
        F.sum(pairs("n_pred") * F.col("n_cell") / F.col("n_pred")).alias("pp"),
        F.sum(pairs("n_gold") * F.col("n_cell") / F.col("n_gold")).alias("ap"),
    )

    def f1(p, r):
        return F.when(
            p.isNotNull() & r.isNotNull() & ((p + r) > 0), 2 * p * r / (p + r)
        )

    pair_p = F.when(F.col("pp") > 0, F.col("tp") / F.col("pp"))
    pair_r = F.when(F.col("ap") > 0, F.col("tp") / F.col("ap"))
    return tot.select(
        "n_items",
        "b3_precision",
        "b3_recall",
        f1(F.col("b3_precision"), F.col("b3_recall")).alias("b3_f1"),
        pair_p.alias("pair_precision"),
        pair_r.alias("pair_recall"),
        f1(pair_p, pair_r).alias("pair_f1"),
    )
