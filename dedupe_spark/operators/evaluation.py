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


def scorer_auc(
    scored_pairs: DataFrame,
    score_col: str = "score",
    label_col: str = "is_match",
) -> DataFrame:
    """ROC-AUC of a pair scorer against gold labels, without ranking
    the pair table.

    The textbook Mann-Whitney AUC needs a global rank over all pairs —
    a single-reducer sort at 10^12 pairs. Instead reduce to *score
    marginals*: one map-side-combinable hash agg builds (score ->
    n_pos, n_neg), then the cumulative pass runs over DISTINCT scores
    only, whose cardinality is bounded by the scorer's granularity
    (65 for a 64-dim sign-agreement count, <= 10^4 for a 4-decimal
    rounded similarity) — never by the corpus. The unpartitioned window
    below is over THAT tiny table, which is the entire point.

        AUC = sum_s n_pos(s) * (cum_neg(<s) + 0.5 * n_neg(s)) / (P*N)

    — ties counted half, exactly the Mann-Whitney statistic. Returns a
    single row (auc, n_pos, n_neg); auc is NULL when either class is
    empty (undefined, not 0). Pairs with a NULL label (unlabeled — e.g.
    a record missing from the gold set after an outer join) are
    EXCLUDED, not silently counted as negatives."""
    from pyspark.sql import Window

    is_pos = F.col(label_col)
    scored_pairs = scored_pairs.where(is_pos.isNotNull())
    g = scored_pairs.groupBy(F.col(score_col).alias("s")).agg(
        F.sum(F.when(is_pos, 1).otherwise(0)).alias("pos"),
        F.sum(F.when(is_pos, 0).otherwise(1)).alias("neg"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    g = g.withColumn(
        "cum_neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0)).cast("double")
    )
    agg = g.agg(
        F.sum(
            F.col("pos") * (F.col("cum_neg_below") + 0.5 * F.col("neg"))
        ).alias("num"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
    )
    return agg.select(
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(F.col("num") / (F.col("n_pos") * F.col("n_neg")), 6),
        ).alias("auc"),
        "n_pos",
        "n_neg",
    )
