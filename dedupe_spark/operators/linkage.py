"""Fellegi-Sunter probabilistic record linkage with EM-fitted weights.

The reference scores candidate pairs with fixed thresholds (cheap adler
band then exact compare, src/deduplication.cpp:985-1178); production
entity-resolution systems (Splink, fastLink) instead *learn* per-field
match/non-match weights from the unlabeled pair distribution via the
Fellegi-Sunter model (Fellegi & Sunter, JASA 1969) fitted with EM
(Winkler 1988). This module adds that probabilistic decider next to the
fixed-threshold ones in ``scoring.py``:

- a *comparison vector* per candidate pair: each field comparison is
  discretized into ordinal agreement levels ("gammas"),
- per-level match probabilities ``m = P(gamma=l | match)`` and
  non-match probabilities ``u = P(gamma=l | non-match)`` plus the class
  prior ``lambda = P(match)``, fitted by expectation-maximization,
- a posterior ``match_prob`` and a log2 Bayes-factor ``match_weight``
  per pair.

Scale shape (the part that matters at 10^12 turns): the E-step is a
pure-codegen column expression (the current parameters are embedded as
*literals* — no join, no UDF), and the M-step is ONE map-side-combinable
aggregate pass over the pair table producing a single short row. Driver
state is the parameter vector (a few dozen floats), exactly like the
connected-components loop's checksum — the pair table itself never
moves to the driver, and a fixed iteration count means a fixed number
of passes. Persist the gamma table across iterations via ``deps``.

Determinism: given a deterministic pair table and init, every iteration
is closed-form arithmetic, so the whole fit is reproducible and (with
fixed iterations) expressible as chained ANSI-SQL CTEs — the DuckDB
oracle for q64 is generated from the same Comparison specs by
``__spark_entry__._fs_em_oracle``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Comparison:
    """One field comparison: a gamma column with ``levels`` ordinal
    agreement levels (0 = full disagreement) and deterministic initial
    m/u probability vectors (one float per level, summing to ~1)."""

    name: str
    levels: int
    init_m: tuple[float, ...]
    init_u: tuple[float, ...]

    def __post_init__(self):
        assert len(self.init_m) == self.levels and len(self.init_u) == self.levels


#: Default comparisons for the ``documents`` table: token-set Jaccard of
#: the whitespace-tokenized text (3 levels), language equality (2), and
#: a character-length band (3). Inits are rough priors; EM re-estimates.
DOCUMENT_COMPARISONS: tuple[Comparison, ...] = (
    Comparison("gamma_text", 3, (0.05, 0.25, 0.70), (0.60, 0.35, 0.05)),
    Comparison("gamma_lang", 2, (0.10, 0.90), (0.80, 0.20)),
    Comparison("gamma_len", 3, (0.10, 0.30, 0.60), (0.60, 0.30, 0.10)),
)


def document_comparison_vectors(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id", keep: Sequence[str] = ()
) -> DataFrame:
    """Attach the DOCUMENT_COMPARISONS gamma columns to a candidate-pair
    table (columns id_a, id_b referencing ``docs[id_col]``).

    Token Jaccard uses distinct whitespace tokens (array set ops, pure
    codegen); thresholds 0.8 / 0.3 split it into 3 levels. The join is
    pairs->docs per side keyed on the id — candidates-first, the
    all-pairs space never materializes. ``keep`` passes side-a raw
    columns through (as ``<name>_a``) for downstream value-specific
    adjustments (:func:`tf_adjusted_weights`).
    """
    toks = F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
    extra = [c for c in keep if c not in ("lang", "n_chars")]
    d = docs.select(
        F.col(id_col).alias("id"), toks.alias("toks"), "lang", "n_chars", *extra
    )
    a = d.select(
        F.col("id").alias("id_a"),
        F.col("toks").alias("toks_a"),
        F.col("lang").alias("lang_a"),
        F.col("n_chars").alias("len_a"),
        *[F.col(c).alias(f"{c}_a") for c in extra],
    )
    b = d.select(
        F.col("id").alias("id_b"),
        F.col("toks").alias("toks_b"),
        F.col("lang").alias("lang_b"),
        F.col("n_chars").alias("len_b"),
    )
    jac = F.size(F.array_intersect("toks_a", "toks_b")).cast("double") / F.size(
        F.array_union("toks_a", "toks_b")
    )
    len_diff = F.abs(F.col("len_a") - F.col("len_b"))
    return (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.when(jac >= 0.8, F.lit(2)).when(jac >= 0.3, F.lit(1)).otherwise(F.lit(0)).alias("gamma_text"),
            (F.col("lang_a") == F.col("lang_b")).cast("int").alias("gamma_lang"),
            F.when(len_diff <= 8, F.lit(2)).when(len_diff <= 64, F.lit(1)).otherwise(F.lit(0)).alias("gamma_len"),
            *[
                F.col({"n_chars": "len_a"}.get(c, f"{c}_a")).alias(f"{c}_a")
                for c in keep
            ],
        )
    )


def _level_expr(comp: Comparison, probs: Sequence[float]) -> Column:
    """CASE gamma WHEN l THEN probs[l] — parameters as literals, so the
    E-step stays inside whole-stage codegen (no join against a params
    table, no broadcast)."""
    expr = F.lit(float(probs[comp.levels - 1]))
    for lvl in range(comp.levels - 2, -1, -1):
        expr = F.when(F.col(comp.name) == lvl, F.lit(float(probs[lvl]))).otherwise(expr)
    return expr


def _posterior_expr(
    comparisons: Sequence[Comparison], params: dict
) -> tuple[Column, Column, Column]:
    """(match_prob, prod_m, prod_u) column expressions for the current
    parameter vector."""
    lam = F.lit(float(params["lambda"]))
    prod_m = F.lit(1.0)
    prod_u = F.lit(1.0)
    for c in comparisons:
        prod_m = prod_m * _level_expr(c, params[f"m_{c.name}"])
        prod_u = prod_u * _level_expr(c, params[f"u_{c.name}"])
    num = lam * prod_m
    return num / (num + (F.lit(1.0) - lam) * prod_u), prod_m, prod_u


def em_fellegi_sunter(
    gammas: DataFrame,
    comparisons: Sequence[Comparison] = DOCUMENT_COMPARISONS,
    iters: int = 3,
    init_lambda: float = 0.5,
) -> tuple[dict, DataFrame]:
    """Fit m/u/lambda by ``iters`` EM iterations over a gamma table and
    return (fitted params, scored pair DataFrame).

    Each iteration runs exactly one aggregate job over ``gammas`` (all
    the per-level sums in one pass, map-side combined) and collects a
    single row; the caller should persist ``gammas`` when iters > 1.
    The returned DataFrame adds ``match_prob`` (posterior under the
    fitted params) and ``match_weight`` (log2 of the Bayes factor
    prod_m / prod_u, Splink's "match weight").
    """
    params: dict = {"lambda": float(init_lambda)}
    for c in comparisons:
        params[f"m_{c.name}"] = [float(x) for x in c.init_m]
        params[f"u_{c.name}"] = [float(x) for x in c.init_u]

    for _ in range(iters):
        prob, _, _ = _posterior_expr(comparisons, params)
        aggs = [
            F.avg(prob).alias("lam"),
            F.sum(prob).alias("sum_p"),
            F.sum(F.lit(1.0) - prob).alias("sum_q"),
        ]
        for c in comparisons:
            for lvl in range(c.levels):
                ind = (F.col(c.name) == lvl).cast("double")
                aggs.append(F.sum(prob * ind).alias(f"pm_{c.name}_{lvl}"))
                aggs.append(F.sum((F.lit(1.0) - prob) * ind).alias(f"pu_{c.name}_{lvl}"))
        row = gammas.agg(*aggs).collect()[0]
        if row["lam"] is None:  # empty input: keep the priors, nothing to fit
            break
        params = {"lambda": float(row["lam"])}
        for c in comparisons:
            params[f"m_{c.name}"] = [
                float(row[f"pm_{c.name}_{lvl}"]) / float(row["sum_p"])
                for lvl in range(c.levels)
            ]
            params[f"u_{c.name}"] = [
                float(row[f"pu_{c.name}_{lvl}"]) / float(row["sum_q"])
                for lvl in range(c.levels)
            ]

    return params, score_with_params(gammas, comparisons, params)


def score_with_params(
    gammas: DataFrame,
    comparisons: Sequence[Comparison],
    params: dict,
) -> DataFrame:
    """Score a gamma table under an ALREADY-fitted parameter vector — the
    incremental-ingest complement of ``em_fellegi_sunter``: fit once on
    the base corpus, persist the (tiny) params next to the catalog
    snapshot, then score each delta batch with zero additional EM passes.
    Pure-codegen expression, parameters as literals, same output columns
    as the fitting path (match_prob, match_weight)."""
    prob, prod_m, prod_u = _posterior_expr(comparisons, params)
    # on perfectly-separated corpora EM drives some m/u levels to exactly
    # 0; the Bayes factor is then +/-infinity — surface NULL, not an ANSI
    # divide-by-zero / log-of-zero (the posterior is still well-defined)
    return gammas.withColumn("match_prob", prob).withColumn(
        "match_weight",
        F.when((prod_u > 0) & (prod_m > 0), F.log2(prod_m / prod_u)),
    )


def match_weight_contributions(
    gammas: DataFrame,
    comparisons: Sequence[Comparison],
    params: dict,
) -> DataFrame:
    """Per-field match-weight waterfall (Splink's comparison-level
    explainability): for each pair, the log2 Bayes-factor contribution
    of every comparison — w_c = log2(m_c[gamma] / u_c[gamma]) — plus
    their sum. A clerical reviewer (or a threshold post-mortem) reads
    WHICH field drove a decision, not just the total.

    Pure-codegen projection with the parameters as literals — no join,
    no UDF, no shuffle beyond whatever produced the gamma table; levels
    where m or u is exactly 0 surface NULL (the Bayes factor is ±inf),
    and the total inherits NULL through addition, matching
    :func:`score_with_params`'s guard."""
    out = gammas
    total = None
    for c in comparisons:
        m = _level_expr(c, params[f"m_{c.name}"])
        u = _level_expr(c, params[f"u_{c.name}"])
        w = F.when((m > 0) & (u > 0), F.log2(m / u))
        out = out.withColumn(f"w_{c.name}", w)
        total = w if total is None else total + w
    return out.withColumn("total_weight", total)


def unlinkables_histogram(
    scored: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    weight_col: str = "match_weight",
    bin_width: float = 1.0,
) -> DataFrame:
    """Distribution of each record's BEST match weight (Splink's
    unlinkables chart): how many records have no candidate above any
    given weight — the number that says what fraction of the corpus a
    threshold will leave as singletons, read BEFORE picking one.

    Per-record best = ONE explode of the pair table (a 2-element
    array(struct) per row, so the upstream pair-scoring plan is scanned
    once — a union of two selects would execute it twice) + a max-agg
    keyed by record id; histogram = floor-binning that (tiny) per-record
    table and a cumulative window over the DISTINCT bins only. Both
    aggs are map-side combinable; nothing is ranked over the pair
    table. Records whose weights are all NULL (±inf Bayes factors)
    fall out of the max and are excluded — surfacing them is the
    caller's NULL-handling decision, not a silent zero bin."""
    per_side = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(id_a).alias("rid"), F.col(weight_col).alias("w")
                ),
                F.struct(
                    F.col(id_b).alias("rid"), F.col(weight_col).alias("w")
                ),
            )
        ).alias("side")
    ).select("side.rid", "side.w")
    best = per_side.where(F.col("w").isNotNull()).groupBy("rid").agg(
        F.max("w").alias("best_w")
    )
    binned = best.groupBy(
        (F.floor(F.col("best_w") / F.lit(float(bin_width))) * F.lit(float(bin_width)))
        .alias("weight_bin")
    ).agg(F.count("*").alias("n_records"))
    # cumulative over the DISTINCT bins (bounded by the weight range /
    # bin width, not the corpus) — records at or below each bin = the
    # unlinkable count if the accept threshold were set just above it
    w = Window.orderBy("weight_bin").rowsBetween(Window.unboundedPreceding, 0)
    return binned.withColumn("cum_records", F.sum("n_records").over(w))


def reciprocal_best_links(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score: str = "score",
) -> DataFrame:
    """One-to-one bipartite assignment by reciprocal best match: keep
    (a, b) iff b is a's highest-scoring candidate AND a is b's.

    The linkage (A↔B) complement of the dedup-only reference: after
    blocking + scoring, record linkage must enforce that each left
    entity links to at most one right entity and vice versa (Fellegi &
    Sunter's one-to-one assignment; Splink calls this "link_only" with
    deterministic tie-breaking). A full max-weight bipartite matching is
    inherently sequential; reciprocal-best is the standard distributed
    relaxation — it returns a subset of any maximum matching, never a
    conflicting link, and is embarrassingly parallel.

    Shape at scale: two ``row_number`` windows, each ONE hash exchange
    on its own key (left id, then right id) over the candidate-pair
    table only — the entity tables never re-shuffle, and no iterative
    auction rounds. Ties break on the smaller partner id so the result
    is deterministic under duplicate scores.
    """
    w_a = Window.partitionBy(id_a).orderBy(F.col(score).desc(), F.col(id_b).asc())
    w_b = Window.partitionBy(id_b).orderBy(F.col(score).desc(), F.col(id_a).asc())
    return (
        pairs.withColumn("_rank_a", F.row_number().over(w_a))
        .withColumn("_rank_b", F.row_number().over(w_b))
        .where((F.col("_rank_a") == 1) & (F.col("_rank_b") == 1))
        .drop("_rank_a", "_rank_b")
    )


def term_frequencies(df: DataFrame, value_col: str) -> DataFrame:
    """Relative frequency of each value of ``value_col`` — the side
    table for term-frequency adjustment. One map-side-combinable agg;
    the result has one row per distinct value (tiny → broadcast). Fully
    lazy like every other operator here: the total is a broadcast
    1-row agg joined in, not an eager driver-side count()."""
    counts = df.groupBy(F.col(value_col).alias("value")).agg(
        F.count("*").alias("n")
    )
    total = df.agg(F.count("*").cast("double").alias("_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "value", (F.col("n") / F.col("_total")).alias("tf")
    )


def tf_adjusted_weights(
    scored: DataFrame,
    tf: DataFrame,
    value_col: str,
    gamma_col: str,
    u_agree: float,
    agree_level: int = 1,
) -> DataFrame:
    """Splink-style term-frequency adjustment of Fellegi-Sunter match
    weights (Winkler 1989's value-specific weights): agreement on a
    COMMON value ("en") is weaker evidence than agreement on a RARE one,
    so for pairs agreeing on value v the generic u-probability of the
    agree level is replaced by v's own collision probability tf(v) —
    the Bayes factor gains a log2(u_agree / tf_v) term. Disagreeing
    pairs (and values absent from the tf table) keep the base weight.

    ``scored`` must carry ``value_col`` (the pair's agreed value) and a
    ``match_weight`` from :func:`score_with_params`. The tf table is one
    row per distinct field value — broadcast, so the adjustment adds NO
    shuffle to the pair table at any scale.
    """
    adj = F.when(
        (F.col(gamma_col) == agree_level) & F.col("tf").isNotNull() & (F.col("tf") > 0),
        F.log2(F.lit(float(u_agree)) / F.col("tf")),
    ).otherwise(F.lit(0.0))
    return (
        scored.join(
            F.broadcast(tf.withColumnRenamed("value", value_col)),
            value_col,
            "left",
        )
        .withColumn("tf_adj_weight", F.col("match_weight") + adj)
        .drop("tf")
    )


def uncertainty_sample(
    scored: DataFrame,
    k: int,
    prob_col: str = "match_prob",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Active-learning batch selection: the ``k`` candidate pairs whose
    match posterior sits closest to 0.5 — the pairs whose human label
    moves the model most (uncertainty sampling, Lewis & Gale 1994; the
    query strategy interactive linkage tools train their weights on).
    The reference has no learning loop at all (fixed thresholds,
    /root/reference/src/deduplication.cpp:985-1178); this is the
    review-queue builder a production ER deployment adds around one.

    ``uncertainty = round(0.5 - |p - 0.5|, 6)`` in [0, 0.5], rounded so
    the (uncertainty desc, id_a, id_b) total order is engine-portable
    (an unrounded float sort key can straddle ulps between engines and
    swap boundary rows in and out of the top-k). The top-k executes as
    TakeOrderedAndProject — a per-partition k-heap merged on the driver,
    k rows of driver state — so the pair table is never globally sorted
    at any corpus size.
    """
    unc = F.round(F.lit(0.5) - F.abs(F.col(prob_col) - F.lit(0.5)), 6)
    return (
        scored.withColumn("uncertainty", unc)
        .orderBy(F.desc("uncertainty"), F.col(id_a), F.col(id_b))
        .limit(k)
    )
