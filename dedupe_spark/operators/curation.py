"""End-to-end training-corpus curation: one call composing the quality
funnel, exact dedup, verified MinHash near-dedup, and benchmark
decontamination into a single per-document verdict.

This is the composition a 100 TB pretraining-data pipeline actually
runs (C4 / Gopher / GPT-3 appendix C, all public): quality-filter
first (cheap per-row expressions drop the bulk), dedup only the
survivors (the expensive candidate join never sees filtered rows),
then decontaminate what remains against held-out benchmarks. The
reference's analog is the insert_files flow (probe -> verify -> commit,
/root/reference/src/deduplication.cpp:509-637) — here widened to the
document-curation stages an LLM corpus needs.

Precedence is fixed so every document gets exactly one verdict and
per-stage drop counts form a funnel:

  quality rule (first failing of FUNNEL_RULES) > exact_dup > near_dup
  > contaminated > keep

Scale shape: stage 1 is one scan of codegen'd expressions; stage 2 is
a hash-agg on the normalized-text fingerprint; stage 3 runs MinHash
band keys + verified Jaccard only over exact-canonical survivors;
stage 4 broadcasts the (small) benchmark gram set, so the corpus side
never shuffles for it. Nothing quadratic, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedupe_spark.operators.dedup import (
    decontaminate,
    minhash_lsh_pairs,
    ngram_jaccard_on_pairs,
    normalize_expr,
)
from dedupe_spark.operators.text_analysis import filter_funnel

CURATE_VERDICTS = (
    "too_short", "too_long", "low_stopword", "high_punct", "repetitive",
    "non_english", "exact_dup", "near_dup", "contaminated", "keep",
)


def curate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 12,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.6,
    contam_ngram: int = 8,
    contam_min_shared: int = 3,
) -> DataFrame:
    """(id, verdict) for every document in ``docs``.

    ``bench`` is the held-out benchmark corpus (same schema); training
    docs sharing >= ``contam_min_shared`` distinct ``contam_ngram``-grams
    with any benchmark doc are 'contaminated'. Dedup representatives are
    the lowest id per group (greedy: a doc is a dup when a
    sufficiently-similar doc with a lower id survived the earlier
    stages); near-dup candidates come from MinHash/LSH bands and are
    verified with exact n-gram Jaccard before any doc is dropped, so a
    band collision alone never discards data.
    """
    funneled = filter_funnel(docs, text_col).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text"), "verdict"
    )
    survivors = funneled.where(F.col("verdict") == "keep").select("id", "text")

    # exact: lowest id per normalized-text fingerprint is canonical
    fp = survivors.select("id", "text", F.md5(normalize_expr(F.col("text"))).alias("fp"))
    canon = fp.groupBy("fp").agg(F.min("id").alias("canon_id"))
    exact = fp.join(canon, "fp").select(
        "id", "text", (F.col("id") != F.col("canon_id")).alias("is_exact_dup")
    )
    canon_docs = exact.where(~F.col("is_exact_dup")).select("id", "text")

    # near: banded candidates over canonical survivors only (an exact
    # copy must never vote its canonical out), verified before dropping
    cand = minhash_lsh_pairs(canon_docs, "id", "text", num_perm, rows_per_band)
    verified = ngram_jaccard_on_pairs(
        canon_docs, cand, "id", "text", threshold=jaccard_threshold
    )
    near_ids = verified.select(F.col("id_b").alias("id")).distinct()

    bench_docs = bench.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    contam_ids = (
        decontaminate(canon_docs, bench_docs, "id", "text", n=contam_ngram, min_shared=contam_min_shared)
        .select(F.col("train_id").alias("id"))
        .distinct()
    )

    return (
        funneled.join(exact.select("id", "is_exact_dup"), "id", "left")
        .join(near_ids.withColumn("is_near_dup", F.lit(True)), "id", "left")
        .join(contam_ids.withColumn("is_contam", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("verdict") != "keep", F.col("verdict"))
            .when(F.col("is_exact_dup"), F.lit("exact_dup"))
            .when(F.col("is_near_dup"), F.lit("near_dup"))
            .when(F.col("is_contam"), F.lit("contaminated"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
    )


def curation_report(verdicts: DataFrame) -> DataFrame:
    """Funnel report over ``curate`` output: (verdict, n_docs, frac),
    every verdict present (zero-filled) in precedence order."""
    spark = verdicts.sparkSession
    order = {v: i for i, v in enumerate(CURATE_VERDICTS)}
    all_v = spark.createDataFrame(
        [(v, i) for v, i in order.items()], "verdict string, ord int"
    )
    counts = verdicts.groupBy("verdict").agg(F.count("*").alias("n_docs"))
    total = verdicts.count()
    return (
        all_v.join(counts, "verdict", "left")
        .select(
            "verdict",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.round(F.coalesce("n_docs", F.lit(0)) / F.lit(max(total, 1)), 6).alias("frac"),
            "ord",
        )
        .orderBy("ord")
        .drop("ord")
    )
