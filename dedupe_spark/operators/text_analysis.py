"""Text-analysis operators for training-data pipelines over `documents`.

All are pure JVM-side expression compositions (codegen'd, pushdown-safe)
so every one of them has an exact ANSI-SQL oracle — see
``__spark_entry__.oracle_sql``. Reference analogs: the per-chunk scalar
functions (hash family, /root/reference/src/hashfunc.cpp) generalized to
per-document text statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword banks per language — enough signal for a
# heuristic n-gram/stopword language id without external models
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " ist ", " nicht "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " los ", " que ", " es ", " una "],
}

_EN_STOPWORDS = ["the", "and", "of", "to", "is", "in", "a", "for", "on", "with"]


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring via the length-difference trick —
    identical semantics in Spark and ANSI SQL (no regex dialect issues)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))
    ) / F.lit(len(needle))


def lang_score(text: Column, lang: str) -> Column:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    score = None
    for m in _LANG_MARKERS[lang]:
        c = _count_occurrences(padded, m)
        score = c if score is None else score + c
    return score


def predict_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-frequency language id: argmax over marker-hit counts.

    Ties break by language code order (deterministic). Emits the score of
    the winning language too.
    """
    t = F.col(text_col)
    scored = df
    for lang in _LANG_MARKERS:
        scored = scored.withColumn(f"score_{lang}", lang_score(t, lang))
    best = F.greatest(*[F.col(f"score_{lang}") for lang in _LANG_MARKERS])
    pred = None
    for lang in reversed(list(_LANG_MARKERS)):
        cond = F.when(F.col(f"score_{lang}") == best, F.lit(lang))
        pred = cond.otherwise(pred) if pred is not None else cond
    return scored.withColumn("pred_lang", pred).withColumn("pred_score", best)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    quality features + a composite [0,1] score."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    punct_chars = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_hits = None
    for w in _EN_STOPWORDS:
        c = _count_occurrences(padded, f" {w} ")
        stop_hits = c if stop_hits is None else stop_hits + c
    out = (
        df.withColumn("n_chars", n_chars.cast("long"))
        .withColumn("n_words", n_words.cast("long"))
        .withColumn("punct_ratio", punct_chars / F.greatest(n_chars, F.lit(1)))
        .withColumn("stopword_ratio", stop_hits / F.greatest(n_words, F.lit(1)))
        .withColumn(
            "mean_word_len",
            (n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1)),
        )
    )
    # composite: in-range length, some stopwords, sane punctuation
    score = (
        F.when((F.col("n_chars") >= 50) & (F.col("n_chars") <= 20000), F.lit(0.4)).otherwise(0.0)
        + F.when((F.col("stopword_ratio") >= 0.05) & (F.col("stopword_ratio") <= 0.8), F.lit(0.3)).otherwise(0.0)
        + F.when(F.col("punct_ratio") <= 0.2, F.lit(0.3)).otherwise(0.0)
    )
    return out.withColumn("quality_score", score)


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (chars/4 heuristic
    blended with punctuation splits) — both deterministic expressions."""
    t = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(t), r"\s+"))
    # BPE-ish: words + extra splits for long words (every 6 chars beyond 6)
    n_chars = F.length(t)
    bpe_est = F.ceil(n_chars / F.lit(4.0)).cast("long")
    return df.withColumn("n_tokens_ws", ws_tokens.cast("long")).withColumn(
        "n_tokens_bpe_est", bpe_est
    )


def document_fingerprint(df: DataFrame, text_col: str = "text", gram: int = 8) -> DataFrame:
    """Winnowing-style fingerprint: minimum md5 over the document's
    character n-grams (the reference's rolling-Adler boundary sampling,
    /root/reference/src/checksum.cpp:68-76, at hash-of-window granularity).

    Pure expressions: sequence -> substring -> md5 -> array_min.
    """
    t = F.col(text_col)
    n = F.length(t)
    grams = F.when(
        n >= gram,
        F.transform(
            F.sequence(F.lit(1), n - gram + 1),
            lambda i: F.md5(t.substr(i, F.lit(gram))),
        ),
    ).otherwise(F.array(F.md5(t)))
    return df.withColumn("doc_fp", F.array_min(grams))


def repetition_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals per document.

    Emitted per row (all ratios in [0,1], 0.0 for degenerate docs):

    - ``n_tokens``            whitespace token count
    - ``uniq_token_frac``     |distinct tokens| / |tokens| — low values
                              mean heavy word repetition
    - ``dup_2gram_frac``      1 - |distinct 2-grams| / |2-grams| — the
                              "duplicate n-gram fraction" repetition
                              filter from the Gopher/MassiveText data
                              pipeline (Rae et al. 2021, public)
    - ``top_2gram_frac``      occurrences of the single most frequent
                              2-gram / |2-grams| — catches boilerplate
                              loops that unique-fraction misses

    Layout of work: the per-row parts (token split, distinct counts) are
    pure codegen'd array expressions; the top-2-gram count is an explode
    -> two-level aggregate (partial map-side combine, shuffle keyed on
    (doc, gram)) joined back — no per-row quadratic scan, so a hot
    document costs O(tokens) and the shuffle spreads by (doc_id, gram).
    The 2-gram array uses the zip_with-over-shifted-slices layout
    (operators/minhash.py:shingle_hashes) so lambda bodies stay O(1).
    """
    t = F.col(text_col)
    toks = F.split(F.trim(t), r"\s+")
    # the 2-gram zip_with reads the BOUND _toks attribute: slices of an
    # inline split expression re-run the split once per reference
    # (interpreted HOF inputs), ~4x per row
    tk = F.col("_toks")
    n = F.size(tk)
    m = n - F.lit(1)  # 2-gram count when n >= 2
    grams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(tk, 1, m),
            F.slice(tk, 2, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))

    base = (
        df.withColumn("_toks", toks)
        .withColumn("_grams", grams)
        .withColumn("n_tokens", F.size("_toks").cast("long"))
        .withColumn(
            "uniq_token_frac",
            F.when(
                F.size("_toks") > 0,
                F.size(F.array_distinct("_toks")) / F.size("_toks"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "dup_2gram_frac",
            F.when(
                F.size("_grams") > 0,
                F.lit(1.0) - F.size(F.array_distinct("_grams")) / F.size("_grams"),
            ).otherwise(F.lit(0.0)),
        )
    )
    top = (
        # outer + not-null: keeps the inferred size>0 filter from
        # re-deriving the gram array below _grams' projection
        # (see blocking.explode_blocks)
        base.select(id_col, F.explode_outer("_grams").alias("_g"))
        .where(F.col("_g").isNotNull())
        .groupBy(id_col, "_g")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top"))
    )
    return (
        base.join(top, id_col, "left")
        .withColumn(
            "top_2gram_frac",
            F.when(
                F.size("_grams") > 0, F.col("_top") / F.size("_grams")
            ).otherwise(F.lit(0.0)),
        )
        .drop("_toks", "_grams", "_top")
    )


# fixed rule order for the corpus filter funnel: a document's verdict is
# the FIRST failing rule, so per-rule drop counts form a funnel (each
# rule only sees what the previous rules kept) — the layout of the
# C4 / Gopher data-pipeline quality reports (Raffel et al. 2020,
# Rae et al. 2021, public)
FUNNEL_RULES = (
    "too_short",
    "too_long",
    "low_stopword",
    "high_punct",
    "repetitive",
    "non_english",
)


def filter_funnel(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite keep/drop verdict per document, first-failing-rule wins.

    Single pass, zero joins: every rule is a per-row codegen'd
    expression (token split, distinct-count, stopword substring counts,
    language-marker argmax), so the funnel costs one scan at any corpus
    size and the verdict column is partition-pruning-friendly when the
    output is written partitioned by verdict.

    NULL text is treated as empty — without the coalesce every length
    rule's condition evaluates NULL (skipped) while uniq_frac's guard
    falls through to 0.0, mislabeling NULL docs 'repetitive' instead of
    'too_short' and corrupting the per-rule funnel counts.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    # bind the token array before anything references it: the 2-gram
    # zip_with (and the distinct/size counts) would otherwise re-run
    # the split once per reference (interpreted HOF inputs)
    tk = F.col("_ftoks")
    n_words = F.size(tk)
    n_chars = F.length(t)
    punct_ratio = (
        n_chars - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))
    ) / F.greatest(n_chars, F.lit(1))
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    stop_hits = None
    for w in _EN_STOPWORDS:
        c = _count_occurrences(padded, f" {w} ")
        stop_hits = c if stop_hits is None else stop_hits + c
    stopword_ratio = stop_hits / F.greatest(n_words, F.lit(1))
    uniq_frac = F.when(
        n_words > 0, F.size(F.array_distinct(tk)) / n_words
    ).otherwise(F.lit(0.0))
    m = n_words - F.lit(1)
    grams = F.when(
        n_words >= 2,
        F.zip_with(
            F.slice(tk, 1, m), F.slice(tk, 2, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dup_2gram = F.when(
        F.size(grams) > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)) / F.size(grams),
    ).otherwise(F.lit(0.0))

    scored = df.withColumn("_ftoks", F.split(F.trim(t), r"\s+"))
    for lang in _LANG_MARKERS:
        scored = scored.withColumn(f"_s_{lang}", lang_score(t, lang))
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in _LANG_MARKERS])
    pred = None
    for lang in reversed(list(_LANG_MARKERS)):
        cond = F.when(F.col(f"_s_{lang}") == best, F.lit(lang))
        pred = cond.otherwise(pred) if pred is not None else cond

    verdict = (
        F.when(n_words < 10, F.lit("too_short"))
        .when(n_chars > 20000, F.lit("too_long"))
        .when(stopword_ratio < 0.05, F.lit("low_stopword"))
        .when(punct_ratio > 0.2, F.lit("high_punct"))
        .when((dup_2gram > 0.3) | (uniq_frac < 0.3), F.lit("repetitive"))
        .when(pred != F.lit("en"), F.lit("non_english"))
        .otherwise(F.lit("keep"))
    )
    return scored.withColumn("verdict", verdict).drop(
        "_ftoks", *[f"_s_{lang}" for lang in _LANG_MARKERS]
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    idf = ln(N / df_t) over the corpus; ties break on the token string
    so the result is deterministic. Plan shape: explode -> two
    hash aggregates (term frequency per (doc, token), document
    frequency per token — both map-side combinable) -> join keyed on
    token -> per-doc window top-k. N enters the plan as a broadcast
    1-row aggregate (cross join), not a driver-side collect, so the
    whole thing stays one lazy DAG.
    """
    # outer + not-null: see blocking.explode_blocks (the inferred size>0
    # filter would run the regex split twice per row)
    toks = F.explode_outer(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")
    tf = (
        df.select(F.col(id_col).alias("id"), toks)
        .where(F.col("token").isNotNull())
        .groupBy("id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    docfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("df_t"))
    n_docs = df.select(F.col(id_col)).distinct().agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(docfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df_t")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            F.col("rank").cast("int").alias("rank"),
            "token",
            "tf",
            F.round("tfidf", 6).alias("tfidf"),
        )
    )
