from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.text_analysis import (
    document_fingerprint,
    predict_language,
    quality_features,
    token_counts,
)


@pytest.fixture(scope="module")
def text_df(spark):
    rows = [
        (1, "the cat and the dog went to the park and it is a sunny day for everyone involved."),
        (2, "der hund und die katze sind nicht im haus und der garten ist schoen heute."),
        (3, "le chat et la souris sont dans le jardin et les oiseaux chantent."),
        (4, "!!!???;;;"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_language_prediction(text_df):
    got = {r["doc_id"]: r["pred_lang"] for r in predict_language(text_df).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"


def test_quality_features(text_df):
    rows = {r["doc_id"]: r for r in quality_features(text_df).collect()}
    good, junk = rows[1], rows[4]
    assert good["quality_score"] > junk["quality_score"]
    assert junk["punct_ratio"] > 0.9
    assert good["stopword_ratio"] > 0.2
    assert good["n_words"] == len(rows[1]["text"].split())


def test_token_counts(text_df):
    rows = {r["doc_id"]: r for r in token_counts(text_df).collect()}
    assert rows[1]["n_tokens_ws"] == len(rows[1]["text"].split())
    assert rows[1]["n_tokens_bpe_est"] == -(-len(rows[1]["text"]) // 4)


def test_document_fingerprint_properties(spark, text_df):
    fp1 = {r["doc_id"]: r["doc_fp"] for r in document_fingerprint(text_df).collect()}
    # deterministic
    fp2 = {r["doc_id"]: r["doc_fp"] for r in document_fingerprint(text_df).collect()}
    assert fp1 == fp2
    # identical docs share fingerprints; distinct docs (here) don't
    assert len(set(fp1.values())) == len(fp1)
    dup = spark.createDataFrame([(9, None)], "doc_id long, ignore string").drop("ignore")
    same = text_df.withColumn("doc_id", F.col("doc_id") + 100)
    fp3 = {r["doc_id"]: r["doc_fp"] for r in document_fingerprint(same).collect()}
    assert fp3[101] == fp1[1]


def test_repetition_metrics(spark):
    from dedupe_spark.operators.text_analysis import repetition_metrics

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # 6 toks {a,b}; grams: ab,ba,ab,ba,ab -> top ab=3/5
            (2, "x y z w"),              # all unique
            (3, "q q q q"),              # one token repeated
            (4, "solo"),                 # single token: no grams
            (5, ""),                     # degenerate
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(df).collect()}

    r1 = rows[1]
    assert r1["n_tokens"] == 6
    assert abs(r1["uniq_token_frac"] - 2 / 6) < 1e-9
    assert abs(r1["dup_2gram_frac"] - (1 - 2 / 5)) < 1e-9
    assert abs(r1["top_2gram_frac"] - 3 / 5) < 1e-9

    r2 = rows[2]
    assert r2["uniq_token_frac"] == 1.0
    assert r2["dup_2gram_frac"] == 0.0
    assert abs(r2["top_2gram_frac"] - 1 / 3) < 1e-9  # every gram unique, top=1 of 3

    r3 = rows[3]
    assert abs(r3["uniq_token_frac"] - 1 / 4) < 1e-9
    assert abs(r3["dup_2gram_frac"] - (1 - 1 / 3)) < 1e-9
    assert r3["top_2gram_frac"] == 1.0  # "q q" is every gram

    r4 = rows[4]
    assert r4["n_tokens"] == 1
    assert r4["uniq_token_frac"] == 1.0
    assert r4["dup_2gram_frac"] == 0.0 and r4["top_2gram_frac"] == 0.0

    # Spark split('', '\s+') yields [''] — one empty token, no grams;
    # matches the DuckDB oracle's regexp_split_to_array behavior
    r5 = rows[5]
    assert r5["n_tokens"] == 1
    assert r5["dup_2gram_frac"] == 0.0 and r5["top_2gram_frac"] == 0.0


def test_filter_funnel_rule_precedence(spark):
    from dedupe_spark.operators.text_analysis import filter_funnel

    en = ("the cat and the dog went to the park and it is a sunny day "
          "for everyone involved in the big happy outing today")
    rows = [
        (1, en),                                    # keep
        (2, "tiny"),                                # too_short (fails later rules too)
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),  # no stopwords
        (4, ("der hund und die katze sind nicht im haus und der garten ist "
             "schoen heute und der himmel ist blau und die sonne ist nicht kalt")),  # non_english... stopwords?
        (5, ("yes no " * 20).strip() + " the of and to is in a for on with"),  # repetitive
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["verdict"] for r in filter_funnel(df, "text").collect()}
    assert got[1] == "keep"
    assert got[2] == "too_short"          # first rule wins even if others fail
    assert got[3] == "low_stopword"
    assert got[5] == "repetitive"


def test_tfidf_top_terms(spark):
    import math

    from dedupe_spark.operators.text_analysis import tfidf_top_terms

    rows = [
        (1, "apple apple banana shared"),
        (2, "cherry cherry cherry shared"),
        (3, "banana date shared shared"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["token"], r["tf"], r["tfidf"]))
    # 'shared' is in every doc -> idf = ln(1) = 0, never a top term
    top1 = {d: sorted(v)[0][1] for d, v in by_doc.items()}
    # doc 3: 'date' (df=1, idf=ln 3) outranks 'banana' (df=2, idf=ln 1.5)
    assert top1 == {1: "apple", 2: "cherry", 3: "date"}
    got = dict((t, s) for _, t, _, s in by_doc[1])
    assert got["apple"] == round(2 * math.log(3 / 1), 6)
    assert all(len(v) == 2 for v in by_doc.values())


def test_filter_funnel_null_text_is_too_short(spark):
    """NULL text behaves as empty -> 'too_short', never 'repetitive'."""
    from dedupe_spark.operators.text_analysis import filter_funnel

    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    got = {r["doc_id"]: r["verdict"] for r in filter_funnel(df).collect()}
    assert got[1] == got[2] == "too_short"
