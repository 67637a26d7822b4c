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
