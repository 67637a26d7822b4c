"""Soundex: Spark's built-in F.soundex, the pure-python reference, and
the DuckDB SQL replica (functions/phonetic.py) must agree char-for-char
on alphabetic input — q71's oracle depends on it."""

from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from dedupe_spark.functions.phonetic import soundex_py, soundex_sql

# the algorithm's branchy cases: H/W transparency (Ashcraft), vowel
# separation (Tymczak), first-letter collapse (Pfister, Lloyd), leading
# H/W (Who, Hello), degenerate runs, single chars
ADVERSARIAL = [
    "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
    "Honeyman", "Who", "Wb", "a", "Hello", "white", "chocolate",
    "sacchariferous", "Czarkowska", "HW", "WWW", "Hhh", "yellow",
    "Lloyd", "Jackson", "VanDeusen", "oooo", "bfpv", "aeiou", "hwhw",
    "Schmidt", "Schneider", "Mississippi", "b" * 31,
]


def _random_words(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    return [
        "".join(rng.choice(string.ascii_letters) for _ in range(rng.randint(1, 20)))
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def words():
    # adversarial + random + every word of the actual part-name vocabulary
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT unnest(regexp_split_to_array(trim(p_name), '\\s+')) "
            "FROM read_parquet('/root/testdata/sf0.001/part.parquet')"
        ).fetchall()
    ]
    con.close()
    return sorted(set(ADVERSARIAL + _random_words(300) + vocab))


def test_three_way_soundex_agreement(spark, words):
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got_spark = {
        r["w"]: r["sx"] for r in df.select("w", F.soundex("w").alias("sx")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{w}')" for w in words)
        + ") v(w)"
    )
    got_duck = dict(con.execute(f"SELECT w, {soundex_sql('w')} FROM t").fetchall())
    con.close()
    bad = [
        (w, got_spark[w], soundex_py(w), got_duck[w])
        for w in words
        if not (got_spark[w] == soundex_py(w) == got_duck[w])
    ]
    assert not bad, f"engine disagreement (word, spark, py, duckdb): {bad[:5]}"


def test_soundex_groups_sound_alikes(spark):
    assert soundex_py("Robert") == soundex_py("Rupert") == "R163"
    assert soundex_py("Smith") == soundex_py("Smythe")
    assert soundex_py("cold") != soundex_py("widget")
