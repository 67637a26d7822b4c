from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def doc_df(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing outside in the garden"
    )
    rows = [
        (1, base),
        (2, base.upper()),  # exact dup after normalization
        (3, base.replace("quick", "fast").replace("cat", "kitten")),  # near dup
        (4, "short unrelated snippet about query planners"),
        (5, "another very different document describing streaming watermarks and state stores in detail"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_exact_dedup(doc_df):
    got = {r["canonical_id"]: r["n_copies"] for r in exact_dedup(doc_df, "doc_id", "text").collect()}
    assert got[1] == 2  # 1 and 2 collapse
    assert got[3] == 1 and got[4] == 1 and got[5] == 1


def test_minhash_lsh_finds_near_dup(doc_df):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(doc_df, "doc_id", "text").collect()}
    assert (1, 2) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs
    assert not any({4, 5} & {a, b} for a, b in pairs)


def test_ngram_jaccard_exact_values(doc_df):
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(doc_df, "doc_id", "text", threshold=0.3).collect()}
    assert got[(1, 2)] == 1.0
    assert 0.3 <= got[(1, 3)] < 1.0
    assert (1, 4) not in got


def test_simhash_near_dup_small_hamming(spark, doc_df):
    from dedupe_spark.operators.dedup import simhash64

    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(doc_df, "doc_id", "text", max_hamming=10).collect()}
    assert pairs[(1, 2)] == 0  # exact dup -> identical simhash
    assert (1, 4) not in pairs
    # hamming-distance ordering property: near dup is much closer than
    # unrelated text (unbanded direct check — simhash on short token sets
    # is coarse, so the property, not a fixed band hit, is the contract)
    sh = {r["doc_id"]: r["sh"] for r in doc_df.select("doc_id", simhash64(doc_df.text).alias("sh")).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sh[1], sh[3]) < ham(sh[1], sh[5])
    assert ham(sh[1], sh[3]) <= 20


def test_embedding_cosine_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),  # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # block_planes=0: exact all-pairs path (these axis-aligned vectors sit
    # on sign boundaries, which the banded default intentionally splits)
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(
            df, "vec_id", "embedding", threshold=0.95, block_planes=0
        ).collect()
    }
    assert got == {(1, 2)}


def test_embedding_cosine_with_buckets_same_result(spark):
    rows = [
        (1, [1.0, 0.2, 0.1, 0.05]),
        (2, [0.98, 0.21, 0.1, 0.05]),
        (3, [-0.5, 0.9, -0.4, 0.2]),
        (4, [0.9, 0.25, 0.12, 0.04]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plain = {(r["id_a"], r["id_b"]) for r in embedding_cosine_pairs(df, "vec_id", "embedding", threshold=0.95).collect()}
    bucketed = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(df, "vec_id", "embedding", threshold=0.95, block_planes=2, dim=4).collect()
    }
    # same-bucket near-dups must be found by the bucketed path too
    assert bucketed == plain


def test_chunk_documents_fixed_token_windows(spark):
    from dedupe_spark.operators.dedup import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(70))), (2, "short text"), (3, "")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"]
        for r in chunk_documents(df, "doc_id", "text", chunk_tokens=32).collect()
    }
    # 70 tokens -> 32 + 32 + 6 (tail kept, reference last_block semantics)
    assert sorted(k[1] for k in rows if k[0] == 1) == [0, 1, 2]
    assert rows[(1, 0)].split(" ") == [f"w{i}" for i in range(32)]
    assert rows[(1, 2)].split(" ") == [f"w{i}" for i in range(64, 70)]
    assert rows[(2, 0)] == "short text"
    assert rows[(3, 0)] == ""  # empty doc still yields its one chunk


def test_chunk_minhash_links_copied_paragraph(spark):
    """A paragraph shared between two otherwise-disjoint documents links
    at CHUNK granularity even though the whole-document signatures are
    dominated by the differing remainder."""
    from dedupe_spark.operators.dedup import chunk_minhash_pairs

    para = " ".join(f"common{i}" for i in range(32))
    d1 = para + " " + " ".join(f"left{i}" for i in range(64))
    d2 = para + " " + " ".join(f"right{i}" for i in range(64))
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in chunk_minhash_pairs(df, "doc_id", "text", chunk_tokens=32).collect()
    }
    assert ("1:0", "2:0") in pairs  # the copied chunk collides on every band
    # the disjoint tails never pair up
    assert not any(a.endswith(":1") and b.endswith(":2") for a, b in pairs if a[0] != b[0])


def test_dedup_keep_best_picks_highest_quality_member(spark):
    """Keep-best policy: within an exact-dup cluster the surviving doc is
    the highest-quality member (ties -> lowest id), and saved_chars is
    the dropped members' total length."""
    from dedupe_spark.operators.dedup import dedup_keep_best

    good = (
        "the quick brown fox jumps over the lazy dog and runs on with "
        "a long enough body of text for the length gate to accept it."
    )
    # same normalized fp as `good` (case + punctuation differences only),
    # but fails the quality length gate after normalization? No — same
    # n_chars range; make it *lower* quality by exceeding punct ratio
    noisy = good.upper().replace(" ", " ;;;; ")
    short = "tiny"  # its own singleton cluster, quality 0.3 at best
    df = spark.createDataFrame(
        [(1, noisy), (2, good), (3, short)], "doc_id long, text string"
    )
    rows = {r["cluster_id"]: r for r in dedup_keep_best(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 3}  # cluster ids are min member ids
    kb = rows[1]
    assert kb["kept_doc_id"] == 2  # the clean copy wins despite higher id
    assert kb["n_members"] == 2
    assert kb["saved_chars"] == len(noisy)
    assert rows[3]["n_members"] == 1 and rows[3]["saved_chars"] == 0


def test_dedup_keep_best_tie_breaks_on_lowest_id(spark):
    from dedupe_spark.operators.dedup import dedup_keep_best

    text = "a body of text that is comfortably past the fifty character minimum for the quality gate"
    df = spark.createDataFrame([(7, text), (4, text)], "doc_id long, text string")
    [row] = dedup_keep_best(df, "doc_id", "text").collect()
    assert row["cluster_id"] == 4 and row["kept_doc_id"] == 4
    assert row["n_members"] == 2 and row["saved_chars"] == len(text)


def test_corpus_dedup_stats_keep_shortest_accounting(spark):
    from dedupe_spark.operators.dedup import corpus_dedup_stats

    df = spark.createDataFrame(
        [
            ("s1", 1, "Hello, World"),   # len 12, fp A
            ("s1", 2, "hello world"),    # len 11, fp A (kept: shortest)
            ("s1", 3, "unique text"),    # len 11, fp B
            ("s2", 4, "other corpus"),   # len 12, fp C
        ],
        "source string, doc_id long, text string",
    )
    got = {r["source"]: r for r in corpus_dedup_stats(df, "doc_id", "text", "source").collect()}
    s1 = got["s1"]
    assert (s1["n_docs"], s1["n_unique"], s1["dup_rows"]) == (3, 2, 1)
    assert s1["org_chars"] == 12 + 11 + 11
    assert s1["saved_chars"] == 12  # the longer copy of fp A is dropped
    assert abs(s1["dedup_ratio"] - round(12 / 34, 6)) < 1e-9
    s2 = got["s2"]
    assert (s2["n_docs"], s2["dup_rows"], s2["saved_chars"]) == (1, 0, 0)


def test_passage_dedup_stats(spark):
    from dedupe_spark.operators.dedup import passage_dedup_stats

    w16 = " ".join(f"tok{i}" for i in range(16))
    other = " ".join(f"zzz{i}" for i in range(16))
    rows = [
        (1, w16 + " " + other),          # 2 passages, first shared with doc 2
        (2, w16 + " " + w16),            # same window twice -> both duplicated
        (3, "tiny doc"),                 # shorter than a window -> zero passages
        (4, " ".join(f"uni{i}" for i in range(35))),  # 2 unique passages + tail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in passage_dedup_stats(df, "doc_id", "text", window=16).collect()}
    assert got[1]["n_passages"] == 2 and got[1]["n_dup_passages"] == 1
    assert got[2]["n_passages"] == 2 and got[2]["n_dup_passages"] == 2
    assert got[2]["dup_passage_frac"] == 1.0
    assert got[3]["n_passages"] == 0 and got[3]["dup_passage_frac"] == 0.0
    assert got[4]["n_passages"] == 2 and got[4]["n_dup_passages"] == 0


def test_decontaminate_finds_overlap_and_broadcasts(spark):
    from dedupe_spark.operators.dedup import decontaminate

    shared = " ".join(f"w{i}" for i in range(12))  # 5 distinct 8-grams
    train = spark.createDataFrame(
        [(1, shared + " trailer tokens here"), (2, "completely different text " * 3)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, shared)], "doc_id long, text string")
    out = decontaminate(train, bench, "doc_id", "text", n=8, min_shared=3)
    rows = {(r["train_id"], r["bench_id"]): r["n_shared"] for r in out.collect()}
    assert rows == {(1, 100): 5}
    # the benchmark side must broadcast: the corpus-side scan joins
    # without a shuffle on the big side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_cross_corpus_verdicts(spark):
    from dedupe_spark.operators.dedup import cross_corpus_verdicts

    doc = "the quick brown fox jumps over the lazy dog near the river bank today"
    base = spark.createDataFrame(
        [(0, doc), (2, "unrelated base content about astronomy and telescopes tonight")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (1, doc.upper() + "!!"),                   # exact after normalization
            (3, doc.replace("lazy", "sleepy")),        # near: one token differs
            (5, "entirely novel subject matter with no overlap whatsoever here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["verdict"] for r in
           cross_corpus_verdicts(incoming, base, "doc_id", "text").collect()}
    assert got == {1: "exact", 3: "near", 5: "new"}


def test_simhash_table_equals_simhash64(spark, doc_df):
    # pins the docstring claim (dedup.simhash_table): the layered
    # column-bound form and the single-expression form are bit-identical,
    # including edge cases: empty text, NULL text, single token.
    from dedupe_spark.operators.dedup import simhash64, simhash_table

    edge = spark.createDataFrame(
        [(100, ""), (101, None), (102, "solo"), (103, "a b a b a")],
        "doc_id long, text string",
    )
    df = doc_df.unionAll(edge)
    layered = {
        r["id"]: r["sh"] for r in simhash_table(df, "doc_id", "text").collect()
    }
    direct = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", simhash64(F.col("text")).alias("sh")).collect()
    }
    assert layered == direct
