"""Vectorized pairwise verification — the generalized ``blocks_cmp``.

Reference analog: candidate verification is length-compare then memcmp
(/root/reference/src/deduplication.cpp:1491,1510) — cheap predicate
first, expensive second. Generalized to similarity per the north star:

  1. JVM-side length-band filter (free, codegen'd)
  2. token-shingle Jaccard (cheap, set ops in the Arrow batch)
  3. Jaro-Winkler only on the ambiguous Jaccard band (expensive)

All Python crossings are Arrow-batched pandas UDFs (never row-at-a-time
``F.udf``). Inside a batch the Jaccard stage uses hashed-token sets; the
Jaro-Winkler stage runs only on rows that survive the gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# decision thresholds (tuned on the labeled fixture; see tests/test_pipeline_e2e.py).
# Measured at N=300: negative pairs (hardneg/random) max out at shingle
# Jaccard ~0.24 while true duplicates bottom out at ~0.46 — 0.40 splits
# with ~2x margin on both sides; the [0.22, 0.40) band falls back to JW.
JACCARD_ACCEPT = 0.40  # shingle Jaccard at/above this -> duplicate
JACCARD_GATE = 0.22  # below this -> reject without computing JW
JW_ACCEPT = 0.93  # in the ambiguous band, JW decides
MIN_LEN_RATIO = 0.40  # length-band prefilter (blocks_cmp length check)


def _shingle_set(text: str, k: int = 3) -> set:
    toks = text.split(" ")
    if len(toks) < k:
        return {text}
    return {hash(tuple(toks[i : i + k])) for i in range(len(toks) - k + 1)}


def _jaro(s: str, t: str) -> float:
    if s == t:
        return 1.0
    ls, lt = len(s), len(t)
    if ls == 0 or lt == 0:
        return 0.0
    window = max(ls, lt) // 2 - 1
    sa = np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8)
    ta = np.frombuffer(t.encode("utf-8", "replace"), dtype=np.uint8)
    ls, lt = len(sa), len(ta)
    t_taken = np.zeros(lt, dtype=bool)
    s_match_idx = []
    t_match_idx = []
    for i in range(ls):
        lo, hi = max(0, i - window), min(lt, i + window + 1)
        seg = ta[lo:hi]
        cand = np.flatnonzero((seg == sa[i]) & ~t_taken[lo:hi])
        if cand.size:
            j = lo + cand[0]
            t_taken[j] = True
            s_match_idx.append(i)
            t_match_idx.append(j)
    m = len(s_match_idx)
    if m == 0:
        return 0.0
    s_seq = sa[np.array(s_match_idx)]
    t_seq = ta[np.sort(np.array(t_match_idx))]
    transpositions = int(np.sum(s_seq != t_seq)) // 2
    return (m / ls + m / lt + (m - transpositions) / m) / 3.0


def jaro_winkler_py(s: str, t: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Reference-quality Jaro-Winkler used inside the Arrow batch."""
    j = _jaro(s, t)
    if j <= 0.7:
        return j
    prefix = 0
    for a, b in zip(s[:max_prefix], t[:max_prefix]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def levenshtein_ratio_py(s: str, t: str) -> float:
    """Banded-free numpy DP Levenshtein similarity ratio (tests + short strings)."""
    if s == t:
        return 1.0
    ls, lt = len(s), len(t)
    if ls == 0 or lt == 0:
        return 0.0
    sa = np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8)
    ta = np.frombuffer(t.encode("utf-8", "replace"), dtype=np.uint8)
    prev = np.arange(len(ta) + 1, dtype=np.int32)
    idx = np.arange(len(ta) + 1, dtype=np.int32)
    for i, ch in enumerate(sa, 1):
        cur = np.empty_like(prev)
        cur[0] = i
        sub = prev[:-1] + (ta != ch)
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        # insertion chain cur[j] = min(cur[j], cur[j-1]+1) vectorized:
        # cur[j] = j + min_{i<=j}(cur[i] - i)
        cur = idx + np.minimum.accumulate(cur - idx)
        prev = cur
    dist = int(prev[-1])
    return 1.0 - dist / max(len(sa), len(ta))


SCORE_SCHEMA = T.StructType(
    [
        T.StructField("jaccard", T.DoubleType(), False),
        T.StructField("jw", T.DoubleType(), False),
    ]
)


def make_score_udf(k: int = 3, jaccard_gate: float = JACCARD_GATE, jaccard_accept: float = JACCARD_ACCEPT):
    """pandas UDF (doc_a, doc_b) -> struct(jaccard, jw).

    JW is only computed in the ambiguous band [gate, accept); outside it
    the Jaccard verdict stands and jw is reported as 0/1 sentinel-free
    (-1.0 means "not computed").
    """

    @F.pandas_udf(SCORE_SCHEMA)
    def score(doc_a: pd.Series, doc_b: pd.Series) -> pd.DataFrame:
        a_sets = doc_a.map(lambda x: _shingle_set(x, k))
        b_sets = doc_b.map(lambda x: _shingle_set(x, k))
        inter = np.fromiter(
            (len(a & b) for a, b in zip(a_sets, b_sets)), dtype=np.float64, count=len(a_sets)
        )
        union = np.fromiter(
            (len(a | b) for a, b in zip(a_sets, b_sets)), dtype=np.float64, count=len(a_sets)
        )
        jac = np.divide(inter, union, out=np.zeros_like(inter), where=union > 0)
        jw = np.full(len(jac), -1.0)
        ambiguous = np.flatnonzero((jac >= jaccard_gate) & (jac < jaccard_accept))
        for i in ambiguous:
            jw[i] = jaro_winkler_py(doc_a.iat[i], doc_b.iat[i])
        return pd.DataFrame({"jaccard": jac, "jw": jw})

    return score


def score_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "conv_id",
    doc_col: str = "doc",
    min_len_ratio: float = MIN_LEN_RATIO,
) -> DataFrame:
    """Attach similarity scores to candidate pairs.

    pairs: (id_a, id_b); docs: (id_col, doc_col, doc_len).
    Returns (id_a, id_b, jaccard, jw, is_dup).
    """
    d = docs.select(
        F.col(id_col).alias("_id"), F.col(doc_col).alias("_doc"), F.col("doc_len").alias("_len")
    )
    joined = (
        pairs.join(d.withColumnRenamed("_id", "id_a").withColumnRenamed("_doc", "doc_a").withColumnRenamed("_len", "len_a"), "id_a")
        .join(d.withColumnRenamed("_id", "id_b").withColumnRenamed("_doc", "doc_b").withColumnRenamed("_len", "len_b"), "id_b")
    )
    # cheap predicate first — the blocks_cmp length check, JVM-side
    banded = joined.where(
        F.least("len_a", "len_b") >= (F.greatest("len_a", "len_b") * F.lit(min_len_ratio))
    )
    score = make_score_udf()
    scored = banded.withColumn("s", score("doc_a", "doc_b")).select(
        "id_a",
        "id_b",
        F.col("s.jaccard").alias("jaccard"),
        F.col("s.jw").alias("jw"),
    )
    return scored.withColumn(
        "is_dup",
        (F.col("jaccard") >= JACCARD_ACCEPT)
        | ((F.col("jaccard") >= JACCARD_GATE) & (F.col("jw") >= JW_ACCEPT)),
    )
