"""Explicit Bloom-filter pre-prune stage (reference I1/I2).

The reference fronts every disk index probe with a Bloom filter whose
negative lookups short-circuit the expensive path
(/root/reference/src/HashDB.cpp:372, 429-431), sized by the optimal
(m, k) solver (/root/reference/src/BloomFilter.cpp:36-83) and supporting
set algebra over equal-shaped filters (:161-198). This module is the
same operator, Spark-first:

  * **build** is a distributed aggregate: every key contributes its k
    bit positions (JVM-side ``xxhash64(key, j)`` — a seeded hash family,
    the reference's 128-salt hashAP, BloomFilter.cpp:334-375), positions
    fold into 64-bit words with a map-side-combined ``bit_or`` groupBy,
    and only the ~m/64 words reach the driver. Identical role to
    ``Dataset.stat.bloomFilter`` (a treeAggregate over the column) —
    PySpark 4 removed that binding and the JVM object's V2 wire format
    is private, so building via the public aggregate API keeps the probe
    side bit-for-bit reproducible from SQL expressions alone.
  * **probe** filters a DataFrame map-side — no shuffle: bit positions
    are computed by the same JVM expressions, and the only Python
    crossing is a vectorized numpy bitmap gather over Arrow batches
    (never per-row logic).
  * **no false negatives** by construction: build and probe evaluate
    the same deterministic expression family, so every inserted key
    probes positive; false positives at rate ``fpp`` merely pass a few
    extra rows to the exact stage (harmless for candidate generation).

Sizing: m = -n ln p / (ln 2)^2, k = max(1, round(m/n ln 2)) — the same
formula as the reference's computeOptPara and Spark's
``BloomFilter.optimalNumOfBits``.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import ceil, log

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def optimal_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """(num_bits, num_hash) for target capacity/false-positive rate."""
    n = max(1, expected_items)
    m = max(64, int(ceil(-n * log(fpp) / (log(2) ** 2))))
    k = max(1, int(round(m / n * log(2))))
    return m, k


def _positions(key: Column, num_bits: int, num_hash: int) -> list[Column]:
    """The k bit positions of ``key`` — pure JVM exprs (seeded xxhash64
    family), shared verbatim by build and probe."""
    return [
        F.pmod(F.xxhash64(key, F.lit(j)), F.lit(num_bits)) for j in range(num_hash)
    ]


@dataclass
class Bloom:
    num_bits: int
    num_hash: int
    words: np.ndarray  # uint64[ceil(num_bits/64)]
    n_items: int  # items inserted at build time (for metrics)

    # -- probe ---------------------------------------------------------
    def might_contain_udf(self, spark):
        """pandas UDF array<long> positions -> bool; the bitmap travels
        once per executor via an explicit broadcast."""
        bc = spark.sparkContext.broadcast(self.words)
        num_hash = self.num_hash

        @F.pandas_udf("boolean")
        def might_contain(pos: pd.Series) -> pd.Series:
            w = bc.value
            mat = np.array(list(pos), dtype=np.int64)  # (n, k)
            if mat.size == 0:
                return pd.Series(np.zeros(len(pos), dtype=bool))
            hits = (w[mat >> 6] >> (mat & 63).astype(np.uint64)) & np.uint64(1)
            return pd.Series(hits.sum(axis=1) == num_hash)

        return might_contain

    def flag(self, df: DataFrame, key: Column | str, col_name: str) -> DataFrame:
        """``df`` plus a boolean ``col_name``: might the key be in the
        filter? Map-side, no shuffle; lets callers split the definite
        negatives from the maybe-positives in one pass (the reference's
        negative-lookup short-circuit, HashDB.cpp:429-431)."""
        key = F.col(key) if isinstance(key, str) else key
        udf = self.might_contain_udf(df.sparkSession)
        pos = F.array(*_positions(key, self.num_bits, self.num_hash))
        return df.withColumn(col_name, udf(pos))

    def probe(self, df: DataFrame, key: Column | str) -> DataFrame:
        """Rows of ``df`` whose key might be in the filter — a map-side
        filter (scan -> project -> Arrow batch -> filter), no shuffle."""
        return self.flag(df, key, "_bf_hit").where("_bf_hit").drop("_bf_hit")

    # -- set algebra (reference BloomFilter.cpp:161-198) ---------------
    def _check_shape(self, other: "Bloom") -> None:
        if (self.num_bits, self.num_hash) != (other.num_bits, other.num_hash):
            raise ValueError("bloom set algebra requires equal-shaped filters")

    def union(self, other: "Bloom") -> "Bloom":
        self._check_shape(other)
        return Bloom(self.num_bits, self.num_hash, self.words | other.words,
                     self.n_items + other.n_items)

    def intersect(self, other: "Bloom") -> "Bloom":
        """Superset of the true intersection (standard BF semantics)."""
        self._check_shape(other)
        return Bloom(self.num_bits, self.num_hash, self.words & other.words,
                     min(self.n_items, other.n_items))

    @property
    def fill_ratio(self) -> float:
        bits = np.unpackbits(self.words.view(np.uint8))
        return int(bits.sum()) / self.num_bits


def build_bloom(
    df: DataFrame,
    key: Column | str,
    expected_items: int | None = None,
    fpp: float = 1e-4,
) -> Bloom:
    """Distributed build: explode each key into its k positions, fold to
    words with bit_or (map-side combine), collect ~m/64 words.

    ``expected_items`` defaults to a count of ``df`` (one extra job).
    This is an action — the filter materializes on the driver, exactly
    like the reference building its BF before the probe loop
    (src/deduplication.cpp:723-736).
    """
    key = F.col(key) if isinstance(key, str) else key
    n = expected_items if expected_items is not None else df.select(key).count()
    num_bits, num_hash = optimal_params(n, fpp)
    pos = F.explode(F.array(*_positions(key, num_bits, num_hash))).alias("pos")
    word_rows = (
        df.select(pos)
        .select(
            F.shiftright("pos", 6).alias("w"),
            # shiftleft's python binding wants a literal shift; the SQL
            # form accepts a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    words = np.zeros((num_bits + 63) // 64, dtype=np.uint64)
    for r in word_rows:
        words[int(r["w"])] = np.uint64(int(r["bits"]) & 0xFFFFFFFFFFFFFFFF)
    return Bloom(num_bits=num_bits, num_hash=num_hash, words=words, n_items=n)
