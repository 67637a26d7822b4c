"""MinHash/LSH blocking keys over normalized-text shingles.

Reference analog: CDC/sliding-block chunking + the md5->bucket blocking
index (/root/reference/src/deduplication.cpp:1044-1348, 723-736). The
reference samples content-defined boundaries with a rolling hash; at
turn/document granularity the equivalent locality-sensitive signature is
MinHash over token k-shingles, banded into LSH keys — each band key is a
"hash bucket" exactly like the reference's md5 index bucket, and bucket
collisions are the candidate lists.

Layout of work:
- shingle hashing is **JVM-side**: split -> sliding k-gram -> xxhash64,
  all whole-stage-codegen'd; Python never sees the text.
- the signature is an Arrow-batched pandas UDF over the array<long> of
  shingle hashes, vectorized across the *entire batch* with
  ``np.minimum.reduceat`` (no per-row Python loop).

Determinism: permutation parameters derive from a fixed seed via
numpy Philox, so signatures are identical across runs, partitionings and
cluster sizes (SURVEY.md §7 determinism requirement).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_NUM_PERM = 128
DEFAULT_BANDS = 32  # 32 bands x 4 rows: s-curve threshold ~ (1/32)^(1/4) ~ 0.42
DEFAULT_SEED = 42


def shingle_hashes(doc: Column | str, k: int = 3) -> Column:
    """array<long> of hashes of token k-shingles — pure JVM exprs, O(T).

    Each token is xxhash64'd once, then the k consecutive token hashes of
    a shingle are folded with chained two-arg xxhash64 via ``zip_with``
    over shifted slices. The layout matters: a higher-order function's
    *input arrays* (the slices) are evaluated once per row, while
    expressions inside the lambda re-evaluate per element — the previous
    form (``slice(toks, i+1, k)`` + ``concat_ws`` inside a ``transform``
    lambda) re-ran the whole ``split(doc)`` subtree for every shingle
    position, O(T^2) string work per row and a measured 7.5x slowdown of
    the MinHash stage at 346k turns. Here the lambda bodies are O(1)
    arithmetic on lambda variables only.

    For docs with < k tokens the whole doc is the single shingle, so no
    row produces an empty array.
    """
    c = F.col(doc) if isinstance(doc, str) else doc
    toks = F.split(c, " ")
    th = F.transform(toks, lambda t: F.xxhash64(t))
    return _shingles_from_th(th, c, k)


def _shingles_from_th(th: Column, doc: Column, k: int) -> Column:
    """Fold a token-hash array into k-shingle hashes.

    ``th`` is referenced ~k+2 times (size + k shifted slices); when it
    is an inline transform expression each reference re-runs the
    tokenize+hash transform per row. Binding it as a real column first
    trades those recomputes for one array materialization — 1.8x faster
    on an isolated shingle scan of sf0.1 documents, but NEUTRAL inside
    the full pipeline at both local[4]x520k turns (121.9s inline vs
    118.5s bound) and local[32]x70k (18.4 vs 18.7): the signature UDF
    and candidate join dominate, and the materialization costs DRAM
    bandwidth the recompute does not. ``with_minhash_bands`` exposes
    ``bind_token_hashes`` (default off) for compute-bound deployments."""
    n = F.size(th)
    m = n - F.lit(k - 1)  # shingle count when n >= k
    folded = F.slice(th, 1, m)
    for j in range(1, k):
        folded = F.zip_with(folded, F.slice(th, j + 1, m), lambda a, b: F.xxhash64(a, b))
    return F.when(n >= k, folded).otherwise(F.array(F.xxhash64(doc)))


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.Philox(key=seed))
    # odd multipliers: a*h+b mod 2^64 (natural uint64 wrap-around) is a
    # bijection on uint64 with well-mixed HIGH bits — exactly the bits
    # that decide a minimum — so the family is min-wise independent
    # enough for LSH banding. Dropping the % (2^61-1) reduction was a
    # measured 3.3x saving on the signature UDF's inner matrix op;
    # recall-vs-exact-Jaccard is property-tested (test_minhash_fast).
    a = rng.integers(1, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64)
    return a, b


def make_minhash_udf(num_perm: int = DEFAULT_NUM_PERM, seed: int = DEFAULT_SEED):
    """pandas UDF: array<long> shingle hashes -> array<long> signature.

    Vectorized across the batch: all rows' shingles are concatenated once,
    permuted in chunks, and per-row minima taken with minimum.reduceat.
    """
    a_params, b_params = _perm_params(num_perm, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_sig(shingles: pd.Series) -> pd.Series:
        lens = shingles.map(len).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.Series([[0] * num_perm] * len(shingles))
        # reduceat mishandles empty segments (offsets[i] == offsets[i+1]
        # returns a[offsets[i]], a trailing empty segment is an index
        # error), so compute on the non-empty rows and scatter back —
        # empty rows get the same all-zero sentinel as the empty batch.
        # Which rows are empty must not depend on Arrow batch boundaries.
        nonempty = lens > 0
        lens_ne = lens[nonempty]
        flat = np.concatenate(
            [np.asarray(s, dtype=np.int64) for s in shingles if len(s) > 0]
        ).astype(np.uint64)
        offsets = np.zeros(len(lens_ne), dtype=np.int64)
        np.cumsum(lens_ne[:-1], out=offsets[1:])
        out_ne = np.empty((len(lens_ne), num_perm), dtype=np.uint64)
        # chunk permutations to bound the (n_shingles x chunk) temp matrix
        chunk = max(1, min(num_perm, (64 << 20) // max(1, flat.size * 8)))
        for lo in range(0, num_perm, chunk):
            hi = min(num_perm, lo + chunk)
            # (M, c) = a*h + b mod 2^64 — deterministic odd-multiplier
            # permutation family, no division (see _perm_params)
            m = flat[:, None] * a_params[None, lo:hi] + b_params[None, lo:hi]
            out_ne[:, lo:hi] = np.minimum.reduceat(m, offsets, axis=0)
        out = np.zeros((len(lens), num_perm), dtype=np.uint64)
        out[nonempty] = out_ne
        signed = out.astype(np.int64)
        return pd.Series(list(signed))

    return minhash_sig


def band_keys(sig: Column | str, bands: int = DEFAULT_BANDS, num_perm: int = DEFAULT_NUM_PERM) -> Column:
    """array<string> LSH band keys from a signature — JVM-side.

    Key = "b<i>:" + xxhash64 over the band's r signature longs plus the
    band index, so keys from different bands never collide (the
    reference's per-bucket discrimination,
    /root/reference/src/HashDB.cpp:355-368). Hashing the longs directly
    (multi-column xxhash64 + element_at) keeps the whole expression in
    codegen — the earlier slice/transform/concat_ws form was an
    interpreted higher-order-function tree and measured several times
    slower at 5k docs x 32 bands.
    """
    c = F.col(sig) if isinstance(sig, str) else sig
    if num_perm % bands != 0 or bands > num_perm:
        # bands > num_perm gives r=0 (every doc shares every key — the
        # stop band then drops ALL candidates with no error); a
        # non-divisible split silently ignores the tail of the
        # signature, changing the s-curve from what the config implies
        raise ValueError(
            f"num_perm ({num_perm}) must be a positive multiple of bands ({bands})"
        )
    r = num_perm // bands
    return F.array(
        *[
            F.concat(
                F.lit(f"b{i}:"),
                F.xxhash64(
                    *[F.element_at(c, i * r + j + 1) for j in range(r)], F.lit(i)
                ).cast("string"),
            )
            for i in range(bands)
        ]
    )


def with_minhash_bands(
    docs: DataFrame,
    doc_col: str = "doc",
    k: int = 3,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    seed: int = DEFAULT_SEED,
    keep_shingles: bool = False,
    bind_token_hashes: bool = False,
) -> DataFrame:
    """docs + ``bands`` column (array<string> of LSH keys).

    ``keep_shingles=True`` additionally keeps ``sh`` — the distinct
    shingle-hash array — so downstream pair scoring (the same shingle
    family, scoring.shingle_array) reuses the one computation instead of
    re-deriving it per join side. Costs ~O(doc tokens)*8 bytes per cached
    row; the pipeline opts in because its docs table is persisted anyway.
    """
    sig_udf = make_minhash_udf(num_perm=num_perm, seed=seed)
    c = F.col(doc_col) if isinstance(doc_col, str) else doc_col
    if bind_token_hashes:
        # token-hash array bound as a real column BEFORE the shingle
        # fold: trades ~k+1 recomputes for one array materialization
        # (write+read between projections) — a win when compute-bound,
        # neutral-to-negative when memory-bandwidth-bound (A/B in
        # _shingles_from_th's docstring); default off.
        out = docs.withColumn(
            "_th", F.transform(F.split(c, " "), lambda t: F.xxhash64(t))
        ).withColumn("_shingles", _shingles_from_th(F.col("_th"), c, k))
    else:
        out = docs.withColumn("_shingles", shingle_hashes(c, k=k))
    out = out.withColumn("_sig", sig_udf("_shingles")).withColumn(
        "bands", band_keys("_sig", bands=bands, num_perm=num_perm)
    )
    if keep_shingles:
        out = out.withColumn("sh", F.array_distinct("_shingles"))
    return out.drop("_th", "_shingles", "_sig")


def minhash_signature_py(tokens: list[str], k: int = 3, num_perm: int = DEFAULT_NUM_PERM, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Pure-python/numpy reference implementation for tests (no Spark).

    NOTE: uses python's xxhash-free path — tests compare *pipeline*
    signatures for determinism/similarity properties, not this exact
    value, because shingle hashing lives JVM-side (xxhash64).
    """
    a, b = _perm_params(num_perm, seed)
    if len(tokens) >= k:
        shingles = {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}
    else:
        shingles = {" ".join(tokens)}
    hs = np.array([np.uint64(hash(s) & 0xFFFFFFFFFFFFFFFF) for s in shingles], dtype=np.uint64)
    m = hs[:, None] * a[None, :] + b[None, :]
    return m.min(axis=0).astype(np.int64)
