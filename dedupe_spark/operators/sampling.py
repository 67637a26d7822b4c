"""Deterministic hash-based sampling for corpus mixture construction.

Training-data pipelines need REPRODUCIBLE subsampling — per-stratum
rates (by language / source / quality band) that give the same sample
on every run and on every cluster size, unlike `df.sample()` whose
output depends on partitioning. The standard trick (public: Kandpal et
al. dedup studies, the C4 split methodology) is to hash a stable key
and keep rows whose hash falls under the rate threshold. The
reference's analog is its bucket assignment — hash(fp) % buckets
(/root/reference/src/HashDB.cpp:339-380) — reused here as a Bernoulli
gate instead of a placement key.

Two hash families, same semantics:

- `hash_sample` / `stratified_sample`: md5-prefix threshold. The first
  8 hex chars of md5(key) are uniform in [0, 16^8); lowercase-hex
  strings order lexicographically exactly like the numbers they encode
  (0-9 < a-f in ASCII), so `substr(md5(k),1,8) < hex(rate * 16^8)` is a
  pure string comparison any engine evaluates identically — the oracle
  path.
- `hash_sample_fast`: xxhash64 modulo gate — one 64-bit hash per row
  instead of md5's digest, the family the production pipeline already
  uses for MinHash/bloom. Not ANSI-SQL-expressible; property-tested.

Scale shape: both are a single codegen'd filter — no shuffle, no
Python, prunes at scan speed. Sampling 1% of 100 TB reads 100 TB but
writes 1 TB; the filter is as cheap as the scan allows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_SPACE = 16 ** 8  # first 8 md5 hex chars


def rate_threshold_hex(rate: float) -> str:
    """Zero-padded 8-char lowercase-hex threshold for a keep rate.

    Rate 1.0 returns "g" — lexicographically above every hex prefix —
    so the strict-< gate keeps ALL rows. Clamping to "ffffffff" instead
    would silently drop the ~2^-32 of keys whose md5 prefix is exactly
    that, making a rate-1.0 sample not the identity (~230 lost rows per
    10^12 at design scale)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(rate * HEX_SPACE), "08x")


def sample_gate_expr(key: Column, rate: float) -> Column:
    """Boolean keep/drop gate: md5-prefix(key) under the rate threshold."""
    return F.substring(F.md5(key), 1, 8) < F.lit(rate_threshold_hex(rate))


def hash_sample(df: DataFrame, key_col: str, rate: float, seed: str = "") -> DataFrame:
    """Keep a deterministic ~`rate` fraction of rows, keyed on `key_col`.

    `seed` salts the hash so independent samples of the same table are
    uncorrelated; the same (key, seed) always lands on the same side.
    """
    key = F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")) if seed else F.col(
        key_col
    ).cast("string")
    return df.where(sample_gate_expr(key, rate))


def stratified_sample(
    df: DataFrame, key_col: str, stratum_col: str, rates: dict[str, float],
    default_rate: float = 0.0, seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum -> keep rate.

    Strata absent from `rates` use `default_rate`. The gate threshold is
    a per-row CASE over literal hex strings — still one codegen'd
    filter, no join against a rates table needed (rates dicts are tiny
    and known at plan time).
    """
    thr = None
    for value, rate in sorted(rates.items()):
        cond = F.col(stratum_col) == F.lit(value)
        lit = F.lit(rate_threshold_hex(rate))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = F.lit(rate_threshold_hex(default_rate)) if thr is None else thr.otherwise(
        F.lit(rate_threshold_hex(default_rate))
    )
    key = F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")) if seed else F.col(
        key_col
    ).cast("string")
    return df.where(F.substring(F.md5(key), 1, 8) < thr)


def hash_sample_fast(
    df: DataFrame, key_col: str, rate: float, seed: int = 0, resolution: int = 1 << 20
) -> DataFrame:
    """xxhash64 modulo gate — the production-hash-family variant.

    `pmod(xxhash64(key, seed), resolution) < rate * resolution`: one
    64-bit hash instead of an md5 digest + substring. Keep-set overlap
    across different rates is nested (rate 0.1 sample is a subset of the
    rate 0.5 sample at the same seed), which mixture sweeps rely on.
    """
    gate = F.pmod(F.xxhash64(F.col(key_col).cast("string"), F.lit(seed)), F.lit(resolution))
    return df.where(gate < F.lit(int(rate * resolution)))
