"""Deterministic column-hash helpers with a pluggable hash function.

Two methods, one contract (a uniform integer from a string column,
reproducible across runs/partitionings/engines):

* ``'md5'`` (default) — hex-prefix ``conv`` trick. DuckDB computes the
  identical value (``md5`` is standardized), so every oracle-gated entry
  uses it: the hash IS part of the gated semantics.
* ``'xxhash64'`` — Spark's JVM intrinsic (the same xxHash64 the engine
  uses internally for shuffle partitioning), measured ~3× cheaper than
  md5+substring+conv per value (NOTES r4). NOT portable to the DuckDB
  oracle, so it is the PRODUCTION option for the hot hashing paths
  (minhash bands, simhash token hashes, samplers) where the downstream
  contract is "uniform + deterministic", not "this exact value".

Both reduce into the same ranges, so operator parameters (bands, bits,
fractions) mean the same thing under either method.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_METHODS = ("md5", "xxhash64")

_U32 = 1 << 32


def _check(method: str) -> None:
    if method not in HASH_METHODS:
        raise ValueError(f"hash_method must be one of {HASH_METHODS}, got {method!r}")


def hash_u32_sql(expr: str, method: str = "md5") -> str:
    """SQL fragment: uniform integer in [0, 2^32) from a string expr."""
    _check(method)
    if method == "md5":
        return f"cast(conv(substring(md5({expr}), 1, 8), 16, 10) as bigint)"
    return f"pmod(xxhash64({expr}), {_U32})"


def hash_u32_col(c: Column, method: str = "md5") -> Column:
    """Column form of :func:`hash_u32_sql`."""
    _check(method)
    if method == "md5":
        return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")
    return F.pmod(F.xxhash64(c), F.lit(_U32))


def hash_bits_sql(expr: str, bits: int, method: str = "md5") -> str:
    """SQL fragment: uniform integer in [0, 2^bits), bits ≤ 60 (the md5
    path needs the base-16 conv to fit a signed BIGINT)."""
    _check(method)
    if bits > 60:
        raise ValueError(f"at most 60 hash bits (got {bits})")
    if method == "md5":
        # Take enough hex chars to cover `bits`, then reduce to exactly
        # [0, 2^bits).  The value is non-negative, so pmod by a power of
        # two keeps the low bits unchanged — callers that already consumed
        # only low bits (simhash) see identical values.
        hx = max(8, (bits + 3) // 4)
        raw = f"cast(conv(substring(md5({expr}), 1, {hx}), 16, 10) as bigint)"
        return raw if (4 * hx == bits) else f"pmod({raw}, {1 << bits})"
    return f"pmod(xxhash64({expr}), {1 << bits})"


def hash_unit_col(c: Column, method: str = "md5") -> Column:
    """Uniform double in [0, 1) from a string column."""
    return hash_u32_col(c, method).cast("double") / float(_U32)
