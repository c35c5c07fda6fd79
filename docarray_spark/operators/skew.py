"""Skew-mitigation utilities.

AQE's skew-join handling (enabled in ``session.py``) covers sort-merge
joins at runtime, but two shapes still need explicit salting at 100 TB:

* **hot-key aggregation** — a ``groupBy(key)`` where one key holds a large
  share of all rows (e.g. dedup fingerprints of boilerplate documents, the
  empty-text fingerprint). ``salted_agg`` runs a two-phase aggregate:
  partial per (key, salt) then final per key; associative aggregates lose
  nothing and the widest partition shrinks by the salt factor.

* **hot-key join against a non-broadcastable side** — ``salted_join``
  replicates the right side per salt value so the hot left keys spread over
  ``n_salts`` partitions. Replication factor is the price; use only for
  keys AQE reports as skewed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, n_salts): hash of the whole row's
    partition-local position is NOT reproducible, so salt from a hash of
    all columns (cheap, JVM-side, stable across retries)."""
    return df.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {'sum', 'count', 'min', 'max'} (the associative set — two-phase safe).

    Phase 1 groups by (keys…, salt) — the hot key's rows split across
    ``n_salts`` reducers; phase 2 merges the ≤ n_salts partials per key.
    """
    _MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for fn in (fn for _, fn in aggs.values()):
        if fn not in _MERGE:
            raise ValueError(f"{fn!r} is not two-phase safe (use sum/count/min/max)")
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[getattr(F, fn)(col).alias(out) for out, (col, fn) in aggs.items()]
    )
    final = partial.groupBy(*keys).agg(
        *[getattr(F, _MERGE[fn])(out).alias(out) for out, (_c, fn) in aggs.items()]
    )
    return final


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: left rows get a salt, the right side is
    replicated once per salt value (explode of a literal range — a narrow
    op, no shuffle of right beyond the join's own), and the join key
    becomes (on…, salt). Output rows match a plain ``left.join(right, on,
    how)`` for ``how`` in {'inner', 'left', 'left_semi', 'left_anti'} ONLY
    — replicating the right side would surface unmatched right rows
    ``n_salts`` times under right/full outer joins (ADVICE r1), so those
    raise."""
    allowed = {"inner", "left", "left_outer", "left_semi", "semi", "left_anti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)}; {how!r} would "
            f"duplicate unmatched right rows {n_salts}x (replicated right side)"
        )
    ls = with_salt(left, n_salts)
    rs = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = ls.join(rs, [*on, "_salt"], how)
    return out.drop("_salt")
