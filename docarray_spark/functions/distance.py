"""Distance kernels.

Two tiers, mirroring the reference's dispatch
(``/root/reference/docarray/math/distance/__init__.py:23-121``):

* **numpy kernels** (``cosine``/``sqeuclidean``/``euclidean``,
  ``math/distance/numpy.py:9,27,83``) — used inside Arrow-batched
  ``mapInPandas`` by the match operator; BLAS matrix-matrix products, the
  fast path for bulk kNN.
* **Column expressions** — pure Catalyst higher-order functions
  (``zip_with`` + ``aggregate``), JVM-side, for per-pair distances inside
  joins (e.g. embedding near-dup joins) where no batching is possible.

The reference's cosine adds an ``eps`` jitter to numerator and denominator
(``numpy.py:9-24``); pass ``eps=0.0`` for the mathematically plain cosine
distance (what SQL oracles compute).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


# ------------------------------------------------------------ numpy kernels

def cosine(x: np.ndarray, y: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    return 1 - np.clip(
        (np.dot(x, y.T) + eps)
        / (np.outer(np.linalg.norm(x, axis=1), np.linalg.norm(y, axis=1)) + eps),
        -1,
        1,
    )


def sqeuclidean(x: np.ndarray, y: np.ndarray, eps: float = 0.0) -> np.ndarray:
    # clamp at 0: the expansion can go ~-1e-14 for identical vectors, and a
    # negative zero after rounding would break bitwise comparison vs oracles
    return np.maximum(
        np.sum(y**2, axis=1)
        + np.sum(x**2, axis=1)[:, np.newaxis]
        - 2 * np.dot(x, y.T),
        0.0,
    )


def euclidean(x: np.ndarray, y: np.ndarray, eps: float = 0.0) -> np.ndarray:
    return np.sqrt(sqeuclidean(x, y))


def cityblock(x: np.ndarray, y: np.ndarray, eps: float = 0.0) -> np.ndarray:
    return np.abs(x[:, None, :] - y[None, :, :]).sum(axis=-1)


def chebyshev(x: np.ndarray, y: np.ndarray, eps: float = 0.0) -> np.ndarray:
    return np.abs(x[:, None, :] - y[None, :, :]).max(axis=-1)


def inner_product(x: np.ndarray, y: np.ndarray, eps: float = 0.0) -> np.ndarray:
    """Negative inner product (smaller = more similar), max-IP search."""
    return -np.dot(x, y.T)


DISTANCE_KERNELS: dict[str, Callable] = {
    "cosine": cosine,
    "sqeuclidean": sqeuclidean,
    "euclidean": euclidean,
    "cityblock": cityblock,
    "manhattan": cityblock,
    "chebyshev": chebyshev,
    "inner_product": inner_product,
}


def resolve_metric(metric) -> Callable:
    """'cosine'/'sqeuclidean'/'euclidean' → builtin kernel; any other string →
    scipy cdist passthrough (``array/mixins/match.py:33-38``); a callable is
    used as-is (custom-metric surface, ``array/mixins/find.py:93``)."""
    if callable(metric):
        return metric
    if metric in DISTANCE_KERNELS:
        return DISTANCE_KERNELS[metric]

    def _scipy(x, y, eps=0.0, _m=metric):
        try:
            from scipy.spatial.distance import cdist
        except ImportError as e:
            raise ValueError(
                f"metric {_m!r} is not a builtin kernel ({sorted(DISTANCE_KERNELS)}) "
                "and scipy is not installed for cdist passthrough"
            ) from e
        return cdist(x, y, metric=_m)

    return _scipy


# ------------------------------------------------------- Column expressions

def rounded_rank_key(col: Column | str, round_to: int | None) -> Column:
    """Ranking key for scores that come out of a SHUFFLE-SUMMED aggregate
    (BM25 term sums, sparse dots): rank on the ROUNDED score when the
    operator rounds for output, so two rows tied at ``round_to`` decimals
    — whose raw sums differ only in aggregation-order ulps — break on the
    explicit id tie-break instead of a per-run artifact (the r5 PQ / r9
    BM25 lesson). Per-row fold/kernel scores (match, ADC) don't need
    this: their evaluation order is fixed per row."""
    return F.round(col, round_to) if round_to is not None else (
        F.col(col) if isinstance(col, str) else col
    )


def dot_col(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_col(a: Column | str) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_distance_col(a: Column | str, b: Column | str) -> Column:
    """Plain cosine distance (eps=0) as a JVM-side expression."""
    return 1 - dot_col(a, b) / (l2_norm_col(a) * l2_norm_col(b))


def sqeuclidean_distance_col(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean_distance_col(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(sqeuclidean_distance_col(a, b))
