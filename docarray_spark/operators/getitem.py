"""Unified ``getitem`` — the reference's advanced-indexing dispatch
(``array/mixins/getitem.py:48-107``): ONE entry point that routes on what
the selector IS, the access twin of :func:`operators.find.find`:

* int (incl. numpy ints, negatives)    → single doc by offset
* ``'@path'`` string                   → traversal (``traverse_flat``)
* other string                         → single doc by id
* ``slice``                            → offset slice (negatives resolved)
* ``Ellipsis``                         → flatten
* list/ndarray of bool                 → boolean-mask selection
* list/ndarray of int                  → positional multi-get (requested
                                         order, duplicates preserved)
* list of str                          → id multi-get
* ``(selector, attr)`` / ``(selector, [attrs...])``
                                       → recurse, then attribute projection
                                         (incl. the reference's two-ids-vs-
                                         attribute ambiguity rule)

Every branch returns a DataFrame (a "Document" is a 1-row frame in the
columnar model) and delegates to the existing operator — this adds
dispatch, not a new execution surface. Offset-based selectors need the
order index; if ``offset_col`` is absent it is derived deterministically
from ``id_col`` (the engine's ``offset2ids``), matching the reference's
insertion-order contract only when ids encode that order — callers with a
real order column should pass it.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docarray_spark.operators.indexing import (
    get_by_bool_mask,
    get_by_ids,
    get_by_positions,
    select_attrs,
    slice_by_offset,
    with_row_offset,
)
from docarray_spark.operators.traverse import flatten, traverse


def _with_offset(df: DataFrame, id_col: str, offset_col: str) -> DataFrame:
    if offset_col in df.columns:
        return df
    return with_row_offset(df, order_by=[id_col], offset_col=offset_col)


def _n_rows(df: DataFrame) -> int:
    # bounded action: only negative offsets / negative slice bounds need
    # the total count, mirroring python list semantics
    return df.count()


def getitem(
    df: DataFrame,
    selector: Any,
    id_col: str = "id",
    offset_col: str = "offset",
    **kwargs: Any,
) -> DataFrame:
    """Route ``selector`` to the matching indexing operator (the
    reference's ``__getitem__`` dispatch table, one function). Extra
    kwargs flow to ``traverse`` for ``'@path'`` selectors."""
    # ---- numpy scalars / arrays normalize first (reference squeezes)
    if isinstance(selector, np.ndarray):
        sq = selector.squeeze()
        if sq.ndim != 1 and sq.ndim != 0:
            raise IndexError(
                f"ndarray selector must be 1-d after squeeze, got ndim={sq.ndim}"
            )
        selector = sq.tolist() if sq.ndim == 1 else sq.item()
    if isinstance(selector, np.generic):
        selector = selector.item()

    if isinstance(selector, bool):
        raise IndexError("a bare bool is not a selector (use a bool list/mask)")
    if isinstance(selector, int):
        off = _with_offset(df, id_col, offset_col)
        if selector < 0:
            selector += _n_rows(df)
        return off.filter(F.col(offset_col) == selector)
    if isinstance(selector, str):
        if selector.startswith("@"):
            return traverse(df, selector[1:], id_col=id_col, **kwargs)
        return df.filter(F.col(id_col) == selector)
    if isinstance(selector, slice):
        start, stop, step = selector.start, selector.stop, selector.step or 1
        if step < 0:
            raise IndexError("negative slice steps are not supported")
        if (start is not None and start < 0) or (stop is not None and stop < 0):
            n = _n_rows(df)
            start = None if start is None else max(0, start + n if start < 0 else start)
            stop = None if stop is None else max(0, stop + n if stop < 0 else stop)
        return slice_by_offset(
            _with_offset(df, id_col, offset_col),
            start, stop, step, offset_col=offset_col,
        )
    if selector is Ellipsis:
        return flatten(df, id_col=id_col)
    if isinstance(selector, tuple) and len(selector) == 2 and _is_attr_tuple(selector):
        sel, attrs = selector
        if isinstance(sel, str) and isinstance(attrs, str):
            # the reference's ambiguity rule (getitem.py:76-84): a second
            # STRING is an id when the array contains it, else an attribute
            if df.filter(F.col(id_col) == attrs).limit(1).count() > 0:
                return get_by_ids(df, [sel, attrs], id_col=id_col)
            return select_attrs(getitem(df, sel, id_col, offset_col), [attrs])
        if isinstance(attrs, str):
            attrs = [attrs]
        return select_attrs(getitem(df, sel, id_col, offset_col), list(attrs))
    if isinstance(selector, Sequence):
        if not selector:
            return df.limit(0)
        head = selector[0]
        if isinstance(head, (bool, np.bool_)):
            return get_by_bool_mask(
                _with_offset(df, id_col, offset_col),
                [bool(b) for b in selector], offset_col=offset_col,
            )
        if isinstance(head, (int, np.integer)):
            return get_by_positions(
                _with_offset(df, id_col, offset_col),
                [int(p) for p in selector], offset_col=offset_col,
            )
        if isinstance(head, str):
            return get_by_ids(df, list(selector), id_col=id_col)
    raise IndexError(
        f"unsupported selector type {type(selector).__name__}: {selector!r}"
    )


def _is_attr_tuple(t: tuple) -> bool:
    sel, attrs = t
    sel_ok = (
        sel is Ellipsis
        or isinstance(sel, (slice, str, int, np.integer))
        or (isinstance(sel, (Sequence, np.ndarray)) and not isinstance(sel, str))
    )
    attrs_ok = isinstance(attrs, str) or (
        isinstance(attrs, Sequence)
        and bool(attrs)
        and all(isinstance(a, str) for a in attrs)
    )
    return sel_ok and attrs_ok
