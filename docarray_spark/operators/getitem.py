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
from pyspark.sql import types as T

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


def setitem(
    df: DataFrame,
    selector: Any,
    value: Any,
    id_col: str = "id",
    offset_col: str = "offset",
) -> DataFrame:
    """The write twin of :func:`getitem` — the reference's ``__setitem__``
    dispatch (``array/mixins/setitem.py:61-244``), immutable-relational:
    returns the frame with the selected rows updated (Spark DataFrames
    don't mutate; persist the result or MERGE it into a store).

    ``value`` forms:

    * ``dict``            — field set applied uniformly to every selected
                            row (``da[sel] = doc`` with one document, or
                            ``da['@path'] = {...}``)
    * ``list[dict]``      — positional pairing with a list / slice / mask
                            selector (``da[[0, 2]] = [d1, d2]``)
    * scalar / list       — only with an ``(selector, attr)`` tuple:
                            ``da[sel, 'text'] = v`` (uniform) or
                            ``da[[i1, i2], 'text'] = [v1, v2]`` (paired)

    A ``dict``'s missing/None fields leave the original values (partial-
    document merge, the ``reduce.py`` left-priority rule). Unsupported
    reference forms raise IndexError rather than guessing (e.g. positional
    document lists after ``...`` flattening — a driver-side zip by
    construction)."""
    # ---- attribute-tuple forms first: da[sel, attr(s)] = value
    if isinstance(selector, tuple) and len(selector) == 2 and _is_attr_tuple(selector):
        sel, attrs = selector
        if isinstance(attrs, str):
            if isinstance(sel, str) and sel.startswith("@"):
                from docarray_spark.operators.traverse import set_along_path

                return set_along_path(df, sel[1:], id_col=id_col, **{attrs: value})
            if (
                isinstance(value, (list, tuple))
                and isinstance(sel, Sequence)
                and not isinstance(sel, str)
            ):
                # paired: one value per selected element
                return setitem(
                    df, sel, [{attrs: v} for v in value], id_col, offset_col
                )
            return setitem(df, sel, {attrs: value}, id_col, offset_col)
        # attrs is a list: da[sel, [a1, a2]] = [v1, v2] (per-attr values)
        if not isinstance(value, (list, tuple)) or len(value) != len(attrs):
            raise IndexError(
                f"setting {len(attrs)} attributes needs a value list of the "
                f"same length, got {value!r}"
            )
        return setitem(df, sel, dict(zip(attrs, value)), id_col, offset_col)

    # ---- '@path' with a uniform field dict
    if isinstance(selector, str) and selector.startswith("@"):
        if not isinstance(value, dict):
            raise IndexError(
                "da['@path'] = ... takes a field dict (positional document "
                "lists over a traversal are driver-side by construction)"
            )
        from docarray_spark.operators.traverse import set_along_path

        return set_along_path(df, selector[1:], id_col=id_col, **value)

    # ---- positional document lists: zip selector elements with values
    if (
        isinstance(value, (list, tuple))
        and value
        and all(isinstance(v, dict) for v in value)
    ):
        keys = _selector_keys(df, selector, id_col, offset_col)
        if len(keys[1]) != len(value):
            raise IndexError(
                f"selector selects {len(keys[1])} rows but value has "
                f"{len(value)} documents"
            )
        key_col, key_vals = keys
        from docarray_spark.operators.indexing import update_by_id

        spark = df.sparkSession
        fields = sorted({f for v in value for f in v})
        rows = [
            tuple([k] + [v.get(f) for f in fields]) for k, v in zip(key_vals, value)
        ]
        key_field = (
            df.schema[key_col]
            if key_col in df.columns
            else T.StructField(key_col, T.LongType())
        )
        upd_schema = T.StructType([key_field] + [df.schema[f] for f in fields])
        updates = spark.createDataFrame(rows, upd_schema)
        base = _with_offset(df, id_col, offset_col) if key_col == offset_col else df
        return update_by_id(base, updates, id_col=key_col)

    # ---- uniform field dict over any selection
    if isinstance(value, dict):
        from docarray_spark.operators.indexing import set_attrs_where

        base, cond = _selector_cond(df, selector, id_col, offset_col)
        return set_attrs_where(base, cond, **value)

    raise IndexError(
        f"unsupported setitem: selector {type(selector).__name__}, "
        f"value {type(value).__name__}"
    )


def _selector_keys(df: DataFrame, selector: Any, id_col: str, offset_col: str):
    """(key_col, ordered key list) for positional pairing selectors."""
    if isinstance(selector, np.ndarray):
        selector = selector.squeeze().tolist()
    if isinstance(selector, slice):
        start, stop, step = selector.start or 0, selector.stop, selector.step or 1
        if stop is None or start < 0 or stop < 0:
            n = _n_rows(df)
            start = start + n if start < 0 else start
            stop = n if stop is None else (stop + n if stop < 0 else stop)
        return offset_col, list(range(start, stop, step))
    if isinstance(selector, Sequence) and not isinstance(selector, str) and selector:
        head = selector[0]
        if isinstance(head, (bool, np.bool_)):
            return offset_col, [i for i, b in enumerate(selector) if b]
        if isinstance(head, (int, np.integer)):
            return offset_col, [int(p) for p in selector]
        if isinstance(head, str):
            return id_col, list(selector)
    if isinstance(selector, (int, np.integer)):
        n = int(selector)
        return offset_col, [n if n >= 0 else n + _n_rows(df)]
    if isinstance(selector, str):
        return id_col, [selector]
    raise IndexError(
        f"selector {selector!r} cannot pair positionally with a document list"
    )


def _selector_cond(df: DataFrame, selector: Any, id_col: str, offset_col: str):
    """(frame, row condition) for uniform setting over a selection."""
    if selector is Ellipsis:
        return df, F.lit(True)
    if isinstance(selector, np.ndarray):
        selector = selector.squeeze().tolist()
    if isinstance(selector, (int, np.integer)):
        n = int(selector)
        if n < 0:
            n += _n_rows(df)
        return _with_offset(df, id_col, offset_col), F.col(offset_col) == n
    if isinstance(selector, str):
        return df, F.col(id_col) == selector
    if isinstance(selector, slice):
        base = _with_offset(df, id_col, offset_col)
        start, stop, step = selector.start, selector.stop, selector.step or 1
        if (start is not None and start < 0) or (stop is not None and stop < 0):
            n = _n_rows(df)
            start = None if start is None else (start + n if start < 0 else start)
            stop = None if stop is None else (stop + n if stop < 0 else stop)
        c, cond = F.col(offset_col), F.lit(True)
        if start is not None:
            cond = cond & (c >= start)
        if stop is not None:
            cond = cond & (c < stop)
        if step != 1:
            cond = cond & ((c - (start or 0)) % step == 0)
        return base, cond
    if isinstance(selector, Sequence) and not isinstance(selector, str):
        if not selector:
            return df, F.lit(False)
        head = selector[0]
        if isinstance(head, (bool, np.bool_)):
            pos = [i for i, b in enumerate(selector) if b]
            return (
                _with_offset(df, id_col, offset_col),
                F.col(offset_col).isin(pos),
            )
        if isinstance(head, (int, np.integer)):
            return (
                _with_offset(df, id_col, offset_col),
                F.col(offset_col).isin([int(p) for p in selector]),
            )
        if isinstance(head, str):
            return df, F.col(id_col).isin(list(selector))
    raise IndexError(f"unsupported selector for setitem: {selector!r}")
