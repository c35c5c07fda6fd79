"""MongoDB-style filter query language → Catalyst ``Column`` compiler.

Re-expresses the reference's query-set layer —
``/root/reference/docarray/array/queryset/parser.py:34-98`` (dict →
lookup-tree) and ``.../queryset/lookup.py:39-224`` (tree evaluation) — as a
single compile step that emits a Spark ``Column`` boolean expression. Where
the reference interprets the lookup tree row-at-a-time in Python (~5 s over
1M docs per its benchmark), here Catalyst gets a declarative predicate:
pushdown / boolean simplification / whole-stage codegen are free.

Supported surface (parity with ``parser.py:10-32``):

* comparison: ``$eq $neq $gt $gte $lt $lte``
* membership: ``$in $nin``
* ``$regex`` (Java regex, via ``rlike``), ``$size``, ``$exists``
* combinators ``$and $or $not`` arbitrarily nested; implicit AND of sibling
  predicates (``{f: {'$gte': a, '$lte': b}}`` and multiple fields)
* dunder paths ``tags__x`` into map/struct columns or typed ``tags_x``
  columns (``lookup.py:36``, ``helper.py:59-99``)
* placeholder values ``{'text': {'$eq': '{tags__name}'}}`` — compare against
  another field of the same row (``lookup.py:59-64``)
* Django-style leaf keys ``field__gte``/``field__icontains``/... are also
  accepted (``lookup.py:68-105``)

Null semantics: the reference's interpreter evaluates a predicate over a
missing field to ``False`` (and ``$not`` of it to ``True``). SQL three-valued
logic agrees for positive predicates (NULL comparison filters the row) but
diverges under negation, so every leaf compiled inside a negation scope is
wrapped in ``coalesce(leaf, false)`` to reproduce two-valued behavior.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PLACEHOLDER = re.compile(r"^\{\s*(.+?)\s*\}$")

_COMPARISONS = {
    "$eq": lambda c, v: c == v,
    "$neq": lambda c, v: c != v,
    "$ne": lambda c, v: c != v,
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
}

# Django-style lookup suffixes (reference lookup.py:68-105); accepted both as
# `field__op` leaf keys and as a documented extension surface.
_SUFFIX_OPS = {
    "exact": lambda c, v: c == v,
    "neq": lambda c, v: c != v,
    "gt": lambda c, v: c > v,
    "gte": lambda c, v: c >= v,
    "lt": lambda c, v: c < v,
    "lte": lambda c, v: c <= v,
    "contains": lambda c, v: c.contains(v),
    "icontains": lambda c, v: F.lower(c).contains(str(v).lower()),
    "startswith": lambda c, v: c.startswith(v),
    "istartswith": lambda c, v: F.lower(c).startswith(str(v).lower()),
    "endswith": lambda c, v: c.endswith(v),
    "iendswith": lambda c, v: F.lower(c).endswith(str(v).lower()),
    "regex": lambda c, v: c.rlike(v),
    "in": lambda c, v: c.isin(list(v)),
    "nin": lambda c, v: ~c.isin(list(v)),
}


def resolve_field(df: DataFrame, path: str) -> tuple[Column, T.DataType | None]:
    """Resolve a (possibly dunder) field path to a Column.

    Resolution order (mirrors ``helper.py:59-99`` dunder_get, extended with
    the typed-tag-column convention of SURVEY.md §1.5):

    1. exact column name (``text``, ``tags_x``)
    2. dunder path whose flat join exists as a typed column
       (``tags__x`` → ``tags_x``)
    3. nested access: first segment is a column, remaining segments index
       into struct fields / map keys (``scores__cosine__value``)
    4. ``tags__k`` against a ``tags_json`` JSON-string column
       (FIXTURES.md dynamic-tags representation; SURVEY §7 milestone-2
       decision) — ``get_json_object`` extraction, numeric coercion then
       applies downstream via try_cast
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if path in fields:
        return F.col(path), fields[path]
    segs = path.split("__")
    flat = "_".join(segs)
    if flat in fields:
        return F.col(flat), fields[flat]
    if segs[0] not in fields and f"{segs[0]}_json" in fields and len(segs) > 1:
        return (
            F.get_json_object(F.col(f"{segs[0]}_json"), "$." + ".".join(segs[1:])),
            None,
        )
    if segs[0] in fields:
        col = F.col(segs[0])
        dtype: T.DataType | None = fields[segs[0]]
        for seg in segs[1:]:
            if isinstance(dtype, T.MapType):
                col = F.element_at(col, seg)
                dtype = dtype.valueType
            elif isinstance(dtype, T.StructType):
                col = col.getField(seg)
                dtype = dtype[seg].dataType
            else:
                col = col.getItem(seg)
                dtype = None
        return col, dtype
    raise ValueError(f"cannot resolve field path {path!r} in {sorted(fields)}")


def _exists_expr(col: Column, dtype: T.DataType | None) -> Column:
    """Default-aware non-emptiness (``data.py:65-90``, ``lookup.py:108-124``):
    NULL never exists; empty string / empty array / empty map / empty binary
    count as not-set."""
    if isinstance(dtype, T.StringType):
        return col.isNotNull() & (col != F.lit(""))
    if isinstance(dtype, (T.ArrayType, T.MapType)):
        return col.isNotNull() & (F.size(col) > 0)
    if isinstance(dtype, T.BinaryType):
        return col.isNotNull() & (F.length(col) > 0)
    return col.isNotNull()


def _size_expr(col: Column, dtype: T.DataType | None) -> Column:
    if isinstance(dtype, T.StringType):
        return F.length(col)
    return F.size(col)


def _rhs(df: DataFrame, value: Any) -> Any:
    """A string value of the form ``{field}`` compares against another column
    of the same row (placeholder semantics, ``lookup.py:59-64``)."""
    if isinstance(value, str):
        m = _PLACEHOLDER.match(value)
        if m:
            return resolve_field(df, m.group(1))[0]
    return value


_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _coerce_numeric(col: Column, dtype: T.DataType | None, v: Any) -> Column:
    """Dynamic-tags typing (SURVEY.md §7 hard part): the reference's tags
    hold floats/strings and its interpreter compares them as Python values
    (``test_filter.py:36-38``); a ``map<string,string>`` tags column must
    therefore compare NUMERICALLY when the literal is numeric. try_cast
    keeps unparseable values NULL (row filtered) instead of erroring under
    ANSI mode."""
    is_num = isinstance(v, (int, float)) and not isinstance(v, bool)
    if is_num and (dtype is None or isinstance(dtype, T.StringType)):
        return col.try_cast("double")
    return col


def _cmp_expr(op: str, col: Column, dtype: T.DataType | None, v: Any) -> Column:
    """One comparison with the reference interpreter's mixed-type semantics.

    A string literal against a numeric column cannot error (ANSI would):
    if it parses as a number, compare numerically; if not, the reference's
    Python semantics are 'mismatched types are never equal' — ``$eq``/
    ordering → False, ``$neq`` → True for every row where the field is set
    (``lookup.py:68-103``)."""
    if isinstance(v, str) and isinstance(dtype, _NUMERIC_TYPES):
        try:
            v = float(v)
        except ValueError:
            if op in ("$neq", "$ne"):
                return col.isNotNull()
            return F.lit(False)
    return _COMPARISONS[op](_coerce_numeric(col, dtype, v), v)


def _in_expr(col: Column, dtype: T.DataType | None, values) -> Column:
    """Membership with mixed-type literals. Against a numeric column,
    string elements participate only if they parse as numbers (an
    unparseable string can never equal a number — reference Python
    semantics); against a string/unknown column, any numeric element
    switches the compare to numeric (tags typing)."""
    vals = list(values)
    if isinstance(dtype, _NUMERIC_TYPES):
        kept = []
        for x in vals:
            if isinstance(x, str):
                try:
                    kept.append(float(x))
                except ValueError:
                    pass
            else:
                kept.append(x)
        if not kept:
            return F.lit(False)
        return col.isin(kept)
    if any(isinstance(x, (int, float)) and not isinstance(x, bool) for x in vals) and (
        dtype is None or isinstance(dtype, T.StringType)
    ):
        num = col.try_cast("double")
        nums = [x for x in vals if isinstance(x, (int, float)) and not isinstance(x, bool)]
        strs = [x for x in vals if isinstance(x, str)]
        expr = num.isin([float(x) for x in nums])
        if strs:
            expr = expr | col.isin(strs)
        return expr
    return col.isin(vals)


class _Compiler:
    def __init__(self, df: DataFrame):
        self.df = df

    def compile(self, conditions: dict, negated: bool = False) -> Column:
        if not isinstance(conditions, dict) or not conditions:
            raise ValueError(f"filter conditions must be a non-empty dict, got {conditions!r}")
        parts = [self._entry(k, v, negated) for k, v in conditions.items()]
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out

    def _entry(self, key: str, value: Any, negated: bool) -> Column:
        if key in ("$and", "$or"):
            # list form [{...}, {...}] or dict form {f1: spec, f2: spec}
            # (the reference accepts both, test_filter.py:57-79)
            if isinstance(value, dict) and value:
                value = [{k: v} for k, v in value.items()]
            if not isinstance(value, (list, tuple)) or not value:
                raise ValueError(f"{key} expects a non-empty list or dict")
            subs = [self.compile(v, negated) for v in value]
            out = subs[0]
            for s in subs[1:]:
                out = (out & s) if key == "$and" else (out | s)
            return out
        if key == "$not":
            return ~self.compile(value, negated=True)
        return self._field(key, value, negated)

    def _field(self, path: str, spec: Any, negated: bool) -> Column:
        # Django-style leaf: last dunder segment is an operator name.
        segs = path.split("__")
        if len(segs) > 1 and segs[-1] in _SUFFIX_OPS and not isinstance(spec, dict):
            try:
                col, _ = resolve_field(self.df, "__".join(segs[:-1]))
                return self._leaf(_SUFFIX_OPS[segs[-1]](col, _rhs(self.df, spec)), negated)
            except ValueError:
                pass  # the full path may itself be a real column (e.g. tags_in)
        col, dtype = resolve_field(self.df, path)
        if not isinstance(spec, dict):
            # bare value → $eq (parser.py:60-63)
            v = _rhs(self.df, spec)
            return self._leaf(_cmp_expr("$eq", col, dtype, v), negated)
        parts = []
        for op, raw in spec.items():
            v = _rhs(self.df, raw)
            if op in _COMPARISONS:
                parts.append(self._leaf(_cmp_expr(op, col, dtype, v), negated))
            elif op == "$in":
                parts.append(self._leaf(_in_expr(col, dtype, raw), negated))
            elif op == "$nin":
                # reference: True also when field is missing (two-valued NOT)
                parts.append(self._leaf(_in_expr(col, dtype, raw), not negated, invert=True))
            elif op == "$regex":
                parts.append(self._leaf(col.rlike(raw), negated))
            elif op == "$size":
                parts.append(self._leaf(_size_expr(col, dtype) == F.lit(raw), negated))
            elif op == "$exists":
                e = _exists_expr(col, dtype)
                parts.append(e if raw else ~e)
            else:
                raise ValueError(f"unsupported operator {op!r} for field {path!r}")
        out = parts[0]
        for p in parts[1:]:  # implicit AND of sibling ops (parser.py:64-98)
            out = out & p
        return out

    @staticmethod
    def _leaf(expr: Column, negated: bool, invert: bool = False) -> Column:
        # Inside a negation scope, NULL must behave as False *before* the NOT
        # flips it (two-valued logic of the reference interpreter).
        if negated or invert:
            expr = F.coalesce(expr, F.lit(False))
        return ~expr if invert else expr


def compile_filter(df: DataFrame, conditions: dict) -> Column:
    """Compile a Mongo-style condition dict into a boolean ``Column``."""
    return _Compiler(df).compile(conditions)


def find(df: DataFrame, conditions: dict | None = None, limit: int | None = None) -> DataFrame:
    """``DocumentArray.find(filter=...)`` analogue
    (``array/mixins/find.py:135-146,257-273``)."""
    out = df.filter(compile_filter(df, conditions)) if conditions else df
    if limit is not None:
        out = out.limit(limit)
    return out
