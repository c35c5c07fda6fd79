"""Advanced-indexing / projection / CRUD surface.

Re-expresses the reference's ``GetItemMixin``/``SetItemMixin``/``DelItemMixin``
(``/root/reference/docarray/array/mixins/getitem.py:48-107``,
``setitem.py:61-244``, ``delitem.py:19-78``) and the ``offset2ids`` order
index (``array/storage/base/getsetdel.py:50-85``) over a DataFrame with an
explicit ``offset`` column.

Scale notes:

* Offset predicates (`between`, `isin`, modulo-step) are plain comparisons on
  a sortable column — they push down to the parquet scan (min/max row-group
  pruning) instead of the reference's O(1)-per-row but driver-resident
  ``offset2ids`` list, which cannot exist at 100 TB.
* Point updates are expressed as either a ``CASE WHEN`` projection (no
  shuffle) or, for updates arriving as a table, a broadcast left join +
  per-field coalesce — the same plan a Delta ``MERGE`` compiles to.
* Dunder paths (``scores__cosine__value``) become nested field access, so
  Parquet schema pruning reads only the accessed sub-fields.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dunder_col(df: DataFrame, path: str) -> Column:
    """Resolve a dunder path ``a__b__c`` (reference ``helper.py:59-99``)
    against struct / map / typed columns: prefer the longest column name
    prefix present in the schema, then descend with ``getItem``."""
    if path in df.columns:
        return F.col(path)
    parts = path.split("__")
    for cut in range(len(parts) - 1, 0, -1):
        head = "__".join(parts[:cut])
        if head in df.columns:
            c = F.col(head)
            for p in parts[cut:]:
                c = c.getItem(p)
            return c
    # fall back to dotted access (nested struct path)
    return F.col(".".join(parts))


def select_attrs(df: DataFrame, attrs: Sequence[str], keep: Sequence[str] = ()) -> DataFrame:
    """Bulk attribute projection ``da[:, ('text','id')]``
    (``getattr.py:7-51``): dunder paths allowed, output column named by the
    full dunder path."""
    cols = [F.col(k) for k in keep]
    cols += [dunder_col(df, a).alias(a) for a in attrs]
    return df.select(*cols)


def slice_by_offset(
    df: DataFrame,
    start: int | None = None,
    stop: int | None = None,
    step: int = 1,
    offset_col: str = "offset",
) -> DataFrame:
    """``da[start:stop:step]`` (``getitem.py:48-107``) as range + modulo
    predicates on the order column — parquet row-group prunable."""
    c = F.col(offset_col)
    cond = F.lit(True)
    if start is not None:
        cond = cond & (c >= start)
    if stop is not None:
        cond = cond & (c < stop)
    if step != 1:
        cond = cond & ((c - (start or 0)) % step == 0)
    return df.filter(cond)


def get_by_offsets(df: DataFrame, offsets: Sequence[int], offset_col: str = "offset") -> DataFrame:
    """``da[[0, 2, 5]]`` — positional multi-get."""
    return df.filter(F.col(offset_col).isin(list(offsets)))


def get_by_ids(df: DataFrame, ids: Sequence[Any], id_col: str = "id") -> DataFrame:
    """``da[[id1, id2]]`` — id multi-get (semi-join semantics for big lists)."""
    if len(ids) <= 1000:
        return df.filter(F.col(id_col).isin(list(ids)))
    ids_df = df.sparkSession.createDataFrame([(i,) for i in ids], [id_col])
    return df.join(F.broadcast(ids_df), id_col, "left_semi")


def mask_filter(df: DataFrame, mask: Column) -> DataFrame:
    """Boolean-mask selection ``da[mask]`` — the mask is a Column predicate
    (a driver-side list of booleans does not exist at scale)."""
    return df.filter(mask)


def get_by_bool_mask(
    df: DataFrame, mask: Sequence[bool], offset_col: str = "offset"
) -> DataFrame:
    """Literal boolean-mask indexing ``da[[True, False, ...]]`` (reference
    ``getitem.py:48-107`` accepts bool lists / bool ndarrays): keep rows
    whose offset is a True position. Driver-side masks are inherently
    small-frame API parity — at scale use :func:`mask_filter` with a Column
    predicate. The mask must cover the frame (reference semantics: mask
    length == len(da)); extra False positions are harmless."""
    positions = [i for i, m in enumerate(mask) if m]
    return get_by_offsets(df, positions, offset_col=offset_col)


def get_by_positions(
    df: DataFrame, positions: Sequence[int], offset_col: str = "offset"
) -> DataFrame:
    """ndarray-style positional indexing ``da[np.array([5, 0, 5])]``
    (``getitem.py:48-107``): returns rows in the REQUESTED order, duplicates
    preserved — numpy fancy-indexing semantics, unlike
    :func:`get_by_offsets`'s set-filter. Positions join in as a broadcast
    table carrying their selection order."""
    spark = df.sparkSession
    from docarray_spark.functions.localexec import local_table

    pos_df = local_table(
        spark,
        [(int(p), i) for i, p in enumerate(positions)],
        f"{offset_col} long, _sel_order long",
    )
    return (
        df.join(F.broadcast(pos_df), offset_col)
        .orderBy("_sel_order")
        .drop("_sel_order")
    )


def set_attrs_where(df: DataFrame, cond: Column, **values: Column | Any) -> DataFrame:
    """Conditional bulk update (``setitem.py:61-244``): for rows matching
    ``cond``, set each column to the given value/Column; others unchanged.
    Pure projection — no shuffle."""
    updated = {}
    for name, v in values.items():
        v = v if isinstance(v, Column) else F.lit(v)
        updated[name] = F.when(cond, v).otherwise(F.col(name)).alias(name)
    return df.withColumns(updated)


def update_by_id(
    df: DataFrame,
    updates: DataFrame,
    id_col: str = "id",
    broadcast_updates: bool = True,
) -> DataFrame:
    """Merge point updates arriving as a table (``setitem`` by id /
    Delta-``MERGE``-shaped): left join on id, update columns take the
    incoming value when present (left-priority coalesce per field,
    mirroring ``reduce.py:7-16``). Updates are broadcast when small."""
    upd_cols = [c for c in updates.columns if c != id_col]
    right = F.broadcast(updates) if broadcast_updates else updates
    joined = df.alias("l").join(
        right.select(id_col, *[F.col(c).alias(f"_u_{c}") for c in upd_cols]).alias("r"),
        id_col,
        "left",
    )
    out = {c: F.coalesce(F.col(f"_u_{c}"), F.col(c)).alias(c) for c in upd_cols}
    return joined.withColumns(out).drop(*[f"_u_{c}" for c in upd_cols])


def pop_attrs(df: DataFrame, attrs: Sequence[str]) -> DataFrame:
    """``del da[:, 'attr']`` / ``Document.pop`` (``delitem.py:44-59``,
    ``base.py:87-99``): reset columns to NULL (the engine's 'default')."""
    return df.withColumns(
        {a: F.lit(None).cast(df.schema[a].dataType).alias(a) for a in attrs}
    )


def delete_where(df: DataFrame, cond: Column) -> DataFrame:
    """``del da[mask/filter]`` (``delitem.py:19-78``) — anti-filter."""
    return df.filter(~F.coalesce(cond, F.lit(False)))


def with_row_offset(df: DataFrame, order_by: Sequence[str], offset_col: str = "offset") -> DataFrame:
    """(Re)build the order index after ops that disturb it — the engine's
    ``offset2ids`` (``storage/base/helper.py``). Uses the two-phase
    distributed rank (``group.distributed_row_number``) — no
    single-partition window over the data."""
    from docarray_spark.operators.group import distributed_row_number

    out = distributed_row_number(
        df, [F.col(c) for c in order_by], out_col=offset_col
    )
    return out.withColumn(offset_col, F.col(offset_col) - 1)
