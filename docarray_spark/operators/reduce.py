"""Merge-by-id — the reference's ``reduce`` / ``reduce_all``
(``/root/reference/docarray/array/mixins/reduce.py:29-91``): union two doc
sets; docs present in both are merged field-by-field with **left priority**
(``reduce.py:7-16`` only overwrites left fields that are unset).

Spark formulation: ``full_outer`` join on id + per-field ``coalesce(left,
right)``. One shuffle on id (or zero if both sides are bucketed by id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reduce_docs(left: DataFrame, right: DataFrame, id_col: str = "id") -> DataFrame:
    """Full-outer merge on ``id_col``; for shared columns take the left value
    when set, else the right (field merge semantics of ``reduce.py:7-16``).
    Columns unique to one side pass through."""
    l = left.alias("l")
    r = right.alias("r")
    joined = l.join(r, F.col(f"l.{id_col}") == F.col(f"r.{id_col}"), "full_outer")

    lcols, rcols = set(left.columns), set(right.columns)
    out = [F.coalesce(F.col(f"l.{id_col}"), F.col(f"r.{id_col}")).alias(id_col)]
    for c in left.columns:
        if c == id_col:
            continue
        if c in rcols:
            out.append(F.coalesce(F.col(f"l.{c}"), F.col(f"r.{c}")).alias(c))
        else:
            out.append(F.col(f"l.{c}").alias(c))
    out += [F.col(f"r.{c}").alias(c) for c in right.columns if c not in lcols]
    return joined.select(*out)


def concat(left: DataFrame, right: DataFrame) -> DataFrame:
    """``extend`` / ``+`` — concatenation, duplicates allowed
    (``storage/base/seqlike.py:10-25``)."""
    return left.unionByName(right, allowMissingColumns=True)


def delete_by_ids(df: DataFrame, ids, id_col: str = "id") -> DataFrame:
    """``del da[ids]`` (``array/mixins/delitem.py:19-78``) — anti-join or
    NOT-IN filter depending on the ids being a DataFrame or a literal list."""
    if isinstance(ids, DataFrame):
        return df.join(ids, df[id_col] == ids[ids.columns[0]], "left_anti")
    return df.filter(~F.col(id_col).isin(list(ids)))


def contains_ids(df: DataFrame, ids, id_col: str = "id") -> DataFrame:
    """``id in da`` membership — semi-join (``storage/base/getsetdel.py:55-57``)."""
    if isinstance(ids, DataFrame):
        return df.join(ids, df[id_col] == ids[ids.columns[0]], "left_semi")
    return df.filter(F.col(id_col).isin(list(ids)))
