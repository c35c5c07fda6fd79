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


def reduce_matches(
    left: DataFrame | None,
    right: DataFrame | None,
    query_col: str = "query_id",
    match_col: str = "match_id",
) -> DataFrame | None:
    """Merge two matches tables (edge lists): union, dedup on the
    (query, match) edge with LEFT priority for edge attributes — the
    MatchArray half of the reference's recursive reduce
    (``reduce.py:60-66``; its note applies here too: merged matches are not
    rank-sorted — re-rank downstream if needed)."""
    if left is None:
        return right
    if right is None:
        return left
    from pyspark.sql import Window

    l = left.withColumn("_src", F.lit(0))
    r = right.withColumn("_src", F.lit(1))
    both = l.unionByName(r, allowMissingColumns=True)
    w = Window.partitionBy(query_col, match_col).orderBy("_src")
    return (
        both.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def reduce_all(
    left_nodes: DataFrame,
    right_nodes: DataFrame,
    left_matches: DataFrame | None = None,
    right_matches: DataFrame | None = None,
    id_col: str = "id",
) -> tuple[DataFrame, DataFrame | None]:
    """RECURSIVE reduce (reference ``reduce.py:47-91``): merge two document
    TREES, recursing into chunks and matches at every depth.

    In the adjacency-list encoding the recursion collapses into flat
    relational algebra — chunks at every granularity are rows of the nodes
    table keyed by their own id, so ONE merge-by-id over the nodes tables
    reproduces the reference's depth-first walk exactly:

    * node in both trees → field-wise left-priority merge (chunk-level
      merge at any depth, ``_reduce_doc_props`` at ``reduce.py:7-16``;
      left's ``parent_id`` wins, matching its set-field exclusion);
    * node only in the right tree → appended with its whole subtree (its
      descendants are also right-only rows).

    Matches tables merge via :func:`reduce_matches`. Cost: one hash
    shuffle per table on id — no per-level iteration, no driver recursion;
    at 100 TB this is the same plan as the flat reduce, NOT a tree walk."""
    nodes = reduce_docs(left_nodes, right_nodes, id_col=id_col)
    return nodes, reduce_matches(left_matches, right_matches)


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


def intersect_ids(left: DataFrame, right: DataFrame, id_col: str = "id") -> DataFrame:
    """Set intersection by document id (engine extension — SURVEY §2.7
    notes the reference has no intersect/except; Spark gives them free).
    Keeps the LEFT side's rows (left-priority, like ``reduce``)."""
    return left.join(
        right.select(id_col).distinct(), id_col, "left_semi"
    )


def except_ids(left: DataFrame, right: DataFrame, id_col: str = "id") -> DataFrame:
    """Set difference by document id: left docs whose id is absent from
    right — the relational form of ``del da[other_ids]``."""
    return left.join(
        right.select(id_col).distinct(), id_col, "left_anti"
    )
