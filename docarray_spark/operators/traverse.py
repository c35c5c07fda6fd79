"""Traversal-path DSL over the relational (adjacency-list) nesting model.

The reference's signature dataflow op: ``da['@c']``, ``traverse_flat(paths)``
with grammar ``r`` (roots), ``c`` (chunks), ``m`` (matches), compositions
(``cc``, ``cm``), per-step slices (``r[1:5]``, ``c[-1]``), multi-paths
(``r,c``) — ``/root/reference/docarray/array/mixins/traverse.py:16-72``
(grammar) and ``:110-234`` (walker).

Here ``chunks``/``matches`` recursion is relationally encoded (SURVEY.md
§1.4): one ``nodes`` DataFrame holds every document at any granularity
(roots: ``granularity = 0`` / empty ``parent_id``; chunks carry
``parent_id`` + ``granularity = parent+1``, per ``array/chunk.py:30-45``),
and an optional ``matches`` DataFrame ``(query_id, match_id, rank, ...)``.

Each step compiles to a join:

* ``c`` → semi-structured self-join ``nodes.parent_id ∈ current.id``
* ``m`` → join through the matches table back onto ``nodes``
* slice → ``row_number`` over the per-parent order (offset for chunks,
  rank for matches); negative indices use the per-parent count

All joins are equi-joins on id/parent_id — broadcastable when the current
frontier is small, plain shuffled hash joins otherwise; Catalyst chooses.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# selector = r|c|m | multimodal attribute list '.[a,b]'
# (reference grammar: ``ATTRIBUTE = \.\[name(,name)*\]`` at
# ``array/mixins/traverse.py:16-52``), each optionally followed by a
# wrapped slice ``[lo:hi]`` / index ``[i]``
_TOKEN = re.compile(
    r"(?:(?P<kind>[rcm])"
    r"|\.\[(?P<attrs>[A-Za-z_][A-Za-z0-9_]*(?:,[A-Za-z_][A-Za-z0-9_]*)*)\])"
    r"(?:\[(?P<slice>-?\d*(?::-?\d*)?)\])?"
)


def _split_paths(paths: str) -> list[str]:
    """Split comma-separated multi-paths, NOT splitting commas inside
    attribute selectors (``'.[banner,image],c'`` → 2 paths) — the engine
    analogue of the reference's ``_re_traversal_path_split``."""
    out, depth, cur = [], 0, []
    for ch in paths:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [p for p in out if p]


def _parse_path(path: str):
    path = path.lstrip("@")
    steps = []
    pos = 0
    while pos < len(path):
        m = _TOKEN.match(path, pos)
        if not m:
            raise ValueError(f"cannot parse traversal path {path!r} at {pos}")
        sl = None
        if m.group("slice") is not None:
            s = m.group("slice")
            if ":" in s:
                a, b = s.split(":")
                sl = (int(a) if a else None, int(b) if b else None)
            else:
                i = int(s)
                sl = (i, i + 1 if i != -1 else None)
        if m.group("attrs") is not None:
            steps.append(("a", (m.group("attrs").split(","), sl)))
        else:
            steps.append((m.group("kind"), sl))
        pos = m.end()
    return steps


def _apply_slice(df: DataFrame, partition_cols, order_col, sl) -> DataFrame:
    lo, hi = sl
    w = (
        Window.partitionBy(*partition_cols).orderBy(F.col(order_col).asc())
        if partition_cols
        else Window.orderBy(F.col(order_col).asc())
    )
    pos = F.row_number().over(w) - 1  # 0-based position
    cnt = (
        F.count(F.lit(1)).over(Window.partitionBy(*partition_cols))
        if partition_cols
        else F.count(F.lit(1)).over(Window.partitionBy())
    )
    lo_e = F.lit(lo if lo is not None else 0)
    lo_e = F.when(lo_e < 0, cnt + lo_e).otherwise(lo_e)
    cond = pos >= lo_e
    if hi is not None:
        hi_e = F.lit(hi)
        hi_e = F.when(hi_e < 0, cnt + hi_e).otherwise(hi_e)
        cond = cond & (pos < hi_e)
    return df.withColumn("_pos", pos).withColumn("_keep", cond).filter("_keep").drop("_pos", "_keep")


def traverse(
    nodes: DataFrame,
    path: str,
    matches: DataFrame | None = None,
    id_col: str = "id",
    parent_col: str = "parent_id",
    granularity_col: str = "granularity",
    order_col: str = "offset",
    mm_schema: dict | None = None,
) -> DataFrame:
    """Select the node rows reached by a traversal path (comma-separated
    multi-paths union, duplicates kept — ``traverse_flat`` semantics).

    ``mm_schema`` enables multimodal attribute selectors ``.[banner, image]``
    (reference ``traverse.py:16-52`` grammar + ``document/mixins/
    multimodal.py:100-136`` resolution): a dict ``{attribute: {"position":
    int, "iterable": bool}}`` — the engine analogue of the stored
    ``multi_modal_schema`` metadata. ``position`` is the chunk index under
    the parent; iterable attributes descend one extra level (the chunk's
    chunks), exactly ``get_multi_modal_attribute``'s two branches."""
    path = re.sub(r"\s+", "", path)
    outs = [
        _traverse_one(nodes, p, matches, id_col, parent_col, granularity_col, order_col, mm_schema)
        for p in _split_paths(path)
    ]
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def _traverse_one(nodes, path, matches, id_col, parent_col, granularity_col, order_col, mm_schema=None):
    steps = _parse_path(path)
    cur = nodes.filter(F.col(granularity_col) == 0)
    for kind, sl in steps:
        if kind == "r":
            if sl is not None:
                cur = _apply_slice(cur, [], order_col, sl)
        elif kind == "c":
            frontier = cur.select(F.col(id_col).alias("_fid")).distinct()
            cur = nodes.join(frontier, nodes[parent_col] == F.col("_fid"), "inner").drop("_fid")
            if sl is not None:
                cur = _apply_slice(cur, [parent_col], order_col, sl)
        elif kind == "a":
            attrs, attr_sl = sl
            if mm_schema is None:
                raise ValueError(
                    f"path step .[{','.join(attrs)}] needs mm_schema "
                    "(the multi_modal_schema metadata)"
                )
            for name in attrs:
                if name not in mm_schema:
                    raise ValueError(f"unknown multimodal attribute {name!r}")
            frontier = cur.select(F.col(id_col).alias("_fid")).distinct()
            child = nodes.join(
                frontier, nodes[parent_col] == F.col("_fid"), "inner"
            ).drop("_fid")
            w = Window.partitionBy(parent_col).orderBy(F.col(order_col).asc())
            child = child.withColumn("_pos", F.row_number().over(w) - 1)
            per_attr = []
            for name in attrs:
                spec = mm_schema[name]
                sel = child.filter(
                    F.col("_pos") == int(spec["position"])
                ).drop("_pos")
                if spec.get("iterable"):
                    mid = sel.select(F.col(id_col).alias("_mid")).distinct()
                    sel = nodes.join(
                        mid, nodes[parent_col] == F.col("_mid"), "inner"
                    ).drop("_mid")
                if attr_sl is not None:
                    sel = _apply_slice(sel, [parent_col], order_col, attr_sl)
                per_attr.append(sel)
            cur = per_attr[0]
            for o in per_attr[1:]:
                cur = cur.unionByName(o)
        elif kind == "m":
            if matches is None:
                raise ValueError("path contains 'm' but no matches DataFrame given")
            frontier = cur.select(F.col(id_col).alias("_fid")).distinct()
            hits = matches.join(frontier, matches["query_id"] == F.col("_fid"), "inner")
            if sl is not None:
                hits = _apply_slice(hits, ["query_id"], "rank", sl)
            hits = hits.select(F.col("match_id").alias("_mid"), F.col("query_id").alias("_qid"), "rank")
            cur = (
                nodes.join(hits, nodes[id_col] == F.col("_mid"), "inner")
                .withColumn(parent_col, F.col("_qid"))
                .withColumn("_adj_order", F.col("rank"))
                .drop("_mid", "_qid", "rank")
            )
            order_col = "_adj_order"
        else:  # pragma: no cover
            raise ValueError(kind)
    return cur.drop("_adj_order") if "_adj_order" in cur.columns else cur


def flatten(nodes: DataFrame, id_col: str = "id") -> DataFrame:
    """``da[...]`` / ``flatten()`` (``traverse.py:197-228``): every node at
    every depth, deduplicated by id. The adjacency model already IS flat."""
    return nodes.dropDuplicates([id_col])


def set_along_path(
    nodes: DataFrame,
    path: str,
    matches: DataFrame | None = None,
    id_col: str = "id",
    mm_schema: dict | None = None,
    **values,
) -> DataFrame:
    """Nested bulk set ``da['@c', 'text'] = [...]``
    (``/root/reference/docarray/array/mixins/setitem.py:61-244``): update
    the given columns for exactly the nodes a traversal path reaches,
    leaving every other node untouched.

    Relational shape: traverse → distinct reached-id set → semi-join flag →
    conditional projection. One equi-join against the (usually small)
    reached set; no second shuffle of the nodes table."""
    reached = traverse(
        nodes, path, matches=matches, id_col=id_col, mm_schema=mm_schema
    ).select(
        F.col(id_col).alias("_rid")
    ).distinct()
    flagged = nodes.join(
        reached.withColumn("_hit", F.lit(True)),
        nodes[id_col] == F.col("_rid"),
        "left",
    )
    updated = {}
    for name, v in values.items():
        from pyspark.sql import Column

        v = v if isinstance(v, Column) else F.lit(v)
        updated[name] = (
            F.when(F.col("_hit").isNotNull(), v).otherwise(F.col(name)).alias(name)
        )
    return flagged.withColumns(updated).drop("_rid", "_hit")
