"""Connected components over duplicate-pair edges → dedup clusters.

The reference stops at pairwise duplicate detection; a production fuzzy-dedup
pipeline must consolidate pairs into clusters so each near-dup group keeps
exactly one canonical document (the pair list alone can't tell you which docs
to drop when A~B and B~C but A!~C). There is no reference counterpart — this
is a first-class scale extension alongside ``operators/dedup.py``.

Algorithm: alternating Large-Star / Small-Star (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and Beyond",
ACM SoCC'14). Unlike naive label propagation, whose round count equals the
graph DIAMETER (a 1M-node duplicate chain needs 1M rounds), star contraction
converges in O(log^2 n) rounds regardless of diameter. Each round is two
hash-partitioned window aggregations over the edge list — the shuffled state
is (long, long) pairs only, never text or vectors, and the edge count is
non-increasing, so at 100 TB the cost is a handful of cheap integer shuffles.
Lineage is truncated per round with ``localCheckpoint`` so the iterative plan
doesn't grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docarray_spark.functions.localexec import local_table


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w = Window.partitionBy("u")
    return (
        sym.withColumn("m", F.least(F.col("u"), F.min("v").over(w)))
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge large→small, then connect every smaller neighbor of
    u (and u itself) to the minimum of the neighborhood."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    w = Window.partitionBy("u")
    with_min = oriented.withColumn("m", F.min("v").over(w))
    leaves = (
        with_min.where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    centers = with_min.select("u", F.col("m").alias("v"))
    return (
        leaves.unionByName(centers)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _union_find_labels(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Driver-side union-find with min-id labels — identical output to the
    distributed fixpoint (min node id per component)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by MIN id so the root IS the canonical label
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return [(n, find(n)) for n in parent]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    driver_edge_budget: int = 1_000_000,
) -> DataFrame:
    """Resolve the connected components of an undirected edge list.

    → ``(node: long, component: long)`` for every node that appears in an
    edge; ``component`` is the minimum node id of the component (so it's a
    stable canonical representative). Isolated nodes don't appear — callers
    with a node table left-join and coalesce (see :func:`dedup_clusters`).

    Dispatch: an edge list within ``driver_edge_budget`` is collected and
    resolved with driver-side union-find (ONE job instead of ~5 rounds ×
    2 shuffles + checkpoint — near-dup edge sets are usually tiny relative
    to the corpus); larger graphs run the distributed star contraction.
    Both paths produce the identical min-id labeling — pinned equal in
    tests. Set the budget to 0 to force the distributed path.

    Deterministic: the fixpoint is unique (min-id star forest), so Spark and
    any SQL oracle agree bit-for-bit. Raises if ``max_iter`` rounds don't
    reach the fixpoint (25 rounds covers graphs astronomically larger than
    2^25 nodes at the proven O(log^2 n) rate).
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    if driver_edge_budget > 0:
        probe = e.limit(driver_edge_budget + 1).collect()
        if len(probe) <= driver_edge_budget:
            labels = _union_find_labels([(r.u, r.v) for r in probe])
            spark = edges.sparkSession
            return local_table(
                spark, labels or [], "node long, component long"
            )
    prev = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint()
        # decimal(38,0) sum: an order-insensitive edge-set fingerprint that
        # cannot hit ANSI long-overflow no matter the edge count
        fp = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        cur = (fp["n"], fp["h"])
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # Fixpoint is a star forest: every edge is (node, component_min_id).
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = labels.select(
        F.col("component").alias("node"), F.col("component")
    ).distinct()
    return labels.unionByName(roots)


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    driver_edge_budget: int = 1_000_000,
) -> DataFrame:
    """Duplicate-cluster assignment for a full corpus: run
    :func:`connected_components` over the near-dup ``pairs`` and label every
    row of ``df`` — docs in no pair are their own singleton cluster.

    → ``(id_col, component: long, is_canonical: boolean)``; the dedup policy
    "keep one doc per near-dup group" is ``filter(is_canonical)``.

    Scale shape: the CC iteration touches only integer edges; the single
    corpus-wide cost is one left join against the label table (tiny relative
    to the corpus — only docs that belong to a duplicate pair), which AQE
    broadcasts in the common case.
    """
    labels = connected_components(
        pairs, src=src, dst=dst, max_iter=max_iter,
        driver_edge_budget=driver_edge_budget,
    )
    out = (
        df.select(id_col)
        .join(labels.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).cast("long").alias("component"),
        )
    )
    return out.withColumn("is_canonical", F.col(id_col) == F.col("component"))
