"""Pure-numpy HNSW graph index (public algorithm: Malkov & Yashunin,
*Efficient and robust approximate nearest neighbor search using Hierarchical
Navigable Small World graphs*, IEEE TPAMI 2018; arXiv:1603.09320).

The reference delegates ANN to HNSW-backed stores (annlite/qdrant/weaviate,
``/root/reference/docarray/array/storage/annlite/find.py:16-44``) through
the ``hnswlib`` package — absent in this environment. This module
implements the published algorithm itself so the engine's per-partition
HNSW path (``operators/hnsw.py``) is real, not stubbed: graph construction
(level sampling, greedy descent, neighbor-selection heuristic) and layered
search are the paper's Algorithms 1-5 over numpy distance batches.

Determinism: levels are drawn from a hash of the insertion key (not a
global RNG), so a rebuilt index — e.g. a retried Spark task — produces the
identical graph for the same input partition.

This is an in-memory, single-process structure by design: one instance
indexes ONE Spark partition (up to a few hundred thousand vectors), never
the whole corpus — the distributed story is partition-local graphs + a
global top-k merge, see ``operators/hnsw.py``.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

_HASH_DENOM = float(1 << 53)


def _key_to_int(key) -> int:
    """Deterministic integer from an insertion key. NOT python ``hash()``:
    string hashing is salted per process (PYTHONHASHSEED), which would make
    a retried task rebuild a different graph."""
    if isinstance(key, (int, np.integer)):
        return int(key)
    import hashlib

    return int.from_bytes(hashlib.md5(repr(key).encode()).digest()[:8], "little")


def _unit_from_key(key: int) -> float:
    """Deterministic uniform (0, 1] from an integer key (splitmix64-style
    finalizer — public-domain constant mixing, same family Spark's
    xxhash64 uses)."""
    z = (key + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    z = z ^ (z >> 31)
    return ((z >> 11) + 1) / _HASH_DENOM


class HNSWIndex:
    """Hierarchical navigable small-world graph over float64 vectors.

    Parameters mirror hnswlib's: ``M`` max neighbors per node per layer
    (layer 0 allows 2M), ``ef_construction`` beam width during insertion,
    ``ef`` beam width during search. Distance is squared euclidean
    (monotone with euclidean; callers wanting cosine pre-normalize — the
    standard trick, ``|a-b|² = 2·(1-cos)`` on unit vectors).

    Vectors live in one preallocated (doubling) float64 matrix so every
    neighborhood expansion is a single fancy-indexed batch distance."""

    def __init__(self, dim: int, M: int = 16, ef_construction: int = 100):
        self.dim = dim
        self.M = M
        self.M0 = 2 * M
        self.ef_construction = ef_construction
        self.mL = 1.0 / math.log(M)
        self._data = np.empty((1024, dim), dtype=np.float64)
        self._sq = np.empty(1024, dtype=np.float64)  # row squared norms
        self.n = 0
        self.keys: list = []
        self.levels: list[int] = []
        # neighbors[layer][node] -> list[int] (dict keyed by node id)
        self.neighbors: list[dict[int, list[int]]] = []
        self.entry: int | None = None

    # ---------------------------------------------------------- internals

    def _grow(self) -> None:
        cap = self._data.shape[0]
        data = np.empty((cap * 2, self.dim), dtype=np.float64)
        data[:cap] = self._data
        self._data = data
        sq = np.empty(cap * 2, dtype=np.float64)
        sq[:cap] = self._sq
        self._sq = sq

    def _dist(self, q: np.ndarray, nodes) -> np.ndarray:
        """Batch sqeuclidean from q to the given node ids (expansion trick
        against the cached row norms — one GEMV per neighborhood)."""
        idx = np.asarray(nodes, dtype=np.intp)
        rows = self._data[idx]
        return np.maximum(self._sq[idx] - 2.0 * (rows @ q) + (q @ q), 0.0)

    def _search_layer(
        self, q: np.ndarray, entry_points: list[tuple[float, int]], ef: int, layer: int
    ) -> list[tuple[float, int]]:
        """Algorithm 2: beam search in one layer. entry_points/result are
        (dist, node) pairs; returns the ef closest found, ascending."""
        visited = {n for _, n in entry_points}
        cand = list(entry_points)
        heapq.heapify(cand)
        result = [(-d, n) for d, n in entry_points]
        heapq.heapify(result)
        adj = self.neighbors[layer]
        while cand:
            d_c, c = heapq.heappop(cand)
            if d_c > -result[0][0] and len(result) >= ef:
                break
            todo = [n for n in adj.get(c, ()) if n not in visited]
            if not todo:
                continue
            visited.update(todo)
            dists = self._dist(q, todo)
            worst = -result[0][0]
            for d_n, n in zip(dists, todo):
                if len(result) < ef or d_n < worst:
                    heapq.heappush(cand, (d_n, n))
                    heapq.heappush(result, (-d_n, n))
                    if len(result) > ef:
                        heapq.heappop(result)
                    worst = -result[0][0]
        return sorted((-nd, n) for nd, n in result)

    def _select_neighbors(
        self, cands: list[tuple[float, int]], m: int
    ) -> list[int]:
        """Algorithm 4 (heuristic select): keep a candidate only if it is
        closer to the query point than to every already-kept neighbor —
        prunes clustered duplicates, keeps the graph navigable across
        clusters. Pairwise distances among candidates are computed once as
        a numpy matrix."""
        cands = sorted(cands)
        if len(cands) <= m:
            return [c for _, c in cands]
        ids = np.asarray([c for _, c in cands], dtype=np.intp)
        d_q = np.asarray([d for d, _ in cands])
        rows = self._data[ids]
        # pairwise sqeuclidean among candidates
        sq = self._sq[ids]
        pair = np.maximum(sq[:, None] - 2.0 * (rows @ rows.T) + sq[None, :], 0.0)
        kept: list[int] = []  # positions into cands
        for i in range(len(cands)):
            if len(kept) >= m:
                break
            if all(pair[i, j] >= d_q[i] for j in kept):
                kept.append(i)
        if len(kept) < m:  # backfill with pruned ones, closest first
            kept_set = set(kept)
            for i in range(len(cands)):
                if i not in kept_set:
                    kept.append(i)
                    if len(kept) >= m:
                        break
        return [int(ids[i]) for i in kept]

    def _link(self, a: int, b: int, layer: int) -> None:
        adj = self.neighbors[layer]
        cap = self.M0 if layer == 0 else self.M
        lst = adj.setdefault(a, [])
        if b in lst:
            return
        lst.append(b)
        if len(lst) > cap:
            # shrink step of Algorithm 1 with SIMPLE selection (drop the
            # farthest — the paper's select-simple alternative): the full
            # pairwise heuristic here re-ran an O(cap²·d) GEMM on every
            # overflow and dominated build time ~3:1; insert-time neighbor
            # choice (where navigability is decided) keeps the heuristic
            d = self._dist(self._data[a], lst)
            del lst[int(np.argmax(d))]

    # ------------------------------------------------------------ surface

    def __getstate__(self) -> dict:
        """Pickle wire format: vectors travel float32 (halves the dominant
        blob cost — r6 frontier note 5 measured the stored-HNSW segment
        store at 2.2× raw corpus bytes with float64 internals) and the
        derived ``_sq`` row norms are dropped entirely; growth slack is
        trimmed. Search math stays float64 AFTER load (restored in
        ``__setstate__``), so only the stored coordinates are rounded —
        one f64→f32→f64 round-trip, identical for a rebuilt or reloaded
        segment, keeping serialization deterministic for task retries."""
        state = self.__dict__.copy()
        state["_data"] = np.ascontiguousarray(
            self._data[: self.n], dtype=np.float32
        )
        state.pop("_sq", None)
        return state

    def __setstate__(self, state: dict) -> None:
        data = state.pop("_data")
        sq = state.pop("_sq", None)  # pre-r7 blobs still carry it
        self.__dict__.update(state)
        self._data = np.asarray(data, dtype=np.float64)
        self._sq = (
            np.asarray(sq, dtype=np.float64)
            if sq is not None
            else np.einsum("ij,ij->i", self._data, self._data)
        )

    def add(self, key, vec: np.ndarray) -> None:
        """Algorithm 1: insert one vector under ``key`` (level drawn from a
        hash of the key — deterministic rebuilds)."""
        vec = np.asarray(vec, dtype=np.float64)
        if self.n >= self._data.shape[0]:
            self._grow()
        node = self.n
        self._data[node] = vec
        self._sq[node] = float(vec @ vec)
        self.n += 1
        self.keys.append(key)
        u = _unit_from_key(_key_to_int(key))
        level = int(-math.log(u) * self.mL)
        self.levels.append(level)
        while len(self.neighbors) <= level:
            self.neighbors.append({})
        if self.entry is None:
            self.entry = node
            return
        top = len(self.neighbors) - 1
        eps = [(float(self._dist(vec, [self.entry])[0]), self.entry)]
        for layer in range(top, level, -1):  # greedy descent above level
            eps = self._search_layer(vec, eps, 1, layer)
        for layer in range(min(level, top), -1, -1):  # beam insert
            found = self._search_layer(vec, eps, self.ef_construction, layer)
            m = self.M0 if layer == 0 else self.M
            for n in self._select_neighbors(found, m):
                self._link(node, n, layer)
                self._link(n, node, layer)
            eps = found
        if level > self.levels[self.entry]:
            self.entry = node

    def add_batch(self, keys, mat: np.ndarray) -> None:
        for key, row in zip(keys, np.asarray(mat, dtype=np.float64)):
            self.add(key, row)

    def search(
        self,
        q: np.ndarray,
        k: int,
        ef: int | None = None,
        allow: "set | None" = None,
    ) -> list[tuple[float, object]]:
        """Algorithm 5: → [(sqeuclidean, key)] of the ~k nearest, ascending.
        ``ef`` defaults to ``max(ef_construction, k)``.

        ``allow``: optional key set for FILTERED search (the standard
        post-traversal emission filter: the graph walk itself stays
        unrestricted so connectivity is preserved; only qualifying keys
        are returned). With selective filters raise ``ef`` — the beam
        must hold enough candidates that ≥k of them qualify; the caller
        (``hnsw_match_stored``) auto-scales it by the filter
        selectivity."""
        if self.entry is None:
            return []
        q = np.asarray(q, dtype=np.float64)
        ef = max(ef or self.ef_construction, k)
        eps = [(float(self._dist(q, [self.entry])[0]), self.entry)]
        for layer in range(len(self.neighbors) - 1, 0, -1):
            eps = self._search_layer(q, eps, 1, layer)
        found = self._search_layer(q, eps, ef, 0)
        if allow is not None:
            found = [(d, n) for d, n in found if self.keys[n] in allow]
        return [(d, self.keys[n]) for d, n in found[:k]]

    def __len__(self) -> int:
        return self.n
