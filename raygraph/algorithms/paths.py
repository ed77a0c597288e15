"""BFS levels / SSSP — sparse-frontier delta relaxation (min_plus).

Reference analog: BFS via the masked-mxv idiom
``q(~v.S, replace=True) << A.mxv(q, min_first)`` and SSSP via ``min_plus``
(reference graphblas/core/mask.py:131-200 masks, BFS notebook; SURVEY.md
§2.2 Semiring row). The production path (``mode="frontier"``) relaxes
only the frontier's out-edges each round — Σ|frontier-degree| work, not
D·nnz — via fused.sssp_frontier's refs-only task waves.

``mode="dataset"`` keeps the original full-edge Bellman-Ford over
engine.spmv as a small-scale cross-check (every round relaxes every edge
with a dense dist vector; parity-tested against the frontier path).
"""

from __future__ import annotations

import numpy as np

from raygraph.engine import spmv
from raygraph.util import part_of


def sssp(graph, source: int, *, itermax: int = 10_000, mode: str = "frontier"):
    """Returns (distance slices, info). Unreached vertices stay +inf."""
    if mode == "frontier":
        from raygraph.fused import sssp_frontier

        return sssp_frontier(graph, source, itermax=itermax)

    dist = graph.state(np.inf)
    sid = np.uint64(source)
    p = int(part_of(np.asarray([sid], np.uint64), graph.num_parts)[0])
    ids = graph.ids_slices()
    pos = np.searchsorted(ids[p], sid)
    if pos >= len(ids[p]) or ids[p][pos] != sid:
        raise KeyError(f"source vertex {source} not in graph")
    dist[p][pos] = 0.0
    it = 0
    for it in range(itermax):
        relaxed = spmv(graph, dist, "min_plus")
        new = [np.minimum(d, r) for d, r in zip(dist, relaxed)]
        changed = any(bool((a != b).any()) for a, b in zip(new, dist))
        dist = new
        if not changed:
            break
    return dist, {"iters": it + 1, "edges_traversed": (it + 1) * graph.nnz}


def bfs_levels(graph, source: int, *, itermax: int = 10_000, mode: str = "frontier"):
    """Hop distance from source (graph must be binarized: w == 1.0)."""
    return sssp(graph, source, itermax=itermax, mode=mode)


def multi_source_bfs(graph, sources, *, itermax: int = 10_000) -> "pa.Table":
    """Hop distances from each of several sources: rows
    ``(source, v, dist)``, reached vertices only — the diameter /
    eccentricity probe pattern (k BFS sweeps from landmark vertices).

    Each sweep is one sparse-frontier fused BFS (Σ|frontier-degree|
    work, refs-only supersteps); sweeps run sequentially so the peak
    state is ONE distance vector, not k. The per-source result slices
    concatenate into one table — at landmark counts where n·k rows
    stop fitting anywhere, stream each sweep straight to a partitioned
    sink instead of concatenating (same call per sweep)."""
    import pyarrow as pa

    parts = []
    for s in sources:
        dist, _ = bfs_levels(graph, int(s), itermax=itermax)
        t = graph.to_vertex_table(dist, "dist")
        d = np.asarray(t["dist"].to_numpy(zero_copy_only=False))
        keep = np.isfinite(d)
        v = np.asarray(t["v"].to_numpy(zero_copy_only=False))[keep]
        parts.append(pa.table({
            "source": np.full(len(v), int(s), np.int64),
            "v": v.astype(np.int64),
            "dist": d[keep].astype(np.int64),
        }))
    return pa.concat_tables(parts)


def eccentricity(graph, sources, *, itermax: int = 10_000) -> "pa.Table":
    """Per-landmark eccentricity over its reachable set: ``(source,
    ecc = max hop distance, n_reached)`` — the standard iFUB/diameter
    lower-bound probe, derived from :func:`multi_source_bfs`."""
    import pyarrow as pa

    t = multi_source_bfs(graph, sources, itermax=itermax)
    src = np.asarray(t["source"].to_numpy(zero_copy_only=False), np.int64)
    d = np.asarray(t["dist"].to_numpy(zero_copy_only=False), np.int64)
    order = np.argsort(src, kind="stable")
    src, d = src[order], d[order]
    starts = np.r_[True, src[1:] != src[:-1]]
    idx = np.flatnonzero(starts)
    ecc = np.maximum.reduceat(d, idx)
    cnt = np.diff(np.r_[idx, len(d)])
    return pa.table({"source": src[starts], "ecc": ecc,
                     "n_reached": cnt.astype(np.int64)})


def closeness(graph, sources, *, itermax: int = 10_000) -> "pa.Table":
    """Per-landmark closeness centrality over the reachable set:
    ``(source, closeness = (n_reached - 1) / Σ dist, n_reached)`` —
    the Wasserman-Faust form restricted to reached vertices, derived
    from the same fused BFS sweeps as :func:`eccentricity`. Returned
    closeness is rounded to 6 decimals (engine-portable compare)."""
    import pyarrow as pa

    t = multi_source_bfs(graph, sources, itermax=itermax)
    src = np.asarray(t["source"].to_numpy(zero_copy_only=False), np.int64)
    d = np.asarray(t["dist"].to_numpy(zero_copy_only=False), np.int64)
    order = np.argsort(src, kind="stable")
    src, d = src[order], d[order]
    starts = np.r_[True, src[1:] != src[:-1]]
    idx = np.flatnonzero(starts)
    tot = np.add.reduceat(d, idx)
    cnt = np.diff(np.r_[idx, len(d)])
    clo = np.where(tot > 0, (cnt - 1) / np.maximum(tot, 1), 0.0)
    return pa.table({"source": src[starts],
                     "closeness": np.round(clo, 6),
                     "n_reached": cnt.astype(np.int64)})


def harmonic(graph, sources, *, itermax: int = 10_000) -> "pa.Table":
    """Per-landmark harmonic centrality ``Σ 1/dist`` over reached
    vertices (dist > 0) — the centrality that stays well-defined on
    disconnected graphs; same fused BFS sweeps as :func:`closeness`.
    Rounded to 6 decimals for engine-portable compare."""
    import pyarrow as pa

    t = multi_source_bfs(graph, sources, itermax=itermax)
    src = np.asarray(t["source"].to_numpy(zero_copy_only=False), np.int64)
    d = np.asarray(t["dist"].to_numpy(zero_copy_only=False), np.int64)
    keep = d > 0
    src, d = src[keep], d[keep]
    order = np.argsort(src, kind="stable")
    src, d = src[order], d[order]
    starts = np.r_[True, src[1:] != src[:-1]]
    idx = np.flatnonzero(starts)
    h = np.add.reduceat(1.0 / d, idx)
    cnt = np.diff(np.r_[idx, len(d)])
    return pa.table({"source": src[starts],
                     "harmonic": np.round(h, 6),
                     "n_reached": cnt.astype(np.int64)})


def khop_induced_subgraph(graph, edges, sources, k: int, *,
                          itermax: int = 10_000):
    """k-hop neighborhood extraction: the induced subgraph on all
    vertices within hop distance <= k of the source set — the GNN
    mini-batch / snowball-sampling prep. Returns the induced edge
    Dataset (src, dst, w) of ``edges`` restricted to the neighborhood.

    Shape: one fused BFS sweep per source gives the membership set; the
    O(|N|) member vector broadcasts once via ``ray.put`` and every edge
    batch keeps rows with BOTH endpoints members via two zero-copy
    ``isin``-style searchsorted probes — the edge stream is filtered in
    place, never shuffled."""
    import pyarrow as pa
    import ray

    from raygraph import kernels as K

    t = multi_source_bfs(graph, sources, itermax=itermax)
    v = np.asarray(t["v"].to_numpy(zero_copy_only=False), np.int64)
    d = np.asarray(t["dist"].to_numpy(zero_copy_only=False), np.int64)
    members = np.unique(v[d <= k]).astype(np.uint64)
    mem_ref = ray.put(members)

    def m(tbl, _m=mem_ref):
        mem = ray.get(_m)
        s = np.asarray(tbl["src"].to_numpy(zero_copy_only=False), np.uint64)
        dd = np.asarray(tbl["dst"].to_numpy(zero_copy_only=False), np.uint64)
        pos_s = np.searchsorted(mem, s)
        pos_d = np.searchsorted(mem, dd)
        in_s = (pos_s < len(mem)) & (mem[np.minimum(pos_s, len(mem) - 1)] == s)
        in_d = (pos_d < len(mem)) & (mem[np.minimum(pos_d, len(mem) - 1)] == dd)
        keep = in_s & in_d
        out = {c: tbl[c].filter(pa.array(keep)) for c in tbl.column_names}
        return pa.table(out)

    return K._ds(edges).map_batches(m, batch_format="pyarrow")
