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


def sample_neighbors(edges, sources, *, fanout: int = 3, hops: int = 2):
    """GraphSAGE-style fanout-bounded neighbor sampling: from each
    frontier vertex keep the ``fanout`` out-neighbors with the smallest
    ``md5("src:dst")`` digests, for ``hops`` layers — the GNN mini-batch
    sampler. md5 ranking is a uniform pseudo-random draw with no RNG
    state: stable under repartitioning/restarts and exactly reproducible
    by a SQL oracle (``row_number() OVER (PARTITION BY src ORDER BY
    md5(src || ':' || dst), dst) <= fanout``).

    Returns a pyarrow.Table ``(hop, src, dst)`` of sampled edges.

    Scale shape: per hop, the frontier broadcasts once via ``ray.put``
    (it is fanout^hop x |seeds| ids, tiny by construction); each edge
    batch filters to frontier sources with a searchsorted probe and keeps
    at most ``fanout`` candidates per source (combiner), so the
    groupby(src) exchange carries <= fanout x |frontier| x batches rows —
    never the edge stream. The sampled layer (<= fanout x |frontier|
    rows) returns to the driver only to seed the next hop's broadcast.
    """
    import hashlib

    import pandas as pd
    import pyarrow as pa
    import ray

    from raygraph import kernels as K

    frontier = np.unique(np.asarray(sources, np.uint64))
    ds = K._ds(edges)
    layers = []
    for hop in range(1, hops + 1):
        if len(frontier) == 0:
            break
        ref = ray.put(frontier)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            f = ray.get(_ref)
            s = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
            d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
            pos = np.searchsorted(f, s)
            hit = (pos < len(f)) & (f[np.minimum(pos, len(f) - 1)] == s)
            s, d = s[hit], d[hit]
            if len(s) == 0:
                return pa.table({"src": pa.array([], pa.uint64()),
                                 "dst": pa.array([], pa.uint64()),
                                 "h": pa.array([], pa.string())})
            hx = np.array([hashlib.md5(b"%d:%d" % (a, b)).hexdigest()
                           for a, b in zip(s.tolist(), d.tolist())])
            order = np.lexsort((d, hx, s))
            ss = s[order]
            idx = np.arange(len(order))
            change = np.r_[True, ss[1:] != ss[:-1]]
            run_start = np.maximum.accumulate(np.where(change, idx, 0))
            keep = order[(idx - run_start) < fanout]
            return pa.table({"src": s[keep], "dst": d[keep],
                             "h": pa.array(hx[keep])})

        partials = ds.map_batches(partial, batch_format="pyarrow")

        def final(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["h", "dst"]).head(fanout)
            return g.drop(columns=["h"]).reset_index(drop=True)

        layer = K.to_table(
            partials.groupby("src").map_groups(final, batch_format="pandas"),
            sort_by=None)
        layer = pa.table({
            "hop": np.full(layer.num_rows, hop, np.int64),
            "src": layer["src"],
            "dst": layer["dst"],
        })
        layers.append(layer)
        frontier = np.unique(
            np.asarray(layer["dst"].to_numpy(zero_copy_only=False),
                       np.uint64))
    if not layers:
        return pa.table({"hop": pa.array([], pa.int64()),
                         "src": pa.array([], pa.uint64()),
                         "dst": pa.array([], pa.uint64())})
    return pa.concat_tables(layers)
