"""Betweenness centrality — Brandes (2001) from a landmark source set,
level-synchronous GraphBLAS-style supersteps (the LAGraph batch-BC
recipe): a forward wave of shortest-path counts (``plus_times`` spmv on
A, masked to the next BFS level) and a backward dependency wave
(``plus_times`` spmv on the reversed twin graph A^T).

Reference-ecosystem counterpart: graphblas-algorithms
``betweenness_centrality`` (NetworkX semantics, directed, endpoints
excluded); SURVEY.md §7.1 algorithm family.

Scale shape: per landmark the two sweeps cost 2·D spmv supersteps
(D = ``depth`` cap) over the partitioned CSR blocks — Brandes/Pich 2007
landmark-approximate BC, linear in |S|·D·nnz. Vertex state is
per-partition slices (dist, sigma, delta: three vectors, never an
n×|S| matrix); sweeps run sequentially so peak state is one landmark's.
The ``depth`` cap makes the operator the k-truncated BC on both the
engine and the SQL oracle by construction.
"""

from __future__ import annotations

import numpy as np

from raygraph.engine import spmv
from raygraph.util import part_of


def betweenness(graph, rgraph, sources, *, depth: int = 4) -> "pa.Table":
    """Landmark betweenness: rows ``(v, bc)`` for every vertex reached
    by some landmark at hop distance < ``depth`` (the landmark itself
    excluded per sweep), bc rounded to 6 decimals.

    ``rgraph`` is the SAME vertex set with every edge reversed (both
    graphs binarized): the hash partitioner derives identical vertex
    slices from the vertex set alone, so state slices flow between the
    two without remapping.
    """
    import pyarrow as pa

    if rgraph.n_vertices != graph.n_vertices:
        raise ValueError("rgraph must be the reversed twin of graph "
                         f"({rgraph.n_vertices} != {graph.n_vertices})")
    ids = graph.ids_slices()
    bc = graph.state(0.0)
    seen = [np.zeros(len(a), bool) for a in ids]
    for s in sources:
        sid = np.uint64(int(s))
        p = int(part_of(np.asarray([sid], np.uint64), graph.num_parts)[0])
        pos = int(np.searchsorted(ids[p], sid))
        if pos >= len(ids[p]) or ids[p][pos] != sid:
            raise KeyError(f"source vertex {s} not in graph")
        dist = graph.state(np.inf)
        sigma = graph.state(0.0)
        dist[p][pos] = 0.0
        sigma[p][pos] = 1.0
        # forward: sigma wave, one masked plus_times superstep per level
        top = 0
        for k in range(depth):
            x = [np.where(d == k, sg, 0.0) for d, sg in zip(dist, sigma)]
            y = spmv(graph, x, "plus_times")
            new = [(yy > 0) & ~np.isfinite(d) for yy, d in zip(y, dist)]
            if not any(bool(m.any()) for m in new):
                break
            for d, sg, yy, m in zip(dist, sigma, y, new):
                d[m] = k + 1
                sg[m] = yy[m]
            top = k + 1
        # backward: dependency wave on the reversed graph
        delta = graph.state(0.0)
        for k in range(top - 1, -1, -1):
            x = [np.where(d == k + 1,
                          (1.0 + dl) / np.where(sg > 0, sg, 1.0), 0.0)
                 for d, dl, sg in zip(dist, delta, sigma)]
            y = spmv(rgraph, x, "plus_times")
            for d, dl, sg, yy in zip(dist, delta, sigma, y):
                m = d == k
                dl[m] = sg[m] * yy[m]
        for i, (d, dl) in enumerate(zip(dist, delta)):
            m = np.isfinite(d) & (d < depth)
            if i == p:
                m[pos] = False
            bc[i][m] += dl[m]
            seen[i] |= m
    vs = np.concatenate([a[m] for a, m in zip(ids, seen)]).astype(np.int64)
    bs = np.concatenate([np.round(b[m], 6) for b, m in zip(bc, seen)])
    return pa.table({"v": vs, "bc": bs}).sort_by([("v", "ascending")])
