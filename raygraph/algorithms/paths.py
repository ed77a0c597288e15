"""BFS levels / SSSP — iterated min_plus SpMV (Bellman-Ford style).

Reference analog: BFS via ``min_first``/``lor_land`` semirings and SSSP
via ``min_plus`` (SURVEY.md §2.2 Semiring row). Distance vector is dense
(+inf = unreached); each round relaxes every edge:
``dist = min(dist, A.mxv(dist, min_plus))`` until fixpoint. For unit
weights this yields BFS hop levels.
"""

from __future__ import annotations

import numpy as np

from raygraph.engine import spmv
from raygraph.util import part_of


def sssp(graph, source: int, *, itermax: int = 10_000, unit_weights: bool = False):
    """Returns (distance slices, info). Unreached vertices stay +inf."""
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
        relaxed = spmv(graph, dist, "min_plus" if not unit_weights else "min_plus")
        if unit_weights:
            pass  # weights are already 1.0 in a binarized graph
        new = [np.minimum(d, r) for d, r in zip(dist, relaxed)]
        changed = any(bool((a != b).any()) for a, b in zip(new, dist))
        dist = new
        if not changed:
            break
    return dist, {"iters": it + 1, "edges_traversed": (it + 1) * graph.nnz}


def bfs_levels(graph, source: int, *, itermax: int = 10_000):
    """Hop distance from source (graph must be binarized: w == 1.0)."""
    return sssp(graph, source, itermax=itermax, unit_weights=True)
