"""Katz centrality — fused supersteps over the graph's block caches.

Reference-ecosystem counterpart: graphblas-algorithms
``katz_centrality`` (NetworkX semantics: power iteration
``x ← α·Aᵀx + β`` from x = 0, final L2 normalization). The engine's
scatter pushes x[src] along src→dst edges, i.e. y = Aᵀx, so
centrality accrues from IN-edges exactly as in the reference.

Distributed shape (the part that must survive 100 TB): identical
task-wave structure to pagerank_fused / hits_fused — per live
partition one scatter task emitting P positional packets, per
partition one reduce task (a single deterministic bincount with β
folded in, so vertices with no in-edges still receive β). α is folded
into the scatter multiply, so no extra task wave ever touches the
state; the driver holds only object refs. Unlike HITS there is no
per-iteration global scalar — the only global reduction is the final
L2 norm, one float per partition.
"""

from __future__ import annotations

import numpy as np

from raygraph.fused import block_cache


def katz_fused(g, *, alpha: float = 0.05, beta: float = 1.0,
               itermax: int = 8, normalize: bool = True,
               x0: float = 0.0, keep_prev: bool = False):
    """Returns per-partition dense Katz state in ``g``'s layout after
    ``itermax`` unrolled iterations (bit-comparable to the unrolled SQL
    oracle at 6 decimals); L2-normalized when ``normalize``.

    ``x0`` is the uniform starting value: 0 gives Katz centrality
    (x ← α·Aᵀx + β); x0=1 with alpha=1, beta=0 gives the plain power
    iteration x ← Aᵀx, i.e. (in-edge) eigenvector centrality up to the
    final normalization — same recurrence, same task-wave shape.

    ``keep_prev=True`` (requires ``normalize=False``) returns
    ``(xs, xs_prev)`` — the final AND penultimate iterates from ONE
    run, so a Rayleigh norm-ratio consumer (spectral_radius) does not
    pay a second full power iteration."""
    import ray

    if keep_prev and normalize:
        raise ValueError("katz_fused: keep_prev requires normalize=False")

    P = g.num_parts
    sizes = [int(s) for s in g.sizes]
    n = g.n_vertices
    if n == 0:
        return []
    cache = block_cache(g)

    from raygraph.fused import make_weighted_scatter

    scatter = make_weighted_scatter(P)

    def _reduce_body(size, b, *packets):
        live = [pk for pk in packets if pk is not None]
        if live:
            pos = np.concatenate([pk[0] for pk in live])
            val = np.concatenate([pk[1] for pk in live])
            dense = np.bincount(pos, weights=val, minlength=size) + b
        else:
            dense = np.full(size, b, np.float64)
        return dense

    reduce_t = ray.remote(_reduce_body)

    x_refs = [ray.put(np.full(s, x0, np.float64)) for s in sizes]
    prev_refs = x_refs
    for _ in range(itermax):
        prev_refs = x_refs
        pk = [[None] * P for _ in range(P)]
        for p in range(P):
            if cache[p] is None:
                continue
            outs = scatter.remote(cache[p], x_refs[p], alpha)
            if P == 1:
                outs = [outs]
            for q in range(P):
                pk[q][p] = outs[q]
        x_refs = [reduce_t.remote(sizes[q], beta, *pk[q]) for q in range(P)]

    xs = ray.get(x_refs)
    if keep_prev:
        return xs, ray.get(prev_refs)
    if normalize:
        s = float(np.sqrt(sum(float((x * x).sum()) for x in xs)))
        if s > 0:
            xs = [x * (1.0 / s) for x in xs]
    return xs
