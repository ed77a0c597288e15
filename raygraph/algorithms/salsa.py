"""SALSA hubs & authorities — degree-normalized HITS (Lempel & Moran
2000, "The stochastic approach for link-structure analysis").

Reference-ecosystem counterpart: the graphblas-algorithms ``hits``
family; SALSA replaces HITS's raw adjacency half-steps with the
random-walk (degree-normalized) ones:

    a_i(j) = Σ_{u→j}  h_{i-1}(u) / outdeg(u)
    h_i(u) = Σ_{u→j}  a_i(j)     / indeg(j)

so each half-step is a stochastic-matrix multiply and the iterate's L1
mass is conserved (up to dangling loss) — no per-iteration scalar
normalization is needed, unlike HITS.

Distributed shape: identical task-wave structure to hits_fused (one
scatter task per live partition emitting P positional packets, one
bincount reduce per partition; driver holds refs only). The only
difference is that the scatter multiplies by a PER-PARTITION inverse
out-degree vector instead of a global scalar — that vector is derived
once per partition from the block cache itself (counts per distinct
src) and ``ray.put`` once, so no extra shuffle and no broadcast of any
global state. Same shape on the transposed graph for the hub step
(outdeg of gT = indeg of g).
"""

from __future__ import annotations

import numpy as np

from raygraph.fused import block_cache


def _inv_outdeg_refs(cache, sizes):
    """Per-partition 1/outdeg (0 where outdeg 0) from the block caches —
    blk["src_pos"]/blk["counts"] are the distinct resident sources and
    their out-edge counts, so no pass over the edge list is needed."""
    import ray

    def body(blk, size):
        inv = np.zeros(size, np.float64)
        if blk is not None:
            inv[blk["src_pos"]] = 1.0 / blk["counts"]
        return inv

    t = ray.remote(body)
    return [t.remote(cache[p], sizes[p]) for p in range(len(sizes))]


def salsa_fused(g, gT, *, itermax: int = 4):
    """Returns (hub_slices, auth_slices) — dense per-partition state in
    ``g``'s layout, each L1-normalized over its final iterate. ``gT``
    must be the transposed graph built over the same vertex universe
    and num_parts (layout is a function of the id set alone)."""
    import ray

    P = g.num_parts
    if gT.num_parts != P or gT.n_vertices != g.n_vertices or not np.array_equal(
            np.asarray(g.sizes), np.asarray(gT.sizes)):
        raise ValueError("salsa_fused: g and gT must share vertex universe, "
                         "num_parts and layout")
    sizes = [int(s) for s in g.sizes]
    n = g.n_vertices
    if n == 0:
        return [], []
    cacheA, cacheT = block_cache(g), block_cache(gT)
    invA = _inv_outdeg_refs(cacheA, sizes)   # 1/outdeg(g)  — authority step
    invT = _inv_outdeg_refs(cacheT, sizes)   # 1/indeg(g)   — hub step

    from raygraph.fused import make_weighted_scatter

    scatter = make_weighted_scatter(P)

    def _reduce_body(size, *packets):
        live = [pk for pk in packets if pk is not None]
        if live:
            pos = np.concatenate([pk[0] for pk in live])
            val = np.concatenate([pk[1] for pk in live])
            return np.bincount(pos, weights=val, minlength=size)
        return np.zeros(size, np.float64)

    reduce_t = ray.remote(_reduce_body)

    def half_step(cache, inv_refs, x_refs):
        pk = [[None] * P for _ in range(P)]
        for p in range(P):
            if cache[p] is None:
                continue
            outs = scatter.remote(cache[p], x_refs[p], inv_refs[p])
            if P == 1:
                outs = [outs]
            for q in range(P):
                pk[q][p] = outs[q]
        return [reduce_t.remote(sizes[q], *pk[q]) for q in range(P)]

    h_refs = [ray.put(np.ones(s, np.float64)) for s in sizes]
    a_refs = h_refs
    for _ in range(itermax):
        a_refs = half_step(cacheA, invA, h_refs)   # a ← D_out⁻¹ᵀAᵀ h
        h_refs = half_step(cacheT, invT, a_refs)   # h ← D_in⁻¹ᵀA a

    hs, as_ = ray.get(h_refs), ray.get(a_refs)

    def l1norm(xs):
        s = float(sum(float(x.sum()) for x in xs))
        return [x * (1.0 / s) for x in xs] if s > 0 else xs

    return l1norm(hs), l1norm(as_)
