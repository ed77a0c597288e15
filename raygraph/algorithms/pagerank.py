"""PageRank — the reference's pagerank_3f (LAGraph PageRankGAP variant).

Semantics from notebooks/'Pagerank Demo.ipynb' cell 9 (SURVEY.md §3.2):
binarized adjacency, out-degree prescale d = d_out/damping, per
iteration ``r = teleport + A.T.mxv(t/d, plus_second)``, L1 residual
stop; dangling vertices are NOT redistributed (their mass decays to
teleport — matching the reference exactly, not networkx).

State is FP64 throughout (the reference runs FP32; FP64 partials make
the distributed sum order-insensitive to well below the 1e-6 match
tolerance — SURVEY.md §4 'Determinism').

Each iteration is one engine superstep (scatter + shuffle-reduce) and,
when ``ckpt_dir`` is given, one atomic per-partition Parquet checkpoint
with lineage, so a killed run resumes mid-convergence.
"""

from __future__ import annotations

import time

import numpy as np

from raygraph import checkpoint as ck
from raygraph.engine import spmv


def pagerank(
    graph,
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    itermax: int = 100,
    ckpt_dir: str | None = None,
    ckpt_every: int = 1,
    resume: bool = True,
    mode: str = "fused",  # "fused" (production: refs-only raw-task BSP) | "dataset" (cross-check)
    check_every: int = 1,
    weighted: bool = False,
) -> tuple[list[np.ndarray], dict]:
    """Returns (score slices per partition, info dict with iteration metrics).

    ``weighted=True``: mass splits proportionally to out-edge weights
    (w_uv / out-strength) instead of uniformly over out-neighbors —
    build the graph WITHOUT ``binarize`` so edge weights survive.
    Fused-path only (the dataset cross-check path stays the unweighted
    reference formula)."""
    if mode == "fused":
        from raygraph.fused import pagerank_fused

        return pagerank_fused(graph, damping=damping, tol=tol, itermax=itermax,
                              ckpt_dir=ckpt_dir, ckpt_every=ckpt_every, resume=resume,
                              check_every=check_every, weighted=weighted)
    if weighted:
        raise NotImplementedError("weighted pagerank: fused mode only")
    n = graph.n_vertices
    if n == 0:
        return graph.state(0.0), {"iters": 0, "residual": 0.0, "edges_traversed": 0}
    deg = graph.deg_slices()
    teleport = (1.0 - damping) / n

    r = graph.state(1.0 / n)
    it0 = 0
    history: list[dict] = []
    if ckpt_dir is not None:
        ck.save_graph(graph, ckpt_dir)
        if resume:
            last = ck.latest_iter(ckpt_dir)
            if last is not None:
                state, lineage = ck.read_iter(ckpt_dir, last, graph)
                r = state["r"]
                it0 = last + 1
                if lineage.get("residual", np.inf) <= tol:
                    return r, {
                        "iters": last + 1,
                        "residual": lineage["residual"],
                        "edges_traversed": (last + 1) * graph.nnz,
                        "resumed": True,
                        "history": history,
                    }

    residual = np.inf
    it = it0 - 1
    for it in range(it0, itermax):
        t0 = time.perf_counter()
        t = r
        # w = t/d with d = d_out/damping (absent for dangling: they simply
        # have no out-edges, so their w value is never read by the scatter)
        w = [
            np.divide(ti * damping, di, out=np.zeros_like(ti), where=di > 0)
            for ti, di in zip(t, deg)
        ]
        contrib = spmv(graph, w, "plus_second")
        r = [teleport + c for c in contrib]
        residual = float(sum(np.abs(ti - ri).sum() for ti, ri in zip(t, r)))
        wall = time.perf_counter() - t0
        history.append({"iter": it, "residual": residual, "wall_s": wall})
        if ckpt_dir is not None and (it % ckpt_every == 0 or residual <= tol):
            ck.write_iter(
                ckpt_dir,
                it,
                graph,
                {"r": r},
                {
                    "iter": it,
                    "residual": residual,
                    "edges_traversed": graph.nnz,
                    "wall_s": wall,
                    "algorithm": "pagerank_3f",
                    "damping": damping,
                    "tol": tol,
                },
            )
        if residual <= tol:
            break
    return r, {
        "iters": it + 1,
        "residual": residual,
        "edges_traversed": (it + 1) * graph.nnz,
        "history": history,
    }


def personalized_pagerank(
    graph,
    *,
    seeds=None,
    seed_pred=None,
    damping: float = 0.85,
    tol: float = 1e-6,
    itermax: int = 100,
    check_every: int = 1,
) -> tuple[list[np.ndarray], dict]:
    """Personalized PageRank: teleport mass flows back to a seed set
    instead of uniformly (r0 = p; r = (1-d)*p + d*A^T(r/deg); dangling
    mass decays exactly as in :func:`pagerank`).

    ``seeds`` is an iterable of vertex ids, or ``seed_pred`` a vectorized
    predicate over a uint64 id array (evaluated per partition slice — the
    seed set never materializes on the driver, so a billion-seed
    personalization costs one mask pass per partition). p is uniform over
    the seed set. Runs on the fused superstep engine — per-iteration cost
    identical to PageRank (the teleport operand is an array, shipped once
    as object refs).

    Reference analog: the pagerank notebook's damping/teleport structure
    (SURVEY.md §3.2) with LAGraph-style personalization."""
    from raygraph.fused import pagerank_fused

    ids = graph.ids_slices()
    if seed_pred is not None:
        masks = [np.asarray(seed_pred(s), bool) for s in ids]
    elif seeds is not None:
        seed_arr = np.unique(np.asarray(list(seeds), np.uint64))
        masks = [np.isin(s, seed_arr) for s in ids]
    else:
        raise ValueError("personalized_pagerank: need seeds or seed_pred")
    ns = sum(int(m.sum()) for m in masks)
    if ns == 0:
        raise ValueError("personalized_pagerank: empty seed set")
    p = [m.astype(np.float64) / ns for m in masks]
    return pagerank_fused(graph, damping=damping, tol=tol, itermax=itermax,
                          check_every=check_every, personalization=p)


def pagerank_dangling_fused(graph, *, damping: float = 0.85,
                            itermax: int = 8):
    """PageRank with EXACT dangling-mass redistribution — the true
    random-surfer chain (networkx ``pagerank`` semantics): each
    iteration, the mass sitting on vertices with no out-edges is
    redistributed uniformly, so Σx = 1 holds exactly at every step
    (the production ``pagerank_fused`` uses the leak formulation the
    reference notebooks use; this variant is the stochastic-complete
    one).

    Distributed shape: same task-wave structure as katz_fused — per
    live partition one scatter task (x·damping/outdeg folded in), per
    partition one bincount reduce with the iteration's scalar teleport
    β = (1−d)/n + d·dangling_mass/n folded in. The dangling mass is a
    per-partition masked sum (one float per partition per iteration,
    exactly the HITS normalization-scalar pattern); the driver holds
    refs and 1 scalar per iteration."""
    import ray

    from raygraph.fused import block_cache

    P = graph.num_parts
    sizes = [int(s) for s in graph.sizes]
    n = graph.n_vertices
    if n == 0:
        return []
    cache = block_cache(graph)

    def _setup(blk, size):
        # edges are hash-partitioned by src, so a vertex's out-edges are
        # in its OWN partition's block: invd == 0 exactly marks dangling
        invd = np.zeros(size, np.float64)
        if blk is not None:
            invd[blk["src_pos"]] = damping / blk["counts"]
        return invd, invd == 0.0

    setup_t = ray.remote(num_returns=2)(_setup)
    invd_refs, dang_refs = [], []
    for p in range(P):
        i_r, d_r = setup_t.remote(cache[p], sizes[p])
        invd_refs.append(i_r)
        dang_refs.append(d_r)

    def _dang_sum(x_p, dang_p):
        return float(x_p[dang_p].sum())

    dang_t = ray.remote(_dang_sum)

    from raygraph.fused import make_weighted_scatter

    scatter = make_weighted_scatter(P)

    def _reduce_body(size, beta, *packets):
        live = [pk for pk in packets if pk is not None]
        if live:
            pos = np.concatenate([pk[0] for pk in live])
            val = np.concatenate([pk[1] for pk in live])
            return np.bincount(pos, weights=val, minlength=size) + beta
        return np.full(size, beta, np.float64)

    reduce_t = ray.remote(_reduce_body)

    x_refs = [ray.put(np.full(s, 1.0 / n, np.float64)) for s in sizes]
    for _ in range(itermax):
        dang = float(sum(ray.get(
            [dang_t.remote(x_refs[p], dang_refs[p]) for p in range(P)])))
        beta = (1.0 - damping) / n + damping * dang / n
        pk = [[None] * P for _ in range(P)]
        for p in range(P):
            if cache[p] is None:
                continue
            outs = scatter.remote(cache[p], x_refs[p], invd_refs[p])
            if P == 1:
                outs = [outs]
            for q in range(P):
                pk[q][p] = outs[q]
        x_refs = [reduce_t.remote(sizes[q], beta, *pk[q]) for q in range(P)]

    return ray.get(x_refs)
