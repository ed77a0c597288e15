"""Strongly connected components — distributed color-propagation SCC
(the classic coloring / forward-backward algorithm of Orzan 2004 and
Slota-Rajamanickam-Madduri 2014), fused supersteps over BOTH the graph
and its transpose block caches.

Reference-ecosystem counterpart: NetworkX ``strongly_connected_
components`` semantics — each vertex labeled with the MINIMUM vertex id
of its SCC (so labels are canonical and exactly comparable).

Algorithm (per round, on the still-unassigned subgraph):

1. **Color fixpoint**: C(v) ← min(id(v), min_{v→u} C(u)) iterated to
   fixpoint — C(v) is the minimum id FORWARD-reachable from v. Each
   sweep pulls from out-neighbors, i.e. one task wave over the
   TRANSPOSED graph's blocks (scatter over gT routes x[dst] to src).
2. **Roots**: every v with C(v) = id(v) is a root (it is the minimum of
   its own forward closure, hence the minimum of its SCC).
3. **Containment fixpoint**: propagate a flag FORWARD from each root
   simultaneously, restricted to the root's color class: v becomes
   flagged when some in-neighbor u is flagged with C(u) = C(v). For an
   edge u→v the closure gives C(u) ≤ C(v), so "any incoming flagged
   color equals mine" ≡ "MAX incoming flagged color equals mine" — one
   max.reduceat wave over the graph's own blocks per sweep.
4. **Assign**: flagged vertices v satisfy C(v)→*v and v→*C(v), so
   scc(v) = C(v); deactivate them and repeat. Every SCC whose root is
   locally minimal in its color class resolves per round — a DAG of
   singletons resolves in ONE round (all colors distinct); the worst
   case is a chain of k non-trivial SCCs (k rounds), bounded by
   ``max_rounds``.

Distributed shape (the part that must survive 100 TB): identical task-
wave structure to pagerank/hits/katz — per live partition one scatter
task emitting P positional packets, per partition one reduce task; per
sweep only P booleans (changed flags) return to the driver; per round
only P ints (active counts). Per-partition state (scc, active, color,
flag) lives in the object store as one ref per partition; the driver
never holds a vertex array. Assigned vertices send the min-neutral
U64MAX (color wave) / 0 (flag wave), so no compaction is needed —
rounds shrink work, not layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raygraph.fused import U64MAX, block_cache
from raygraph.ops import MONOID, local_combine


def scc_fused(g, gT, *, max_rounds: int = 64, max_sweeps: int = 4096):
    """Returns per-partition dense uint64 SCC labels (min member id) in
    ``g``'s layout. ``g`` and ``gT`` must share vertex universe,
    num_parts and layout (same check as hits_fused)."""
    import ray

    P = g.num_parts
    if gT.num_parts != P or gT.n_vertices != g.n_vertices or not np.array_equal(
            np.asarray(g.sizes), np.asarray(gT.sizes)):
        raise ValueError("scc_fused: g and gT must share vertex universe, "
                         "num_parts and layout")
    sizes = [int(s) for s in g.sizes]
    if g.n_vertices == 0:
        return []
    cacheF = block_cache(gT)  # color wave: v pulls C from out-neighbors
    cacheB = block_cache(g)   # flag wave: v pulls flags from in-neighbors
    ids = g.ids_slices()

    def _scatter_min(blk, x_p):
        xv = np.repeat(x_p[blk["src_pos"]], blk["counts"])
        valp = xv[blk["perm"]]
        out = [None] * P
        for q, s0, e0, starts_rel, out_pos in blk["segs"]:
            out[q] = (out_pos, np.minimum.reduceat(valp[s0:e0], starts_rel))
        return out

    def _scatter_max(blk, x_p):
        xv = np.repeat(x_p[blk["src_pos"]], blk["counts"])
        valp = xv[blk["perm"]]
        out = [None] * P
        for q, s0, e0, starts_rel, out_pos in blk["segs"]:
            out[q] = (out_pos, np.maximum.reduceat(valp[s0:e0], starts_rel))
        return out

    def _color_send(state):
        scc_p, active_p, color_p, flag_p = state
        return np.where(active_p, color_p, U64MAX)

    def _flag_send(state):
        scc_p, active_p, color_p, flag_p = state
        # flagged implies active implies color == some live id < U64MAX,
        # so color+1 never wraps; 0 is the max-neutral "no flag"
        return np.where(flag_p, color_p + np.uint64(1), np.uint64(0))

    if P > 1:
        sc_min = ray.remote(num_returns=P)(
            lambda blk, st: tuple(_scatter_min(blk, _color_send(st))))
        sc_max = ray.remote(num_returns=P)(
            lambda blk, st: tuple(_scatter_max(blk, _flag_send(st))))
    else:
        sc_min = ray.remote(lambda blk, st: _scatter_min(blk, _color_send(st))[0])
        sc_max = ray.remote(lambda blk, st: _scatter_max(blk, _flag_send(st))[0])

    def _gather(pos_vals, combine_op):
        live = [pk for pk in pos_vals if pk is not None]
        if not live:
            return None, None
        pos = np.concatenate([pk[0] for pk in live])
        val = np.concatenate([pk[1] for pk in live])
        return local_combine(combine_op, pos, val)

    def _init_round(ids_q, state):
        scc_q, active_q, _c, _f = state
        color = np.where(active_q, ids_q, U64MAX)
        return (scc_q, active_q, color, np.zeros(len(ids_q), bool))

    init_round = ray.remote(_init_round)

    def _color_reduce(state, *packets):
        scc_q, active_q, color_q, flag_q = state
        upos, umin = _gather(packets, MONOID["min"])
        changed = False
        if upos is not None and len(upos):
            sel = active_q[upos]
            cand = np.minimum(color_q[upos[sel]], umin[sel])
            changed = bool((cand != color_q[upos[sel]]).any())
            if changed:
                color_q = color_q.copy()
                color_q[upos[sel]] = cand
        return (scc_q, active_q, color_q, flag_q), changed

    color_reduce = ray.remote(num_returns=2)(_color_reduce)

    def _roots(ids_q, state):
        scc_q, active_q, color_q, _f = state
        return (scc_q, active_q, color_q, active_q & (color_q == ids_q))

    roots = ray.remote(_roots)

    def _flag_reduce(state, *packets):
        scc_q, active_q, color_q, flag_q = state
        upos, umax = _gather(packets, MONOID["max"])
        changed = False
        if upos is not None and len(upos):
            hit = (active_q[upos] & ~flag_q[upos]
                   & (umax == color_q[upos] + np.uint64(1)))
            changed = bool(hit.any())
            if changed:
                flag_q = flag_q.copy()
                flag_q[upos[hit]] = True
        return (scc_q, active_q, color_q, flag_q), changed

    flag_reduce = ray.remote(num_returns=2)(_flag_reduce)

    def _assign(state):
        scc_q, active_q, color_q, flag_q = state
        scc_q = np.where(flag_q, color_q, scc_q)
        active_q = active_q & ~flag_q
        return (scc_q, active_q, color_q, np.zeros(len(flag_q), bool)), \
            int(active_q.sum())

    assign = ray.remote(num_returns=2)(_assign)

    def sweep(cache, scatter, reducer, st_refs):
        pk = [[None] * P for _ in range(P)]
        for p in range(P):
            if cache[p] is None:
                continue
            outs = scatter.remote(cache[p], st_refs[p])
            if P == 1:
                outs = [outs]
            for q in range(P):
                pk[q][p] = outs[q]
        nxt, chg = [], []
        for q in range(P):
            sr, cr = reducer.remote(st_refs[q], *pk[q])
            nxt.append(sr)
            chg.append(cr)
        return nxt, any(ray.get(chg))

    st = [ray.put((np.full(s, U64MAX, np.uint64), np.ones(s, bool),
                   np.full(s, U64MAX, np.uint64), np.zeros(s, bool)))
          for s in sizes]
    ids_refs = [ray.put(i) for i in ids]
    sweeps_left = max_sweeps

    def run_fixpoint(cache, scatter, reducer, st):
        nonlocal sweeps_left
        while True:
            if sweeps_left <= 0:
                raise RuntimeError(
                    f"scc_fused: color/flag fixpoint not reached within "
                    f"max_sweeps={max_sweeps} — raise the bound")
            sweeps_left -= 1
            st, changed = sweep(cache, scatter, reducer, st)
            if not changed:
                return st

    for _ in range(max_rounds):
        st = [init_round.remote(ids_refs[q], st[q]) for q in range(P)]
        st = run_fixpoint(cacheF, sc_min, color_reduce, st)
        st = [roots.remote(ids_refs[q], st[q]) for q in range(P)]
        st = run_fixpoint(cacheB, sc_max, flag_reduce, st)
        pairs = [assign.remote(st[q]) for q in range(P)]
        st = [p[0] for p in pairs]
        n_active = sum(ray.get([p[1] for p in pairs]))
        if n_active == 0:
            return [s[0] for s in ray.get(st)]
    raise RuntimeError(
        f"scc_fused: {n_active} vertices unassigned after {max_rounds} "
        f"rounds / {max_sweeps - sweeps_left} sweeps (SCC chain deeper "
        "than max_rounds — raise the bound)")


def condensation(g, label_slices, edges, *, count_edges: bool = True):
    """Condensed DAG of the strongly connected components: one row per
    distinct inter-component edge ``(cfrom, cto, n_edges)`` where
    labels come from :func:`scc_fused` (min member id — canonical).

    Scale shape: the label vector is O(V) ≪ O(E) — shipped ONCE via
    ``ray.put`` (same broadcast regime as the metrics degree lookups,
    bounded like graph.build's GRAFT_BROADCAST_VERTS_MAX path; at
    extreme V swap for a bucketed label join, same call shape). Each
    edge batch resolves both endpoints with two zero-copy searchsorted
    lookups and locally combines duplicate component pairs, so the one
    ``groupby(pair).sum`` shuffle carries per-batch distinct pairs —
    bounded by the (much smaller) condensation, not the edge stream.
    """
    import ray

    from raygraph import kernels as K

    ids = np.concatenate(g.ids_slices())
    lab = np.concatenate([np.asarray(s, np.uint64) for s in label_slices])
    o = np.argsort(ids)
    ids_ref = ray.put(ids[o])
    lab_ref = ray.put(lab[o])

    def m(t, _i=ids_ref, _l=lab_ref):
        ids_a = ray.get(_i)
        lab_a = ray.get(_l)
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
        d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
        ls = lab_a[np.searchsorted(ids_a, s)]
        ld = lab_a[np.searchsorted(ids_a, d)]
        keep = ls != ld
        ls, ld = ls[keep], ld[keep]
        if len(ls) == 0:
            return pa.table({"cfrom": pa.array([], pa.int64()),
                             "cto": pa.array([], pa.int64()),
                             "n_edges": pa.array([], pa.int64())})
        order = np.lexsort((ld, ls))
        ls, ld = ls[order], ld[order]
        starts = np.flatnonzero(np.r_[True, (ls[1:] != ls[:-1])
                                      | (ld[1:] != ld[:-1])])
        cnt = np.diff(np.r_[starts, len(ls)])
        return pa.table({"cfrom": ls[starts].astype(np.int64),
                         "cto": ld[starts].astype(np.int64),
                         "n_edges": cnt.astype(np.int64)})

    agg = (K._ds(edges).map_batches(m, batch_format="pyarrow")
           .groupby(["cfrom", "cto"]).sum("n_edges"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"cfrom": t["cfrom"], "cto": t["cto"],
                         "n_edges": t["sum(n_edges)"].cast(pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow").sort(
        key=["cfrom", "cto"])


def bowtie(edges, *, num_parts: int = 16) -> pa.Table:
    """Bow-tie decomposition (Broder et al. 2000) of the directed
    simple graph under a deduped (src, dst, w) edge Dataset: CORE =
    largest SCC (ties → smallest label), IN = vertices reaching the
    core, OUT = vertices reached from it, OTHER = tendrils / tubes /
    disconnected. The core is strongly connected, so reach(core) =
    reach(r) for any representative r — one distributed SCC labeling
    plus ONE forward and ONE backward sparse-frontier fused BFS from
    the core's smallest member. Returns (v, cls) sorted by v."""
    from raygraph.algorithms.paths import bfs_levels
    from raygraph.graph import build_graph

    from raygraph import kernels as K

    eds = edges.materialize()
    g = build_graph(eds, num_parts=num_parts, dup_op="first", binarize=True)
    gT = build_graph(K.transpose(eds), num_parts=num_parts,
                     dup_op="first", binarize=True)
    labels = scc_fused(g, gT)
    lt = g.to_vertex_table(labels, "scc")
    v = np.asarray(lt["v"].to_numpy(zero_copy_only=False)).astype(np.uint64)
    lab = np.asarray(lt["scc"].to_numpy(zero_copy_only=False)).astype(np.uint64)
    ul, cnt = np.unique(lab, return_counts=True)
    core_lab = ul[cnt == cnt.max()].min()
    r = int(v[lab == core_lab].min())

    def reached(graph) -> np.ndarray:
        dist, _ = bfs_levels(graph, r)
        t = graph.to_vertex_table(dist, "dist")
        rv = np.asarray(t["v"].to_numpy(zero_copy_only=False)).astype(np.uint64)
        d = np.asarray(t["dist"].to_numpy(zero_copy_only=False))
        return rv[np.isfinite(d)]

    fwd, bwd = reached(g), reached(gT)
    is_core = lab == core_lab
    cls = np.where(is_core, "core",
                   np.where(np.isin(v, fwd), "out",
                            np.where(np.isin(v, bwd), "in", "other")))
    return pa.table({"v": v.astype(np.int64),
                     "cls": pa.array(cls.tolist(), pa.string())}) \
        .sort_by([("v", "ascending")])
