"""Edge support (k-truss support counts) and k-core decomposition.

Both operate on the undirected simple graph underlying any directed
edge table: self-loops dropped, duplicates collapsed, each edge stored
in both directions. These are the classic GraphBLAS subgraph-mining
recipes (reference ecosystem: graphblas-algorithms ``k_truss`` /
``core_number``): edge support is ONE masked sparse matmul
``C(A) << A @ A`` with the plus_pair semiring, and k-core is repeated
degree-filtering to a fixpoint.

Distributed shape (the part that must survive 100 TB):

* ``sym_edges`` is the same bucketed distinct-pair shuffle used by the
  triangle counter — per-batch local dedup (combiner) before the ONE
  grouped exchange; nothing is broadcast.
* ``edge_support`` delegates to :func:`raygraph.kernels.mxm` with the
  full symmetric edge set as the structural mask, so the wedge-vs-dot
  auto-selection and its intermediate-volume bound apply unchanged.
* ``kcore`` does TWO grouped exchanges per peel round and nothing on
  the driver but a row-count convergence check: round r buckets edges
  by ``src`` (all edges of a vertex land in one group, so its degree
  is computed *inside* the group and the src-side filter is free),
  emits surviving edges plus one survivor-vertex row per kept vertex,
  then re-buckets by ``dst`` and semi-joins edges against the survivor
  rows riding the same shuffle. The simultaneous-degree rule (both
  endpoint degrees measured BEFORE this round's removals) matches the
  textbook peel and the recursive-SQL oracle round for round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raygraph import kernels as K
from raygraph.util import mix64

_B = 64  # shuffle buckets, same default as the triangle counter


def sym_edges(edges, *, num_buckets: int = _B):
    """Distinct symmetric, self-loop-free edge Dataset (src, dst, w=1.0).

    Per-batch local dedup on the unordered pair, ONE bucketed grouped
    exchange keyed on a mix64 pair hash (full-range uint64 ids), then
    each surviving undirected pair is emitted in both directions.
    """

    def to_pairs(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
        d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
        keep = s != d
        s, d = s[keep], d[keep]
        hi, lo = np.maximum(s, d), np.minimum(s, d)
        order = np.lexsort((lo, hi))
        hi, lo = hi[order], lo[order]
        new = np.r_[True, (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])]
        hi, lo = hi[new], lo[new]
        with np.errstate(over="ignore"):
            bk = (mix64(hi * np.uint64(0x9E3779B97F4A7C15) ^ lo)
                  % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({"bucket": bk, "src": hi, "dst": lo})

    def both_dirs(g: pa.Table) -> pa.Table:
        hi = np.asarray(g["src"].to_numpy(zero_copy_only=False), np.uint64)
        lo = np.asarray(g["dst"].to_numpy(zero_copy_only=False), np.uint64)
        order = np.lexsort((lo, hi))
        hi, lo = hi[order], lo[order]
        new = np.r_[True, (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])]
        hi, lo = hi[new], lo[new]
        return pa.table({
            "src": np.concatenate([hi, lo]),
            "dst": np.concatenate([lo, hi]),
            "w": np.ones(2 * len(hi), np.float64),
        })

    return (
        K._ds(edges)
        .map_batches(to_pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(both_dirs, batch_format="pyarrow")
    )


def edge_support(edges, *, num_buckets: int = _B):
    """Per-edge triangle support |N(u) ∩ N(v)| of the underlying simple
    undirected graph — the k-truss building block.

    The recipe is literally ``C(A) << A.mxm(A)`` on the symmetric
    binarized adjacency (plus_pair ≡ plus_times at w=1.0), upper
    triangle reported: one masked matmul, auto wedge/dot mode.
    Returns (src, dst, support) for edges with support >= 1; edges in
    no triangle are structural zeros, exactly as in the masked-mxm
    output.
    """
    sym = sym_edges(edges, num_buckets=num_buckets).materialize()
    prod = K.mxm(sym, sym, "plus_times", mask=sym)

    def upper(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
        d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
        w = np.asarray(t["w"].to_numpy(zero_copy_only=False), np.float64)
        keep = s < d
        return pa.table({
            "src": s[keep].astype(np.int64),
            "dst": d[keep].astype(np.int64),
            "support": np.rint(w[keep]).astype(np.int64),
        })

    return K._ds(prod).map_batches(upper, batch_format="pyarrow")


def kcore(edges, k: int, *, num_buckets: int = _B, max_rounds: int = 64):
    """Vertices of the k-core: the maximal subgraph in which every
    vertex has degree >= k (undirected simple graph).

    Peels with the simultaneous rule — each round drops every edge
    with either endpoint's *start-of-round* degree < k — until the
    edge count is stable. Two grouped exchanges per round, driver does
    only the O(1) convergence count. Returns a (v:int64) Dataset,
    empty when the k-core is empty.
    """
    if k < 1:
        raise ValueError("kcore: k must be >= 1")

    def by_src(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
        return t.append_column(
            "bucket", pa.array((s % np.uint64(num_buckets)).astype(np.int32)))

    def peel_src(g: pa.Table) -> pa.Table:
        """All edges of each src vertex are in this group: compute its
        degree locally, keep edges of surviving srcs, and emit one
        side=0 survivor row per kept vertex for the dst-side pass."""
        s = np.asarray(g["src"].to_numpy(zero_copy_only=False), np.uint64)
        d = np.asarray(g["dst"].to_numpy(zero_copy_only=False), np.uint64)
        if len(s) == 0:
            return pa.table({"side": pa.array([], pa.int8()),
                             "src": pa.array([], pa.uint64()),
                             "dst": pa.array([], pa.uint64())})
        uniq, inv, cnt = np.unique(s, return_inverse=True, return_counts=True)
        keep = (cnt >= k)[inv]
        surv = uniq[cnt >= k]
        return pa.table({
            "side": np.r_[np.ones(keep.sum(), np.int8),
                          np.zeros(len(surv), np.int8)],
            "src": np.concatenate([s[keep], surv]),
            "dst": np.concatenate([d[keep], np.zeros(len(surv), np.uint64)]),
        })

    def by_dst(t: pa.Table) -> pa.Table:
        side = np.asarray(t["side"].to_numpy(zero_copy_only=False), np.int8)
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
        d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
        key = np.where(side == 1, d, s)
        return t.append_column(
            "bucket", pa.array((key % np.uint64(num_buckets)).astype(np.int32)))

    def filter_dst(g: pa.Table) -> pa.Table:
        side = np.asarray(g["side"].to_numpy(zero_copy_only=False), np.int8)
        s = np.asarray(g["src"].to_numpy(zero_copy_only=False), np.uint64)
        d = np.asarray(g["dst"].to_numpy(zero_copy_only=False), np.uint64)
        surv = np.sort(s[side == 0])
        es, ed = s[side == 1], d[side == 1]
        if len(surv) == 0 or len(es) == 0:
            return pa.table({"src": es[:0], "dst": ed[:0]})
        pos = np.searchsorted(surv, ed).clip(max=len(surv) - 1)
        ok = surv[pos] == ed
        return pa.table({"src": es[ok], "dst": ed[ok]})

    cur = sym_edges(edges, num_buckets=num_buckets).select_columns(
        ["src", "dst"]).materialize()
    n_edges = cur.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        nxt = (
            cur.map_batches(by_src, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(peel_src, batch_format="pyarrow")
            .map_batches(by_dst, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(filter_dst, batch_format="pyarrow")
            .materialize()
        )
        n_next = nxt.count()
        cur = nxt
        if n_next == n_edges:
            break
        n_edges = n_next

    def verts(t: pa.Table) -> pa.Table:
        s = np.unique(np.asarray(t["src"].to_numpy(zero_copy_only=False),
                                 np.uint64))
        return pa.table({
            "bucket": (s % np.uint64(num_buckets)).astype(np.int32),
            "v": s.astype(np.int64),
        })

    def uniq(g: pa.Table) -> pa.Table:
        v = np.unique(np.asarray(g["v"].to_numpy(zero_copy_only=False),
                                 np.int64))
        return pa.table({"v": v})

    if n_edges == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({"v": pa.array([], pa.int64())}))
    return (
        cur.map_batches(verts, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(uniq, batch_format="pyarrow")
    )


def ktruss(edges, k: int, *, num_buckets: int = _B, max_rounds: int = 16):
    """Edges of the k-truss: the maximal subgraph in which every edge
    participates in at least ``k - 2`` triangles (undirected simple
    graph). Classic GraphBLAS recipe (reference ecosystem:
    graphblas-algorithms ``k_truss``): repeat the masked matmul
    ``C(A) << A @ A`` (edge support) and drop edges below ``k - 2``,
    simultaneously, to a fixpoint.

    Distributed shape: each round is ONE masked mxm (wedge/dot
    auto-selection and its intermediate bound apply, kernels.py:2180)
    plus a vectorized filter; the driver sees only a per-round edge
    count for the convergence check. Peeling is monotone, so a
    converged state is stable — ``max_rounds`` mirrors the oracle's
    unroll depth and is far past fixpoint at any tested scale.

    Returns the truss's upper-triangle edge table (src < dst).
    """
    kk = max(k - 2, 0)
    sym = sym_edges(edges, num_buckets=num_buckets).materialize()
    n_prev = sym.count()
    rounds = 0
    for _ in range(max_rounds):
        if n_prev == 0:
            break
        prod = K.mxm(sym, sym, "plus_times", mask=sym)

        def keep(t: pa.Table) -> pa.Table:
            w = np.asarray(t["w"].to_numpy(zero_copy_only=False), np.float64)
            m = np.rint(w).astype(np.int64) >= kk
            return pa.table({
                "src": np.asarray(t["src"].to_numpy(zero_copy_only=False),
                                  np.uint64)[m],
                "dst": np.asarray(t["dst"].to_numpy(zero_copy_only=False),
                                  np.uint64)[m],
                "w": np.ones(int(m.sum()), np.float64),
            })

        sym = K._ds(prod).map_batches(keep,
                                      batch_format="pyarrow").materialize()
        n = sym.count()
        rounds += 1
        if n == n_prev:
            break
        n_prev = n

    def upper(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
        d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
        m = s < d
        return pa.table({"src": s[m].astype(np.int64),
                         "dst": d[m].astype(np.int64)})

    return K._ds(sym).map_batches(upper, batch_format="pyarrow")
