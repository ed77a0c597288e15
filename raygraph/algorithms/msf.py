"""Minimum spanning forest — distributed Borůvka.

Classic GraphBLAS-ecosystem recipe (LAGraph ``LAGraph_msf``; the
reference's operator set expresses it as iterated per-row min-reduce +
extract, reference core/matrix.py reduce_rowwise / select): every round
each component selects its minimum incident cross edge under the strict
total order ``(w, u, v)`` — the lexicographic tie-break makes weights
effectively distinct, so the forest is unique and equal to Kruskal's
under the same order (pinned by the chained-Borůvka DuckDB oracle and a
pytest Kruskal cross-check).

Distributed shape (per round, the driver sees only row counts):

1. **per-component min edge** — both orientations of every live edge are
   keyed by their endpoint's component id; a per-batch lexsort combiner
   keeps ONE candidate per component per batch, so the grouped exchange
   carries ≤ P rows per component no matter how hot a hub component is;
   the final argmin happens inside the bucket group.
2. **component merge** — the selected edges form a pseudo-forest over
   component ids in which each merged group contains exactly one
   2-cycle (its globally-min edge is picked from both sides). The
   2-cycle is broken toward the smaller id and parent pointers are
   resolved by pointer jumping: ``ceil(log2(#live comps)) + 1`` bucketed
   self-joins, no driver-side union-find, no broadcast.
3. **edge relabel** — live edges carry their endpoint COMPONENT ids, so
   the relabel joins against the component-level root map (which
   shrinks geometrically), not the vertex table; intra-component edges
   are dropped the moment their endpoints merge.

Rounds are O(log V); total exchange volume O(E log V) worst case with
the live edge set shrinking every round — the standard parallel-Borůvka
bound, safe at 100 TB because nothing is ever broadcast or gathered.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from raygraph.util import coalesce_blocks as _coalesce, mix64

_B = 64
_U64 = np.uint64
_GOLD = np.uint64(0x9E3779B97F4A7C15)
_EDGE, _LKP = np.int8(0), np.int8(1)


def _bk(x: np.ndarray, nb: int) -> np.ndarray:
    return (mix64(x.astype(np.uint64)) % _U64(nb)).astype(np.int32)


def _rows(nb, key, a, b, w, o, side) -> pa.Table:
    key = np.asarray(key, np.uint64)
    n = len(key)
    return pa.table({
        "bucket": _bk(key, nb),
        "key": key,
        "a": np.asarray(a, np.uint64),
        "b": np.asarray(b, np.uint64),
        "w": np.asarray(w, np.float64),
        "o": np.asarray(o, np.uint64),
        "side": np.full(n, side, np.int8),
    })


def _cols(t: pa.Table):
    g = lambda c, dt: np.asarray(  # noqa: E731
        t[c].to_numpy(zero_copy_only=False), dt)
    return (g("key", np.uint64), g("a", np.uint64), g("b", np.uint64),
            g("w", np.float64), g("o", np.uint64), g("side", np.int8))


def _first_per_key(c, u, v, w, o):
    """argmin per component id ``c`` under the (w, u, v) total order."""
    order = np.lexsort((v, u, w, c))
    c, u, v, w, o = (x[order] for x in (c, u, v, w, o))
    first = np.r_[True, c[1:] != c[:-1]] if len(c) else np.zeros(0, bool)
    return c[first], u[first], v[first], w[first], o[first]


def canonical_weighted_edges(edges, *, num_buckets: int = _B):
    """Distinct undirected weighted pairs (u < v, w = min over the two
    directed orientations), self-loops dropped — per-batch combiner
    then ONE grouped exchange keyed on a mix64 pair hash.

    Output rows are relabel-ready: key = cu = u, o = cv = v.
    """
    nb = num_buckets

    def local(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
        d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
        w = np.asarray(t["w"].to_numpy(zero_copy_only=False), np.float64)
        keep = s != d
        u = np.minimum(s, d)[keep]
        v = np.maximum(s, d)[keep]
        w = w[keep]
        order = np.lexsort((w, v, u))
        u, v, w = u[order], v[order], w[order]
        first = (np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
                 if len(u) else np.zeros(0, bool))
        u, v, w = u[first], v[first], w[first]
        with np.errstate(over="ignore"):
            key = mix64(u * _GOLD ^ v)
        return _rows(nb, key, u, v, w, v, _EDGE)

    def dedup(g: pa.Table) -> pa.Table:
        _, a, b, w, _, _ = _cols(g)
        order = np.lexsort((w, b, a))
        a, b, w = a[order], b[order], w[order]
        first = (np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
                 if len(a) else np.zeros(0, bool))
        a, b, w = a[first], b[first], w[first]
        return _rows(nb, a, a, b, w, b, _EDGE)

    return (edges.map_batches(local, batch_format="pyarrow")
            .groupby("bucket").map_groups(dedup, batch_format="pyarrow"))


def _resolve_roots(P, *, nb: int, n_comps: int):
    """2-cycle break + pointer jumping over the parent map ``P``
    (rows key=c, o=parent). Returns the root map (key=c, o=root)."""

    def scatter(t: pa.Table) -> pa.Table:
        key, _, _, _, o, _ = _cols(t)
        z = np.zeros(len(key), np.float64)
        req = _rows(nb, o, key, o, z, o, _EDGE)       # keyed by parent
        lkp = _rows(nb, key, key, key, z, o, _LKP)    # keyed by self
        return pa.concat_tables([req, lkp])

    def make_combine(break_cycles: bool):
        def combine(g: pa.Table) -> pa.Table:
            key, a, _, _, o, side = _cols(g)
            lk = side == _LKP
            lkk, lkp = key[lk], o[lk]
            order = np.argsort(lkk)
            lkk, lkp = lkk[order], lkp[order]
            rq = side == _EDGE
            c, p = a[rq], key[rq]
            idx = np.searchsorted(lkk, p)
            if len(c) and (idx.max(initial=0) >= len(lkk)
                           or not np.array_equal(lkk[np.minimum(
                               idx, len(lkk) - 1)], p)):
                raise RuntimeError("msf: parent map lookup miss")
            pp = lkp[idx] if len(c) else np.zeros(0, np.uint64)
            if break_cycles:
                newp = np.where(pp == c, np.minimum(c, p), pp)
            else:
                newp = pp
            z = np.zeros(len(c), np.float64)
            return _rows(nb, c, c, c, z, newp, _LKP)
        return combine

    jumps = max(1, math.ceil(math.log2(max(2, n_comps)))) + 1
    for i in range(jumps):
        P = _coalesce(
            P.map_batches(scatter, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(make_combine(i == 0), batch_format="pyarrow")
             .materialize(), max(4, nb // 2))
    return P


def minimum_spanning_forest(edges, *, num_buckets: int = _B,
                            max_rounds: int = 48):
    """MSF edge Dataset (columns u, v, w — uint64/uint64/float64,
    u < v) of the undirected simple graph underlying the weighted
    directed edge table ``edges`` (columns src, dst, w)."""
    nb = num_buckets
    live = _coalesce(canonical_weighted_edges(edges, num_buckets=nb)
                     .materialize(), max(4, nb // 2))
    forest_parts: list = []

    for _ in range(max_rounds):
        if live.count() == 0:
            break

        # --- 1. per-component min cross edge -------------------------
        def incident(t: pa.Table) -> pa.Table:
            key, a, b, w, o, _ = _cols(t)          # key=cu, o=cv
            c = np.concatenate([key, o])
            oc = np.concatenate([o, key])
            u = np.concatenate([a, a])
            v = np.concatenate([b, b])
            ww = np.concatenate([w, w])
            c, u, v, ww, oc = _first_per_key(c, u, v, ww, oc)
            return _rows(nb, c, u, v, ww, oc, _EDGE)

        def pick(g: pa.Table) -> pa.Table:
            key, a, b, w, o, _ = _cols(g)
            c, u, v, ww, oc = _first_per_key(key, a, b, w, o)
            return _rows(nb, c, u, v, ww, oc, _EDGE)

        sel = _coalesce(
            live.map_batches(incident, batch_format="pyarrow")
                .groupby("bucket").map_groups(pick, batch_format="pyarrow")
                .materialize(), max(4, nb // 2))
        n_comps = sel.count()

        def sel_edges(t: pa.Table) -> pa.Table:
            _, a, b, w, _, _ = _cols(t)
            return pa.table({"u": a, "v": b, "w": w})

        forest_parts.append(
            sel.map_batches(sel_edges, batch_format="pyarrow"))

        # --- 2. component merge: parent map -> pointer jumping --------
        # sel rows: key = c, o = other endpoint's component = parent
        roots = _resolve_roots(sel, nb=nb, n_comps=n_comps)

        # --- 3. relabel live edges against the component root map ----
        def lift_pass2(g: pa.Table) -> pa.Table:
            key, a, b, w, o, side = _cols(g)       # key=cu, o=cv
            lk = side == _LKP
            lkk, lkr = key[lk], o[lk]
            order = np.argsort(lkk)
            lkk, lkr = lkk[order], lkr[order]
            eg = side == _EDGE
            cu, u, v, w, cv = key[eg], a[eg], b[eg], w[eg], o[eg]
            idx = np.searchsorted(lkk, cu)
            if len(cu) and (idx.max(initial=0) >= len(lkk)
                            or not np.array_equal(lkk[np.minimum(
                                idx, len(lkk) - 1)], cu)):
                raise RuntimeError("msf: root map lookup miss")
            ncu = lkr[idx] if len(cu) else np.zeros(0, np.uint64)
            # re-key by the OTHER endpoint's old component for pass 2
            return _rows(nb, cv, u, v, w, ncu, _EDGE)

        def finish(g: pa.Table) -> pa.Table:
            key, a, b, w, o, side = _cols(g)       # key=cv, o=cu'
            lk = side == _LKP
            lkk, lkr = key[lk], o[lk]
            order = np.argsort(lkk)
            lkk, lkr = lkk[order], lkr[order]
            eg = side == _EDGE
            cv, u, v, w, ncu = key[eg], a[eg], b[eg], w[eg], o[eg]
            idx = np.searchsorted(lkk, cv)
            if len(cv) and (idx.max(initial=0) >= len(lkk)
                            or not np.array_equal(lkk[np.minimum(
                                idx, len(lkk) - 1)], cv)):
                raise RuntimeError("msf: root map lookup miss")
            ncv = lkr[idx] if len(cv) else np.zeros(0, np.uint64)
            keep = ncu != ncv
            return _rows(nb, ncu[keep], u[keep], v[keep], w[keep],
                         ncv[keep], _EDGE)

        live = _coalesce(
            live.union(roots).groupby("bucket")
                .map_groups(lift_pass2, batch_format="pyarrow")
                .union(roots).groupby("bucket")
                .map_groups(finish, batch_format="pyarrow")
                .materialize(), max(4, nb // 2))

    if not forest_parts:
        return None

    # --- final global dedup (an edge can be selected from both sides
    # in the same round) — ONE grouped exchange on the pair hash ------
    out = forest_parts[0]
    for p in forest_parts[1:]:
        out = out.union(p)

    def pair_key(t: pa.Table) -> pa.Table:
        u = np.asarray(t["u"].to_numpy(zero_copy_only=False), np.uint64)
        v = np.asarray(t["v"].to_numpy(zero_copy_only=False), np.uint64)
        w = np.asarray(t["w"].to_numpy(zero_copy_only=False), np.float64)
        with np.errstate(over="ignore"):
            key = mix64(u * _GOLD ^ v)
        return _rows(nb, key, u, v, w, v, _EDGE)

    def uniq(g: pa.Table) -> pa.Table:
        _, a, b, w, _, _ = _cols(g)
        order = np.lexsort((b, a))
        a, b, w = a[order], b[order], w[order]
        first = (np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
                 if len(a) else np.zeros(0, bool))
        return pa.table({"u": a[first], "v": b[first], "w": w[first]})

    return (out.map_batches(pair_key, batch_format="pyarrow")
            .groupby("bucket").map_groups(uniq, batch_format="pyarrow"))
