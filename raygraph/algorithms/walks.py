"""Deterministic random-walk sampling (DeepWalk / node2vec p=q=1 prep).

A walk step from vertex ``cur`` at step ``t`` moves to the out-neighbor
``u`` minimizing ``mix64((cur * K1) ^ (t * K2) ^ u)`` — a splitmix64-keyed
choice that is uniform-ish over neighbors, fully deterministic, and
collision-free (for fixed ``(cur, t)`` the pre-mix input is a bijection
of ``u``, and mix64 is itself a bijection, so argmin ties cannot occur).
Determinism is what makes the op oracle-checkable and makes re-runs of a
100 TB sampling job reproducible partition by partition.

Distributed shape: the frontier (one row per live walk) cogroups with
the distinct edge set through ONE bucketed grouped exchange per step,
keyed on ``mix64(src)`` — each group sees every out-edge of its vertices
plus the walks currently standing on them, so the per-walk argmin is
computed inside the group with searchsorted ranges (no driver loop, no
broadcast). Walks at dead ends simply emit no next row. Edges are
re-bucketed per step — for few-step sampling (the common training-data
case) that is steps × one-shuffle; a long-walk production variant would
pin per-bucket CSR blocks as object refs like the fused BSP engine
(fused.py) and route only frontiers.

Reference analog: the reference exposes no walk sampler; semantics are
the standard DeepWalk corpus-generation step (Perozzi et al. 2014)
restated as a deterministic hash choice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raygraph import kernels as K
from raygraph.util import mix64

_B = 64
_K1 = np.uint64(0x9E3779B97F4A7C15)
_K2 = np.uint64(0xD1B54A32D192ED03)
_U64 = np.uint64


def _step_key(cur: np.ndarray, step: int, nbr: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        salt = _U64(step) * _K2
        return mix64((cur * _K1) ^ salt ^ nbr)


def random_walks(edges, *, start_pred=None, starts=None, steps: int = 4,
                 num_buckets: int = _B):
    """Walk ``steps`` hash-driven steps from each start vertex over the
    distinct directed edge set. Returns a Dataset of
    ``(start, step, v)`` — step 0 is the start itself; a walk that
    reaches a vertex with no out-edges stops emitting.

    ``start_pred`` is a vectorized predicate over a uint64 id array
    (evaluated inside batches — the start set never touches the driver);
    ``starts`` an explicit id iterable for small seed sets.
    """
    if (start_pred is None) == (starts is None):
        raise ValueError("random_walks: exactly one of start_pred/starts")
    if starts is not None:
        seed_arr = np.unique(np.asarray(list(starts), np.uint64))
        start_pred = lambda ids: np.isin(ids, seed_arr)  # noqa: E731

    def to_ebin(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
        d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        new = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
        s, d = s[new], d[new]
        bk = (mix64(s) % _U64(num_buckets)).astype(np.int32)
        # side 0 = edge rows: key = src, a = dst
        return pa.table({"bucket": bk, "key": s, "a": d,
                         "b": np.zeros(len(s), np.uint64),
                         "side": np.zeros(len(s), np.int8)})

    ebin = K._ds(edges).map_batches(to_ebin, batch_format="pyarrow").materialize()

    def to_starts(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
        d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
        v = np.unique(np.concatenate([s, d]))
        v = v[np.asarray(start_pred(v), bool)]
        bk = (mix64(v) % _U64(num_buckets)).astype(np.int32)
        # side 1 = walk rows: key = cur, a = start
        return pa.table({"bucket": bk, "key": v, "a": v,
                         "b": np.zeros(len(v), np.uint64),
                         "side": np.ones(len(v), np.int8)})

    def dedup_starts(g: pa.Table) -> pa.Table:
        v = np.unique(np.asarray(g["key"].to_numpy(zero_copy_only=False),
                                 np.uint64))
        bk = (mix64(v) % _U64(num_buckets)).astype(np.int32)
        return pa.table({"bucket": bk, "key": v, "a": v,
                         "b": np.zeros(len(v), np.uint64),
                         "side": np.ones(len(v), np.int8)})

    # coalesce after every grouped exchange: the frontier's real content
    # is one row per live walk, but Ray's sort-shuffle emits ~input-many
    # mostly-empty blocks — left alone, each step unions the previous
    # step's empties and task-scheduling overhead (not data) dominates
    _RP = 16

    frontier = (K._ds(edges).map_batches(to_starts, batch_format="pyarrow")
                .groupby("bucket").map_groups(dedup_starts,
                                              batch_format="pyarrow")
                .repartition(_RP))

    def out_rows(start: np.ndarray, step: int, v: np.ndarray) -> pa.Table:
        return pa.table({"start": start.astype(np.int64),
                         "step": np.full(len(start), step, np.int64),
                         "v": v.astype(np.int64)})

    def emit0(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False), np.uint64)
        return out_rows(a, 0, a)

    outputs = [frontier.map_batches(emit0, batch_format="pyarrow")]

    for t_step in range(1, steps + 1):
        def advance(g: pa.Table, _t=t_step) -> pa.Table:
            side = np.asarray(g["side"].to_numpy(zero_copy_only=False))
            key = np.asarray(g["key"].to_numpy(zero_copy_only=False), np.uint64)
            a = np.asarray(g["a"].to_numpy(zero_copy_only=False), np.uint64)
            esrc, edst = key[side == 0], a[side == 0]
            wcur, wstart = key[side == 1], a[side == 1]
            if len(wcur) == 0 or len(esrc) == 0:
                return pa.table({"bucket": pa.array([], pa.int32()),
                                 "key": pa.array([], pa.uint64()),
                                 "a": pa.array([], pa.uint64()),
                                 "b": pa.array([], pa.uint64()),
                                 "side": pa.array([], pa.int8())})
            order = np.argsort(esrc, kind="stable")
            esrc, edst = esrc[order], edst[order]
            lo = np.searchsorted(esrc, wcur, side="left")
            hi = np.searchsorted(esrc, wcur, side="right")
            cnt = hi - lo
            live = cnt > 0
            wcur, wstart, lo, cnt = wcur[live], wstart[live], lo[live], cnt[live]
            if len(wcur) == 0:
                return pa.table({"bucket": pa.array([], pa.int32()),
                                 "key": pa.array([], pa.uint64()),
                                 "a": pa.array([], pa.uint64()),
                                 "b": pa.array([], pa.uint64()),
                                 "side": pa.array([], pa.int8())})
            total = int(cnt.sum())
            rep = np.repeat(np.arange(len(wcur)), cnt)
            idx = np.repeat(lo, cnt) + (np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt))
            h = _step_key(wcur[rep], _t, edst[idx])
            # per-walk argmin via (rep, h) lexsort + first-of-group
            o = np.lexsort((h, rep))
            first = np.r_[True, rep[o][1:] != rep[o][:-1]]
            nxt = edst[idx][o][first]
            st = wstart[rep][o][first]
            bk = (mix64(nxt) % _U64(num_buckets)).astype(np.int32)
            return pa.table({"bucket": bk, "key": nxt, "a": st,
                             "b": np.zeros(len(nxt), np.uint64),
                             "side": np.ones(len(nxt), np.int8)})

        frontier = (ebin.union(frontier).groupby("bucket")
                    .map_groups(advance, batch_format="pyarrow")
                    .repartition(_RP).materialize())

        def emit(t: pa.Table, _t=t_step) -> pa.Table:
            st = np.asarray(t["a"].to_numpy(zero_copy_only=False), np.uint64)
            v = np.asarray(t["key"].to_numpy(zero_copy_only=False), np.uint64)
            return out_rows(st, _t, v)

        outputs.append(frontier.map_batches(emit, batch_format="pyarrow"))

    out = outputs[0]
    for o in outputs[1:]:
        out = out.union(o)
    return out


def walk_skipgram_pairs(edges, *, start_pred=None, starts=None,
                        steps: int = 8, window: int = 2,
                        num_buckets: int = _B):
    """DeepWalk corpus → skip-gram pairs: generate deterministic walks,
    then count ordered vertex pairs ``(walk[i], walk[i+d])`` for
    ``1 <= d <= window`` across all walks — the full embedding-training
    prep composition (Perozzi et al. 2014) in two stages.

    Pair generation groups each walk's rows by start (walks are short —
    ``steps+1`` rows — so a walk always fits a group), sorts by step,
    and emits index-shifted pairs; counting is the same combiner-first
    ``groupby(pair).sum`` as the text-side skip-gram op."""
    wk = random_walks(edges, start_pred=start_pred, starts=starts,
                      steps=steps, num_buckets=num_buckets)

    def pairs(g: pa.Table) -> pa.Table:
        st = np.asarray(g["step"].to_numpy(zero_copy_only=False), np.int64)
        v = np.asarray(g["v"].to_numpy(zero_copy_only=False), np.int64)
        o = np.argsort(st, kind="stable")
        st, v = st[o], v[o]
        outs_a, outs_b = [], []
        for d in range(1, window + 1):
            # steps are consecutive from 0 while the walk lives, so an
            # index shift of d IS a step shift of d
            if len(v) > d:
                outs_a.append(v[:-d])
                outs_b.append(v[d:])
        if not outs_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        a = np.concatenate(outs_a)
        b = np.concatenate(outs_b)
        t = pa.table({"a": a, "b": b}).group_by(["a", "b"]).aggregate(
            [([], "count_all")])
        return pa.table({"a": t["a"], "b": t["b"],
                         "n": t["count_all"].cast(pa.int64())})

    # coalesce the unioned per-step outputs before grouping (see the
    # block-explosion note in random_walks)
    agg = (wk.repartition(16).groupby("start")
           .map_groups(pairs, batch_format="pyarrow")
           .groupby(["a", "b"]).sum("n"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"a": t["a"], "b": t["b"],
                         "n": t["sum(n)"].cast(pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow").sort(key=["a", "b"])
