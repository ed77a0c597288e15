"""Approximate neighborhood function — HyperBall (Boldi & Vigna 2013):
per-vertex HyperLogLog counters of the out-ball B(v, t), grown one hop
per superstep by max-merging each neighbor's counter along reversed
edges (``max_second`` spmv on the reversed twin graph A^T).

Reference-ecosystem counterpart: the ANF/effective-diameter family
(graphblas-algorithms has no ANF; this is the standard HyperBall recipe
re-expressed on the engine's superstep primitives). SURVEY.md §7.1.

Scale shape: state is m = 2^p registers per vertex as m per-partition
float slices; each hop costs m ``max_second`` supersteps over the CSR
blocks (register-sliced — a production fused variant would carry all m
registers per packet in one wave; the per-register slicing keeps the
operator on the audited spmv path and multiplies superstep count, not
shuffle volume, by m). Registers use the same deterministic splitmix64
hash as datapipe.sampling.hll_registers, so the ball-size estimates are
oracle-checkable: the SQL oracle reproduces register init, hop-bounded
reachability, per-register max, and the HLL estimate formula exactly.
"""

from __future__ import annotations

import numpy as np

from raygraph.engine import spmv
from raygraph.util import mix64


def hyperball(graph, rgraph, *, radius: int = 2, p: int = 4) -> "pa.Table":
    """Rows ``(v, t, est)`` for t = 1..radius: the HLL estimate
    (with small-range linear-counting correction) of |B_out(v, t)|,
    rounded to 6 decimals. ``rgraph`` is the reversed twin (identical
    vertex slices by the hash partitioner's determinism)."""
    import pyarrow as pa

    if rgraph.n_vertices != graph.n_vertices:
        raise ValueError("rgraph must be the reversed twin of graph")
    m = 1 << p
    m_bits = 64 - p
    ids = graph.ids_slices()
    pow2 = (np.uint64(1) << np.arange(0, m_bits, dtype=np.uint64))
    alpha = 0.7213 / (1 + 1.079 / m)
    regs = []
    for a in ids:
        h = mix64(np.asarray(a, np.uint64))
        r = (h >> np.uint64(m_bits)).astype(np.int64)
        w = h & ((np.uint64(1) << np.uint64(m_bits)) - np.uint64(1))
        bitlen = np.searchsorted(pow2, w, side="right")
        rank = (m_bits - bitlen + 1).astype(np.float64)
        mat = np.zeros((len(a), m))
        mat[np.arange(len(a)), r] = rank
        regs.append(mat)
    out = []
    for t in range(1, radius + 1):
        for j in range(m):
            xj = [mat[:, j].copy() for mat in regs]
            y = spmv(rgraph, xj, "max_second")
            for mat, xx, yy in zip(regs, xj, y):
                mat[:, j] = np.maximum(xx, yy)
        for a, mat in zip(ids, regs):
            s = np.exp2(-mat).sum(axis=1)
            est = alpha * m * m / s
            zeros = (mat == 0).sum(axis=1)
            lc = m * np.log(m / np.maximum(zeros, 1))
            est = np.where((est <= 2.5 * m) & (zeros > 0), lc, est)
            out.append(pa.table({
                "v": np.asarray(a, np.uint64).astype(np.int64),
                "t": np.full(len(a), t, np.int64),
                "est": np.round(est, 6),
            }))
    return pa.concat_tables(out).sort_by(
        [("v", "ascending"), ("t", "ascending")])
