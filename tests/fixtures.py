"""Reference micro-fixtures (FIXTURES.md §3) + pure-numpy oracles.

(scipy is not available in this container; the fixture graphs are tiny so
dense numpy matrices serve as the oracle representation.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# 3a. The reference's 7x7 test matrix (graphblas/tests/test_matrix.py:34-49)
A7_ROWS = np.array([3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1], np.uint64)
A7_COLS = np.array([0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6], np.uint64)
A7_VALS = np.array([3, 2, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4], np.float64)
# vector v (graphblas/tests/test_matrix.py:52-55)
V7_IDX = np.array([1, 3, 4, 6], np.uint64)
V7_VALS = np.array([1, 1, 2, 0], np.float64)

# 3b. PageRank demo graph (notebooks/Pagerank Demo.ipynb cell 2)
PR_ROWS = np.array([0, 0, 1, 2, 2, 3, 4], np.uint64)
PR_COLS = np.array([1, 2, 3, 3, 4, 4, 0], np.uint64)
PR_VALS = np.array([1.1, 9.8, 4.2, 7.1, 0.2, 6.9, 2.2], np.float64)

# 3c. FastSV graph (notebooks/Connected Components -- FastSV.ipynb cells 2-3)
CC_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 4), (2, 5), (3, 4), (6, 7), (6, 8), (9, 10), (9, 11)]
CC_N = 12
CC_LABELS = {**{v: 0 for v in range(6)}, 6: 6, 7: 6, 8: 6, 9: 9, 10: 9, 11: 9}


def edge_table(rows, cols, vals=None) -> pa.Table:
    d = {"src": np.asarray(rows, np.uint64), "dst": np.asarray(cols, np.uint64)}
    if vals is not None:
        d["w"] = np.asarray(vals, np.float64)
    return pa.table(d)


def vertex_table(n) -> pa.Table:
    return pa.table({"v": np.arange(n, dtype=np.uint64)})


def dense_of(rows, cols, vals, n) -> np.ndarray:
    A = np.zeros((n, n), np.float64)
    A[np.asarray(rows, int), np.asarray(cols, int)] = np.asarray(vals, np.float64)
    return A


def a7_dense() -> np.ndarray:
    return dense_of(A7_ROWS, A7_COLS, A7_VALS, 7)


def cc_dense() -> np.ndarray:
    rows = [e[0] for e in CC_EDGES]
    cols = [e[1] for e in CC_EDGES]
    A = dense_of(rows, cols, np.ones(len(rows)), CC_N)
    return ((A + A.T) != 0).astype(np.float64)


def random_graph(n: int, p: float, seed: int = 7, symmetric: bool = False) -> np.ndarray:
    rng = np.random.default_rng(seed)
    A = (rng.random((n, n)) < p).astype(np.float64)
    np.fill_diagonal(A, 0.0)
    if symmetric:
        A = ((A + A.T) != 0).astype(np.float64)
    return A


def planted_partition(n_blocks=2, block=32, p_in=0.3, p_out=0.01, seed=11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = n_blocks * block
    A = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            p = p_in if i // block == j // block else p_out
            if rng.random() < p:
                A[i, j] = A[j, i] = 1.0
    return A


def dense_to_edge_table(A: np.ndarray) -> pa.Table:
    r, c = np.nonzero(A)
    return edge_table(r.astype(np.uint64), c.astype(np.uint64), A[r, c])


def pagerank_3f_oracle(A: np.ndarray, damping=0.85, itermax=100, tol=1e-6):
    """Pure-numpy reimplementation of the reference's pagerank_3f
    (notebooks/Pagerank Demo.ipynb cell 9): binarized A, no dangling
    redistribution, teleport=(1-d)/n, L1 residual stop."""
    A = (A != 0).astype(np.float64)
    n = A.shape[0]
    d_out = A.sum(axis=1)
    r = np.full(n, 1.0 / n)
    teleport = (1 - damping) / n
    for _ in range(itermax):
        t = r
        w = np.divide(t * damping, d_out, out=np.zeros(n), where=d_out > 0)
        r = teleport + A.T @ w
        rdiff = np.abs(t - r).sum()
        if rdiff <= tol:
            break
    return r


def cc_oracle(A: np.ndarray) -> np.ndarray:
    """Min-vertex-id label per component (FastSV output invariant)."""
    n = A.shape[0]
    U = (A + A.T) != 0
    labels = np.full(n, -1, np.int64)
    for s in range(n):
        if labels[s] >= 0:
            continue
        stack = [s]
        comp = []
        seen = {s}
        while stack:
            v = stack.pop()
            comp.append(v)
            for u in np.flatnonzero(U[v]):
                if u not in seen:
                    seen.add(int(u))
                    stack.append(int(u))
        labels[comp] = min(comp)
    return labels


def triangle_oracle(A: np.ndarray) -> int:
    """((L @ L) * L).sum() with L = tril(A,-1) — the L.mxm(L, mask=L) recipe."""
    U = ((A + A.T) != 0).astype(np.int64)
    np.fill_diagonal(U, 0)
    L = np.tril(U, -1)
    return int(((L @ L) * L).sum())


def lpa_oracle(A: np.ndarray, itermax=50) -> np.ndarray:
    """Synchronous LPA, most-frequent neighbor label, tie -> min label."""
    U = ((A + A.T) != 0).astype(np.int64)
    np.fill_diagonal(U, 0)
    n = U.shape[0]
    labels = np.arange(n)
    for _ in range(itermax):
        new = labels.copy()
        for v in range(n):
            neigh = np.flatnonzero(U[v])
            if len(neigh) == 0:
                continue
            cand = labels[neigh]
            vals, cnt = np.unique(cand, return_counts=True)
            new[v] = vals[cnt == cnt.max()].min()
        if np.array_equal(new, labels):
            break
        labels = new
    return labels
