import numpy as np
import pyarrow as pa
import ray.data as rd

from raygraph.engine import lpa_step, spmv, spmv_with_mask
from raygraph.graph import build_graph
from tests import fixtures as fx


def _build7(num_parts=3):
    edges = rd.from_arrow(fx.edge_table(fx.A7_ROWS, fx.A7_COLS, fx.A7_VALS))
    verts = rd.from_arrow(fx.vertex_table(7))
    return build_graph(edges, vertices_ds=verts, num_parts=num_parts)


def _dense_x(g, x):
    tbl = pa.table({"v": np.arange(len(x), dtype=np.uint64), "val": np.asarray(x, np.float64)})
    return g.state_from_table(tbl)


def test_spmv_plus_times_matches_scipy():
    g = _build7()
    A = fx.a7_dense()
    x = np.array([0.0, 1, 0, 1, 2, 0, 0])
    want = A.T @ x  # w[dst] = sum_src A[src,dst] * x[src]
    got = g.to_vertex_table(spmv(g, _dense_x(g, x), "plus_times"))
    vals = dict(zip(got["v"].to_pylist(), got["val"].to_pylist()))
    np.testing.assert_allclose([vals[i] for i in range(7)], want)


def test_spmv_plus_second():
    g = _build7()
    A = (fx.a7_dense() != 0).astype(np.float64)
    x = np.array([0.5, 1, 0.25, 1, 2, 0, 3.0])
    want = A.T @ x
    got = g.to_vertex_table(spmv(g, _dense_x(g, x), "plus_second"))
    vals = dict(zip(got["v"].to_pylist(), got["val"].to_pylist()))
    np.testing.assert_allclose([vals[i] for i in range(7)], want)


def test_spmv_min_second_uint64_and_mask():
    g = _build7()
    parents = np.arange(7, dtype=np.uint64)
    tbl = pa.table({"v": np.arange(7, dtype=np.uint64), "val": parents})
    x = g.state_from_table(tbl, fill=0, dtype=np.uint64)
    dense, mask = spmv_with_mask(g, x, "min_second", out_dtype=np.uint64)
    got = g.to_vertex_table(dense)
    m = g.to_vertex_table(mask, "m")
    vals = dict(zip(got["v"].to_pylist(), got["val"].to_pylist()))
    has = dict(zip(m["v"].to_pylist(), m["m"].to_pylist()))
    A = fx.a7_dense()
    for j in range(7):
        srcs = np.flatnonzero(A[:, j])
        if len(srcs):
            assert has[j] and vals[j] == srcs.min()
        else:
            assert not has[j]


def test_lpa_step_majority_min_tiebreak():
    # star: 1,2,3 all point to 0; labels 5,5,9 -> 0 takes 5
    edges = rd.from_arrow(fx.edge_table([1, 2, 3], [0, 0, 0]))
    verts = rd.from_arrow(fx.vertex_table(4))
    g = build_graph(edges, vertices_ds=verts, num_parts=2)
    lab = pa.table(
        {"v": np.arange(4, dtype=np.uint64), "val": np.array([7, 5, 5, 9], np.uint64)}
    )
    st = g.state_from_table(lab, fill=0, dtype=np.uint64)
    out = g.to_vertex_table(lpa_step(g, st))
    vals = dict(zip(out["v"].to_pylist(), out["val"].to_pylist()))
    assert vals[0] == 5  # majority
    assert vals[1] == 5 and vals[2] == 5 and vals[3] == 9  # no in-neighbors: keep


def test_lpa_tie_breaks_to_min():
    edges = rd.from_arrow(fx.edge_table([1, 2], [0, 0]))
    verts = rd.from_arrow(fx.vertex_table(3))
    g = build_graph(edges, vertices_ds=verts, num_parts=2)
    lab = pa.table({"v": np.arange(3, dtype=np.uint64), "val": np.array([0, 9, 4], np.uint64)})
    st = g.state_from_table(lab, fill=0, dtype=np.uint64)
    out = g.to_vertex_table(lpa_step(g, st))
    vals = dict(zip(out["v"].to_pylist(), out["val"].to_pylist()))
    assert vals[0] == 4


def test_identity_for_bitwise_on_signed_ints():
    # bor identity = 0 (no bits); band identity = all bits set (-1 signed)
    from raygraph.engine import identity_for
    from raygraph.ops import MONOID

    assert identity_for(MONOID["bor"], np.int64) == 0
    assert identity_for(MONOID["bor"], np.uint64) == 0
    assert identity_for(MONOID["band"], np.int64) == -1
    assert identity_for(MONOID["band"], np.uint64) == np.iinfo(np.uint64).max
    # folding any value against the identity must be a no-op
    for mname, dt in [("bor", np.int64), ("band", np.int64)]:
        ident = identity_for(MONOID[mname], dt)
        for v in (-5, 0, 7, -(2**62)):
            assert MONOID[mname].ufunc(np.array([v], dt),
                                       np.array([ident], dt))[0] == v
