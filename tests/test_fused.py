import numpy as np
import ray.data as rd

from raygraph.algorithms.pagerank import pagerank
from raygraph.graph import build_graph
from tests import fixtures as fx


def _graph(A, n, parts=5):
    verts = rd.from_arrow(fx.vertex_table(n))
    return build_graph(rd.from_arrow(fx.dense_to_edge_table(A)),
                       vertices_ds=verts, num_parts=parts, binarize=True)


def test_fused_matches_dataset_mode_and_oracle():
    A = fx.random_graph(64, 0.06, seed=3)
    A[10, :] = 0
    g = _graph(A, 64)
    r_ds, i_ds = pagerank(g, tol=1e-9, itermax=120, mode="dataset")
    r_fu, i_fu = pagerank(g, tol=1e-9, itermax=120, mode="fused")
    assert i_ds["iters"] == i_fu["iters"]
    for a, b in zip(r_ds, r_fu):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)
    want = fx.pagerank_3f_oracle(A, tol=1e-9, itermax=120)
    t = g.to_vertex_table(r_fu)
    got = dict(zip(t["v"].to_pylist(), t["val"].to_pylist()))
    np.testing.assert_allclose([got[i] for i in range(64)], want, atol=1e-6)


def test_fused_resume(tmp_path):
    A = fx.random_graph(48, 0.08, seed=5)
    g = _graph(A, 48)
    full, info_full = pagerank(g, tol=1e-9, itermax=60, mode="fused")
    ckpt = str(tmp_path / "ck")
    pagerank(g, tol=1e-9, itermax=7, ckpt_dir=ckpt, ckpt_every=3, mode="fused")
    resumed, info = pagerank(g, tol=1e-9, itermax=60, ckpt_dir=ckpt, mode="fused")
    for a, b in zip(full, resumed):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-15)


def test_fused_single_partition():
    A = fx.random_graph(16, 0.2, seed=1)
    g = _graph(A, 16, parts=1)
    r, _ = pagerank(g, tol=1e-9, itermax=80, mode="fused")
    want = fx.pagerank_3f_oracle(A, tol=1e-9, itermax=80)
    t = g.to_vertex_table(r)
    got = dict(zip(t["v"].to_pylist(), t["val"].to_pylist()))
    np.testing.assert_allclose([got[i] for i in range(16)], want, atol=1e-6)


def test_cc_fused_matches_dataset_and_oracle():
    from raygraph.algorithms.components import connected_components

    A = fx.cc_dense()
    verts = rd.from_arrow(fx.vertex_table(fx.CC_N))
    g = build_graph(rd.from_arrow(fx.dense_to_edge_table(A)), vertices_ds=verts,
                    num_parts=4, symmetrize=True, binarize=True)
    f_ds, _ = connected_components(g, mode="dataset")
    f_fu, _ = connected_components(g, mode="fused")
    for a, b in zip(f_ds, f_fu):
        np.testing.assert_array_equal(a, b)
    t = g.to_vertex_table(f_fu, "label")
    got = dict(zip(t["v"].to_pylist(), t["label"].to_pylist()))
    assert {int(k): int(v) for k, v in got.items()} == fx.CC_LABELS


def test_cc_fused_random_graph():
    from raygraph.algorithms.components import connected_components

    A = fx.random_graph(120, 0.02, seed=17, symmetric=True)
    verts = rd.from_arrow(fx.vertex_table(120))
    g = build_graph(rd.from_arrow(fx.dense_to_edge_table(A)), vertices_ds=verts,
                    num_parts=8, symmetrize=True, binarize=True)
    f, _ = connected_components(g, mode="fused")
    t = g.to_vertex_table(f, "label")
    got = dict(zip(t["v"].to_pylist(), t["label"].to_pylist()))
    want = fx.cc_oracle(A)
    assert [int(got[i]) for i in range(120)] == want.tolist()


def test_cc_fused_resume(tmp_path):
    from raygraph.algorithms.components import connected_components

    A = fx.random_graph(60, 0.05, seed=23, symmetric=True)
    verts = rd.from_arrow(fx.vertex_table(60))
    g = build_graph(rd.from_arrow(fx.dense_to_edge_table(A)), vertices_ds=verts,
                    num_parts=4, symmetrize=True, binarize=True)
    full, _ = connected_components(g, mode="fused")
    ckpt = str(tmp_path / "cc")
    connected_components(g, mode="fused", itermax=1, ckpt_dir=ckpt)
    resumed, _ = connected_components(g, mode="fused", ckpt_dir=ckpt)
    for a, b in zip(full, resumed):
        np.testing.assert_array_equal(a, b)
