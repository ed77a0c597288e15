import numpy as np
import pyarrow as pa
import pytest

from raygraph import io


def test_mm_roundtrip(tmp_path):
    edges = pa.table({"src": np.array([0, 1, 2, 2], np.uint64),
                      "dst": np.array([1, 2, 0, 2], np.uint64),
                      "w": np.array([1.5, -2.25, 3.0, 0.125])})
    p = str(tmp_path / "g.mtx")
    io.mmwrite(p, edges, comment="roundtrip test")
    back = io.mmread(p)
    assert back["src"].to_pylist() == edges["src"].to_pylist()
    assert back["dst"].to_pylist() == edges["dst"].to_pylist()
    assert back["w"].to_pylist() == edges["w"].to_pylist()  # repr() is exact


def test_mm_pattern_and_symmetric(tmp_path):
    p = str(tmp_path / "s.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
        f.write("3 3 2\n1 2\n3 3\n")
    t = io.mmread(p)
    rows = sorted(zip(t["src"].to_pylist(), t["dst"].to_pylist()))
    # (0,1) mirrored to (1,0); diagonal (2,2) not mirrored
    assert rows == [(0, 1), (1, 0), (2, 2)]
    assert all(w == 1.0 for w in t["w"].to_pylist())


def test_mm_graph_build_integration(tmp_path):
    """mmread feeds build_graph like any edge table."""
    import ray.data as rd

    from raygraph.graph import build_graph

    edges = pa.table({"src": np.array([0, 1, 2], np.uint64),
                      "dst": np.array([1, 2, 0], np.uint64),
                      "w": np.ones(3)})
    p = str(tmp_path / "g.mtx")
    io.mmwrite(p, edges)
    g = build_graph(rd.from_arrow(io.mmread(p)), num_parts=2)
    assert g.nnz == 3 and g.n_vertices == 3


def test_scipy_bridge_gated():
    edges = pa.table({"src": np.array([0], np.uint64),
                      "dst": np.array([1], np.uint64), "w": np.ones(1)})
    try:
        import scipy  # noqa: F401
        m = io.to_scipy(edges)
        back = io.from_scipy(m)
        assert back["src"].to_pylist() == [0]
    except ImportError:
        with pytest.raises(ImportError):
            io.to_scipy(edges)


def test_networkx_bridge_gated():
    edges = pa.table({"src": np.array([0], np.uint64),
                      "dst": np.array([1], np.uint64), "w": np.ones(1)})
    try:
        import networkx  # noqa: F401
        g = io.to_networkx(edges)
        back = io.from_networkx(g)
        assert back["src"].to_pylist() == [0]
    except ImportError:
        with pytest.raises(ImportError):
            io.to_networkx(edges)
