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


def test_dense_dicts_pairs_round_trips():
    """Small-constructor conveniences (reference matrix.py:1398-1577,
    vector.py:731-1997): dense/dicts/pairs round-trip bit-exactly."""
    import numpy as np
    import pytest

    from raygraph import io

    A = np.array([[0.0, 2.5], [7.0, 0.0], [0.0, 1.0]])
    t = io.matrix_from_dense(A, missing_value=0.0)
    assert t.num_rows == 3
    np.testing.assert_array_equal(io.matrix_to_dense(t, nrows=3, ncols=2), A)
    # no missing_value: every cell explicit
    assert io.matrix_from_dense(A).num_rows == 6
    d = {0: {1: 2.5}, 1: {0: 7.0}, 2: {1: 1.0}}
    t2 = io.matrix_from_dicts(d)
    assert io.matrix_to_dicts(t2) == d
    np.testing.assert_array_equal(io.matrix_to_dense(t2, nrows=3, ncols=2), A)
    # colwise orientation transposes
    t3 = io.matrix_from_dicts({1: {0: 2.5}}, order="colwise")
    assert t3["src"].to_pylist() == [0] and t3["dst"].to_pylist() == [1]

    x = np.array([0.0, 3.0, 0.0, 4.0])
    v = io.vector_from_dense(x, missing_value=0.0)
    assert v.num_rows == 2
    np.testing.assert_array_equal(io.vector_to_dense(v, size=4), x)
    p = io.vector_from_pairs([(3, 1.0), (1, 2.0)])
    assert p["v"].to_pylist() == [3, 1]
    with pytest.raises(ValueError, match="duplicate"):
        io.vector_from_pairs([(1, 1.0), (1, 2.0)])
    pc = io.vector_from_pairs([(1, 1.0), (1, 2.0)], dup_op="plus")
    assert pc["val"].to_pylist() == [3.0]


def test_from_dense_nan_missing_value():
    """missing_value=np.nan must SKIP the NaNs (a != NaN is elementwise
    True, which previously kept every cell — ADVICE r3)."""
    import numpy as np

    from raygraph import io

    a = np.array([[1.0, np.nan], [np.nan, 4.0]])
    t = io.matrix_from_dense(a, missing_value=np.nan)
    assert t.num_rows == 2
    assert sorted(t["w"].to_pylist()) == [1.0, 4.0]
    x = np.array([1.0, np.nan, 3.0])
    vt = io.vector_from_dense(x, missing_value=np.nan)
    assert vt["v"].to_pylist() == [0, 2]
    assert vt["val"].to_pylist() == [1.0, 3.0]
    # non-NaN missing_value still works
    t2 = io.matrix_from_dense(np.array([[0.0, 2.0]]), missing_value=0.0)
    assert t2.num_rows == 1 and t2["w"].to_pylist() == [2.0]


def test_pydata_sparse_bridge_gated():
    edges = pa.table({"src": np.array([0, 1], np.uint64),
                      "dst": np.array([1, 2], np.uint64),
                      "w": np.array([2.0, 3.0])})
    try:
        import sparse  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            io.to_pydata_sparse(edges)
        return
    m = io.to_pydata_sparse(edges)
    back = io.from_pydata_sparse(m)
    assert back.sort_by("src").equals(edges)


def test_awkward_bridge_gated():
    vec = pa.table({"v": np.array([1, 4], np.uint64),
                    "val": np.array([0.5, 2.5])})
    edges = pa.table({"src": np.array([0, 0, 2], np.uint64),
                      "dst": np.array([1, 3, 2], np.uint64),
                      "w": np.array([1.0, 2.0, 3.0])})
    try:
        import awkward  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            io.vector_to_awkward(vec)
        with pytest.raises(ImportError):
            io.matrix_to_awkward(edges)
        return
    assert io.vector_from_awkward(io.vector_to_awkward(vec)).equals(vec)
    back = io.matrix_from_awkward(io.matrix_to_awkward(edges))
    assert back.sort_by("src").equals(edges)


def test_from_scalar_constructors():
    from raygraph.io import matrix_from_scalar, vector_from_scalar

    m = matrix_from_scalar(2.5, 2, 3)
    assert m.num_rows == 6 and set(m["w"].to_pylist()) == {2.5}
    v = vector_from_scalar(-1.0, 4)
    assert v.num_rows == 4 and set(v["val"].to_pylist()) == {-1.0}


def test_ss_export_import_roundtrip_all_formats():
    """csr/csc/dcsr/dcsc/coo export -> import round-trips (reference
    Matrix.ss.export/import, core/ss/matrix.py:1165-1853); dcsr/dcsc
    stay exact for full-range hashed uint64 ids where csr would need a
    2^64-entry indptr."""
    import pyarrow as pa

    from raygraph.io import ss_export_matrix, ss_import_matrix

    e = pa.table({"src": np.array([5, 0, 5, 3], np.uint64),
                  "dst": np.array([1, 2, 0, 3], np.uint64),
                  "w": np.array([1.5, 2.5, 3.5, 4.5])})
    want = sorted(zip(e["src"].to_pylist(), e["dst"].to_pylist(),
                      e["w"].to_pylist()))
    for fmt in ("csr", "csc", "dcsr", "dcsc", "coo"):
        d = ss_export_matrix(e, fmt)
        assert d["format"] == fmt and d["nvals"] == 4
        back = ss_import_matrix(d)
        got = sorted(zip(back["src"].to_pylist(), back["dst"].to_pylist(),
                         back["w"].to_pylist()))
        assert got == want, fmt
    # dcsr lists only non-empty rows; csr spans the full range
    assert ss_export_matrix(e, "dcsr")["rows"].tolist() == [0, 3, 5]
    assert len(ss_export_matrix(e, "csr")["indptr"]) == 7
    # hashed full-range ids: dcsr works where csr cannot
    big = pa.table({"src": np.array([2**63 + 5, 2**63 + 5], np.uint64),
                    "dst": np.array([1, 2], np.uint64),
                    "w": np.array([1.0, 2.0])})
    d = ss_export_matrix(big, "dcsr")
    assert d["rows"].tolist() == [2**63 + 5]
    got = ss_import_matrix(d)
    assert got["src"].to_pylist() == [2**63 + 5] * 2
