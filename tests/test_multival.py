"""Complex (FC64) and UDT struct-value kernels vs numpy dict oracles."""

import numpy as np
import pyarrow as pa
import pytest

from raygraph import multival as MV
from raygraph.kernels import to_table


def _cvec(rng, n, idspace=200):
    v = np.sort(rng.choice(idspace, size=n, replace=False)).astype(np.uint64)
    return pa.table({
        "v": v,
        "re": np.round(rng.normal(size=n), 6),
        "im": np.round(rng.normal(size=n), 6),
    })


def _as_dict(t: pa.Table) -> dict:
    v = t["v"].to_numpy(zero_copy_only=False)
    z = (t["re"].to_numpy(zero_copy_only=False)
         + 1j * t["im"].to_numpy(zero_copy_only=False))
    return dict(zip(v.tolist(), z.tolist()))


@pytest.mark.parametrize("op", ["plus", "times", "minus"])
def test_ewise_add_c_union_semantics(op):
    rng = np.random.default_rng(7)
    a, b = _cvec(rng, 60), _cvec(rng, 45)
    got = _as_dict(to_table(MV.ewise_add_c(a, b, op)))
    da, db = _as_dict(a), _as_dict(b)
    f = {"plus": lambda x, y: x + y, "times": lambda x, y: x * y,
         "minus": lambda x, y: x - y}[op]
    want = {}
    for k in set(da) | set(db):
        if k in da and k in db:
            want[k] = f(da[k], db[k])
        else:
            want[k] = da.get(k, db.get(k))
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_ewise_mult_c_intersection():
    rng = np.random.default_rng(11)
    a, b = _cvec(rng, 50), _cvec(rng, 50)
    got = _as_dict(to_table(MV.ewise_mult_c(a, b, "times")))
    da, db = _as_dict(a), _as_dict(b)
    want = {k: da[k] * db[k] for k in set(da) & set(db)}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_apply_c_complex_and_real_results():
    rng = np.random.default_rng(13)
    a = _cvec(rng, 40)
    da = _as_dict(a)
    conj = _as_dict(to_table(MV.apply_c(a, "conj")))
    assert conj == {k: np.conjugate(z) for k, z in da.items()}
    t = to_table(MV.apply_c(a, "abs"))
    assert t.column_names == ["v", "val"]
    got = dict(zip(t["v"].to_numpy(zero_copy_only=False).tolist(),
                   t["val"].to_numpy(zero_copy_only=False).tolist()))
    for k, z in da.items():
        assert got[k] == pytest.approx(abs(z), abs=1e-12)
    arg = to_table(MV.apply_c(a, "carg"))
    gota = dict(zip(arg["v"].to_numpy(zero_copy_only=False).tolist(),
                    arg["val"].to_numpy(zero_copy_only=False).tolist()))
    for k, z in da.items():
        assert gota[k] == pytest.approx(np.angle(z), abs=1e-12)


@pytest.mark.parametrize("num_buckets", [3, 64])
def test_mxv_c_vs_dense_numpy(num_buckets):
    rng = np.random.default_rng(17)
    n = 64
    nnz = 400
    src = rng.integers(0, n, nnz).astype(np.uint64)
    dst = rng.integers(0, n, nnz).astype(np.uint64)
    re = np.round(rng.normal(size=nnz), 6)
    im = np.round(rng.normal(size=nnz), 6)
    edges = pa.table({"src": src, "dst": dst, "re": re, "im": im})
    vec = _cvec(rng, 40, idspace=n)
    A = np.zeros((n, n), np.complex128)
    # duplicate (src,dst) entries sum, matching from_coo dup_op=plus
    np.add.at(A, (src, dst), re + 1j * im)
    x = np.zeros(n, np.complex128)
    xm = np.zeros(n, bool)
    for k, z in _as_dict(vec).items():
        x[k], xm[k] = z, True
    want_full = A[:, xm] @ x[xm]
    rows_with_match = np.zeros(n, bool)
    np.logical_or.at(rows_with_match, src[xm[dst]], True)
    got = to_table(MV.mxv_c(edges, vec, num_buckets=num_buckets))
    gd = _as_dict(got)
    assert set(gd) == set(np.flatnonzero(rows_with_match).tolist())
    for k, z in gd.items():
        assert z == pytest.approx(want_full[k], abs=1e-9)


def test_reduce_scalar_c():
    rng = np.random.default_rng(19)
    a = _cvec(rng, 30)
    da = _as_dict(a)
    got = MV.reduce_scalar_c(a)
    assert got == pytest.approx(sum(da.values()), abs=1e-9)


def test_ewise_udt_intersection_and_union():
    rng = np.random.default_rng(23)
    n = 50

    def uvec(m):
        v = np.sort(rng.choice(150, size=m, replace=False)).astype(np.uint64)
        return pa.table({"v": v,
                         "x": rng.integers(0, 100, m).astype(np.float64),
                         "y": np.round(rng.normal(size=m), 6)})

    a, b = uvec(n), uvec(n - 10)

    def fn(da, db):
        return {"x": da["x"] + db["x"], "y": da["y"] * db["y"]}

    def tod(t):
        return {int(r["v"]): (r["x"], r["y"])
                for r in t.to_pylist()}

    da, db = tod(a), tod(b)
    got = tod(to_table(MV.ewise_udt(a, b, fn, ("x", "y"))))
    want = {k: (da[k][0] + db[k][0], da[k][1] * db[k][1])
            for k in set(da) & set(db)}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)

    gotu = tod(to_table(MV.ewise_udt(a, b, fn, ("x", "y"), union=True)))
    assert set(gotu) == set(da) | set(db)
    for k in gotu:
        if k in da and k in db:
            assert gotu[k] == pytest.approx(want[k], abs=1e-12)
        else:
            assert gotu[k] == pytest.approx(da.get(k, db.get(k)), abs=1e-12)


def test_apply_udt():
    rng = np.random.default_rng(29)
    v = np.arange(20, dtype=np.uint64)
    t = pa.table({"v": v,
                  "x": rng.integers(1, 9, 20).astype(np.float64),
                  "y": rng.normal(size=20)})

    out = to_table(MV.apply_udt(
        t, lambda d: {"norm": np.hypot(d["x"], d["y"])},
        ("x", "y"), ("norm",)))
    got = dict(zip(out["v"].to_numpy(zero_copy_only=False).tolist(),
                   out["norm"].to_numpy(zero_copy_only=False).tolist()))
    x = t["x"].to_numpy(zero_copy_only=False)
    y = t["y"].to_numpy(zero_copy_only=False)
    for i in range(20):
        assert got[i] == pytest.approx(float(np.hypot(x[i], y[i])), abs=1e-12)


# ------------------------------------------------------ property tests ----


def test_property_complex_ewise_vs_brute_force():
    """Randomized trials: ewise add/mult over FC64 vs a dict oracle,
    across bucket counts (partition-invariance included)."""
    rng = np.random.default_rng(31)
    for trial in range(8):
        na, nb = rng.integers(0, 30, 2)
        a, b = _cvec(rng, int(na), 60), _cvec(rng, int(nb), 60)
        da, db = _as_dict(a), _as_dict(b)
        nbk = int(rng.choice([1, 7, 64]))
        got_u = _as_dict(to_table(MV.ewise_add_c(a, b, "plus",
                                                 num_buckets=nbk)))
        want_u = {k: da.get(k, 0) + db.get(k, 0) if (k in da and k in db)
                  else da.get(k, db.get(k))
                  for k in set(da) | set(db)}
        assert set(got_u) == set(want_u)
        for k in want_u:
            assert got_u[k] == pytest.approx(want_u[k], abs=1e-12)
        got_i = _as_dict(to_table(MV.ewise_mult_c(a, b, "times",
                                                  num_buckets=nbk)))
        want_i = {k: da[k] * db[k] for k in set(da) & set(db)}
        assert set(got_i) == set(want_i)
        for k in want_i:
            assert got_i[k] == pytest.approx(want_i[k], abs=1e-12)


def test_property_mxv_c_conjugate_symmetry():
    """A Hermitian-lift identity: (A x)* == conj(A) conj(x) — catches
    any re/im column swap or sign slip in the complex multiply."""
    rng = np.random.default_rng(37)
    n, nnz = 32, 150
    edges = pa.table({
        "src": rng.integers(0, n, nnz).astype(np.uint64),
        "dst": rng.integers(0, n, nnz).astype(np.uint64),
        "re": rng.normal(size=nnz), "im": rng.normal(size=nnz)})
    vec = _cvec(rng, 20, idspace=n)
    lhs = _as_dict(to_table(MV.apply_c(MV.mxv_c(edges, vec), "conj")))
    cedges = pa.table({"src": edges["src"], "dst": edges["dst"],
                       "re": edges["re"],
                       "im": pa.array(-edges["im"].to_numpy(
                           zero_copy_only=False))})
    rhs = _as_dict(to_table(MV.mxv_c(cedges, to_table(
        MV.apply_c(vec, "conj"), sort_by=None))))
    assert set(lhs) == set(rhs)
    for k in lhs:
        assert lhs[k] == pytest.approx(rhs[k], abs=1e-9)


def test_cmplx_constructor():
    # binary.cmplx: FC64 from two real vectors, intersection semantics
    import pyarrow as pa

    a = pa.table({"v": np.array([1, 2, 3], np.uint64),
                  "val": np.array([1.5, 2.5, 3.5])})
    b = pa.table({"v": np.array([2, 3, 4], np.uint64),
                  "val": np.array([-1.0, 0.25, 9.0])})
    t = to_table(MV.cmplx(a, b))
    got = {v: complex(r, i) for v, r, i in zip(t["v"].to_pylist(),
                                               t["re"].to_pylist(),
                                               t["im"].to_pylist())}
    assert got == {2: 2.5 - 1j, 3: 3.5 + 0.25j}
    # round-trips through the complex apply family
    mag = to_table(MV.apply_c(MV.cmplx(a, b), "abs"))
    gm = {v: m for v, m in zip(mag["v"].to_pylist(), mag["val"].to_pylist())}
    assert gm == pytest.approx({2: abs(2.5 - 1j), 3: abs(3.5 + 0.25j)})


def _cedges(rng, n, idspace=40):
    pairs = rng.choice(idspace * idspace, size=n, replace=False)
    return pa.table({
        "src": (pairs // idspace).astype(np.uint64),
        "dst": (pairs % idspace).astype(np.uint64),
        "re": np.round(rng.normal(size=n), 6),
        "im": np.round(rng.normal(size=n), 6),
    })


def _edict(t: pa.Table) -> dict:
    s = t["src"].to_numpy(zero_copy_only=False)
    d = t["dst"].to_numpy(zero_copy_only=False)
    z = (np.asarray(t["re"].to_numpy(zero_copy_only=False), np.float64)
         + 1j * np.asarray(t["im"].to_numpy(zero_copy_only=False),
                           np.float64))
    return {(int(a), int(b)): c for a, b, c in zip(s, d, z.tolist())}


def test_vxm_c_vs_dense_numpy():
    rng = np.random.default_rng(23)
    e, v = _cedges(rng, 300), _cvec(rng, 25, idspace=40)
    got = _as_dict(to_table(MV.vxm_c(v, e)))
    de, dv = _edict(e), _as_dict(v)
    want: dict = {}
    for (i, j), a in de.items():
        if i in dv:
            want[j] = want.get(j, 0) + dv[i] * a
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_mxm_c_vs_dense_numpy():
    rng = np.random.default_rng(29)
    a, b = _cedges(rng, 250), _cedges(rng, 250)
    got = _edict(to_table(MV.mxm_c(a, b), sort_by=None))
    da, db = _edict(a), _edict(b)
    want: dict = {}
    for (i, k), x in da.items():
        for (k2, j), y in db.items():
            if k == k2:
                want[(i, j)] = want.get((i, j), 0) + x * y
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_fc32_paired_float32_layout():
    """FC32 = paired float32 (reference core/dtypes.py:13): mxv_c/vxm_c/
    mxm_c with dtype='fc32' compute in complex64 and emit float32
    component columns; results match the complex64 numpy oracle."""
    rng = np.random.default_rng(31)
    e, v = _cedges(rng, 200), _cvec(rng, 20, idspace=40)
    out = to_table(MV.mxv_c(e, v, dtype="fc32"))
    assert out["re"].type == pa.float32() and out["im"].type == pa.float32()
    de, dv = _edict(e), _as_dict(v)
    want: dict = {}
    for (i, j), a in de.items():
        if j in dv:
            want[i] = want.get(i, np.complex64(0)) + \
                np.complex64(a) * np.complex64(dv[j])
    got = _as_dict(out)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(complex(want[k]), rel=2e-5, abs=2e-5)
    m = to_table(MV.mxm_c(e, e, dtype="fc32"), sort_by=None)
    assert m["re"].type == pa.float32() and m["im"].type == pa.float32()


def test_udt_registry_roundtrip_and_named_ewise():
    """register_new analog (reference core/dtypes.py:178-244): a named
    structured dtype (incl. a sized sub-array field) round-trips through
    the per-field column layout, and ewise/apply resolve the column set
    and per-field dtypes by the registered name (int64 field stays
    int64-exact above 2^53)."""
    big = np.int64(2**54)
    t = MV.register_udt("acc", [("cnt", "i8"), ("tot", "f8"),
                                ("xy", "f8", (2,))])
    assert t.columns == ("cnt", "tot", "xy_0", "xy_1")
    v = np.array([3, 1, 7], np.uint64)
    vals = np.zeros(3, t.np_dtype)
    vals["cnt"] = [big + 3, 2, 5]
    vals["tot"] = [1.5, 2.5, 3.5]
    vals["xy"] = [[1, 2], [3, 4], [5, 6]]
    tbl = MV.udt_vector_table(v, vals, "acc")
    assert tbl["cnt"].type == pa.int64()
    v2, back = MV.udt_from_table(tbl.sort_by("v"), "acc")
    assert sorted(v2.tolist()) == [1, 3, 7]
    got = {int(k): r for k, r in zip(v2, back)}
    assert got[3]["cnt"] == big + 3 and tuple(got[7]["xy"]) == (5.0, 6.0)

    b_vals = np.zeros(2, t.np_dtype)
    b_vals["cnt"] = [big + 9, 1]
    b_vals["tot"] = [10.0, 20.0]
    b_vals["xy"] = [[1, 1], [2, 2]]
    b = MV.udt_vector_table(np.array([3, 9], np.uint64), b_vals, "acc")

    def add(da, db):
        return {c: da[c] + db[c] for c in t.columns}

    out = to_table(MV.ewise_udt(tbl, b, add, "acc"))
    assert out["cnt"].type == pa.int64()
    row = {int(k): i for i, k in enumerate(out["v"].to_pylist())}
    assert out["cnt"][row[3]].as_py() == int(2 * big + 12)  # int64-exact

    ap = to_table(MV.apply_udt(tbl, lambda d: {**d, "cnt": d["cnt"] + 1},
                               "acc"))
    assert ap["cnt"].type == pa.int64()
    assert sorted(ap["cnt"].to_pylist())[-1] == int(big + 4)


def test_fc32_ewise_and_apply():
    rng = np.random.default_rng(41)
    a, b = _cvec(rng, 30), _cvec(rng, 30)
    out = to_table(MV.ewise_mult_c(a, b, "times", dtype="fc32"))
    assert out["re"].type == pa.float32()
    da, db = _as_dict(a), _as_dict(b)
    got = _as_dict(out)
    for k in got:
        want = complex(np.complex64(da[k]) * np.complex64(db[k]))
        assert got[k] == pytest.approx(want, rel=2e-5, abs=2e-5)
    ab = to_table(MV.apply_c(out, "abs", dtype="fc32"), sort_by=None)
    assert ab["val"].type == pa.float32()
