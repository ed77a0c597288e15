"""Property-based tests (hypothesis) for the Dataset-level kernels.

Mirrors the reference's randomized-coverage intent (graphblas/tests
exercise dense/sparse combinations per op) with dict-based pure-python
oracles over tiny random sparse collections. Example counts are kept
small because every kernel call executes a Ray Data pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from raygraph import kernels as K

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@st.composite
def sparse_vec(draw, max_id=30, max_size=12):
    ids = draw(st.lists(st.integers(0, max_id), unique=True, max_size=max_size))
    return {i: draw(st.integers(-40, 40)) for i in ids}


@st.composite
def sparse_mat(draw, n=8, max_nnz=20):
    cells = draw(
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
            unique=True,
            max_size=max_nnz,
        )
    )
    return {c: draw(st.integers(1, 9)) for c in cells}


def _vec_tbl(d: dict) -> pa.Table:
    ks = sorted(d)
    return pa.table(
        {
            "v": np.array(ks, np.uint64),
            "val": np.array([float(d[k]) for k in ks], np.float64),
        }
    )


def _mat_tbl(m: dict) -> pa.Table:
    cells = sorted(m)
    return pa.table(
        {
            "src": np.array([c[0] for c in cells], np.uint64),
            "dst": np.array([c[1] for c in cells], np.uint64),
            "w": np.array([float(m[c]) for c in cells], np.float64),
        }
    )


def _as_dict(tbl: pa.Table, key="v", val="val") -> dict:
    return dict(
        zip(
            tbl[key].to_numpy(zero_copy_only=False).tolist(),
            tbl[val].to_numpy(zero_copy_only=False).tolist(),
        )
    )


_BIN = {
    "plus": lambda a, b: a + b,
    "times": lambda a, b: a * b,
    "min": min,
    "max": max,
    "minus": lambda a, b: a - b,
}


@_SETTINGS
@given(a=sparse_vec(), b=sparse_vec(), op=st.sampled_from(["plus", "min", "max", "times"]))
def test_ewise_add_matches_dict_oracle(a, b, op):
    f = _BIN[op]
    want = {k: f(a[k], b[k]) if k in a and k in b else (a.get(k, b.get(k)))
            for k in set(a) | set(b)}
    got = _as_dict(K.to_table(K.ewise_add(_vec_tbl(a), _vec_tbl(b), op)))
    assert got == {k: float(v) for k, v in want.items()}


@_SETTINGS
@given(a=sparse_vec(), b=sparse_vec(), op=st.sampled_from(["plus", "times", "min", "minus"]))
def test_ewise_mult_matches_dict_oracle(a, b, op):
    f = _BIN[op]
    want = {k: f(a[k], b[k]) for k in set(a) & set(b)}
    got = _as_dict(K.to_table(K.ewise_mult(_vec_tbl(a), _vec_tbl(b), op)))
    assert got == {k: float(v) for k, v in want.items()}


@_SETTINGS
@given(a=sparse_vec(), b=sparse_vec(), ld=st.integers(-5, 5), rd=st.integers(-5, 5))
def test_ewise_union_matches_dict_oracle(a, b, ld, rd):
    want = {k: _BIN["minus"](a.get(k, ld), b.get(k, rd)) for k in set(a) | set(b)}
    got = _as_dict(
        K.to_table(K.ewise_union(_vec_tbl(a), _vec_tbl(b), "minus", float(ld), float(rd)))
    )
    assert got == {k: float(v) for k, v in want.items()}


_SR = {
    "plus_times": (lambda a, b: a + b, lambda a, b: a * b),
    "min_plus": (min, lambda a, b: a + b),
    "max_times": (max, lambda a, b: a * b),
}


@_SETTINGS
@given(m=sparse_mat(), v=sparse_vec(max_id=7), sr=st.sampled_from(sorted(_SR)))
def test_mxv_matches_dict_oracle(m, v, sr):
    add, mul = _SR[sr]
    want: dict = {}
    for (i, j), a in m.items():
        if j in v:
            x = mul(a, v[j])
            want[i] = x if i not in want else add(want[i], x)
    got = _as_dict(K.to_table(K.mxv(_mat_tbl(m), _vec_tbl(v), sr)))
    assert got == {k: float(x) for k, x in want.items()}


@_SETTINGS
@given(m=sparse_mat(), v=sparse_vec(max_id=7), sr=st.sampled_from(sorted(_SR)))
def test_vxm_is_mxv_of_transpose(m, v, sr):
    add, mul = _SR[sr]
    want: dict = {}
    for (i, j), a in m.items():
        if i in v:
            x = mul(v[i], a)
            want[j] = x if j not in want else add(want[j], x)
    got = _as_dict(K.to_table(K.vxm(_vec_tbl(v), _mat_tbl(m), sr)))
    assert got == {k: float(x) for k, x in want.items()}


@_SETTINGS
@given(m=sparse_mat(), mon=st.sampled_from(["plus", "min", "max"]))
def test_reduce_rowwise_matches_dict_oracle(m, mon):
    f = _BIN[mon]
    want: dict = {}
    for (i, _j), a in m.items():
        want[i] = a if i not in want else f(want[i], a)
    got = _as_dict(K.to_table(K.reduce_rowwise(_mat_tbl(m), mon)))
    assert got == {k: float(x) for k, x in want.items()}


@_SETTINGS
@given(v=sparse_vec(), thunk=st.integers(-20, 20),
       cmp=st.sampled_from(["<", "<=", ">", ">=", "==", "!="]))
def test_select_value_matches_filter_oracle(v, thunk, cmp):
    import operator as _op

    f = {"<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge,
         "==": _op.eq, "!=": _op.ne}[cmp]
    want = {k: float(x) for k, x in v.items() if f(x, thunk)}
    got = _as_dict(K.to_table(K.select_value(_vec_tbl(v), cmp, float(thunk))))
    assert got == want


@_SETTINGS
@given(v=sparse_vec(), data=st.data())
def test_extract_dup_gather_matches_oracle(v, data):
    ids = sorted(v)
    idx = data.draw(
        st.lists(st.sampled_from(ids), min_size=1, max_size=8) if ids else st.just([])
    )
    idx_arr = np.array(idx, np.uint64)
    out = K.to_table(K.extract(_vec_tbl(v), idx_arr), sort_by=None)
    # remapped: output position k holds v[idx[k]]
    got = dict(
        zip(
            out["v"].to_numpy(zero_copy_only=False).tolist(),
            out["val"].to_numpy(zero_copy_only=False).tolist(),
        )
    )
    want = {k: float(v[i]) for k, i in enumerate(idx)}
    assert got == want


@_SETTINGS
@given(old=sparse_vec(max_id=15), new=sparse_vec(max_id=15),
       mask_ids=st.lists(st.integers(0, 15), unique=True, max_size=10),
       complement=st.booleans(), replace=st.booleans(),
       accum=st.sampled_from([None, "plus", "min"]))
def test_merge_matches_grb_masked_write_oracle(old, new, mask_ids,
                                               complement, replace, accum):
    """merge == the GraphBLAS masked-write rule (spec §3.5.3):
    Z = T (no accum) or C⊙T (accum); where M: C := Z's pattern/value;
    where ~M: C kept (replace=False) or deleted (replace=True)."""
    mask = {i: 1 for i in mask_ids}
    allowed = set(mask)
    universe = set(old) | set(new) | allowed
    if complement:
        allowed = universe - allowed

    z = dict(old)
    if accum is None:
        z = dict(new)
    else:
        fn = _BIN[accum]
        for k2, v2 in new.items():
            z[k2] = fn(old[k2], v2) if k2 in old else v2
    want = {}
    for k2 in universe:
        if k2 in allowed:
            if k2 in z and (accum is not None or k2 in new or k2 not in old):
                # no-accum Z = T exactly; with accum Z has the union pattern
                want[k2] = z[k2] if (accum is not None or k2 in new) else None
        else:
            if k2 in old and not replace:
                want[k2] = old[k2]
    want = {k2: v2 for k2, v2 in want.items() if v2 is not None}

    got = _as_dict(
        K.to_table(
            K.merge(_vec_tbl(old), _vec_tbl(new),
                    mask=_vec_tbl(mask) if mask else _vec_tbl({}),
                    complement=complement, replace=replace, accum=accum)
        )
    )
    assert got == {k2: float(v2) for k2, v2 in want.items()}


@_SETTINGS
@given(s=st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=20),
       d=st.data(),
       k=st.integers(-(2**63), 2**63 - 1))
def test_uint64_shift_predicates_match_bigint(s, d, k):
    """_le/_ge/_eq_shift == exact Python big-int arithmetic over the full
    uint64 range (the int64-cast regression territory)."""
    from raygraph.kernels import _eq_shift, _ge_shift, _le_shift

    sa = np.array(s, np.uint64)
    da = np.array(d.draw(st.lists(st.integers(0, 2**64 - 1),
                                  min_size=len(s), max_size=len(s))), np.uint64)
    want_le = np.array([int(x) <= int(y) + k for y, x in zip(sa, da)])
    want_ge = np.array([int(x) >= int(y) + k for y, x in zip(sa, da)])
    want_eq = np.array([int(x) == int(y) + k for y, x in zip(sa, da)])
    assert (_le_shift(da, sa, k) == want_le).all()
    assert (_ge_shift(da, sa, k) == want_ge).all()
    assert (_eq_shift(da, sa, k) == want_eq).all()


def _mat_dict(tbl: pa.Table) -> dict:
    """(src,dst,w) table -> dict; an all-empty Dataset can surface as a
    zero-column table (Ray empty-block quirk) — treat as empty."""
    if tbl.num_rows == 0 or "src" not in tbl.column_names:
        return {}
    return {(int(r), int(c)): w for r, c, w in
            zip(tbl["src"].to_pylist(), tbl["dst"].to_pylist(),
                tbl["w"].to_pylist())}


@given(a=sparse_mat(), b=sparse_mat(), m=sparse_mat(), comp=st.booleans())
@_SETTINGS
def test_mxm_masked_matches_dict_oracle(a, b, m, comp):
    """C(mask) << A.mxm(B) over random sparse matrices: equals the dict
    product filtered by mask structure (complement = the rest)."""
    got = K.to_table(
        K.mxm(_mat_tbl(a), _mat_tbl(b), "plus_times", mask=_mat_tbl(m),
              complement=comp),
        sort_by=None,
    )
    want: dict = {}
    for (i, k1), wa in a.items():
        for (k2, j), wb in b.items():
            if k1 == k2:
                want[(i, j)] = want.get((i, j), 0.0) + wa * wb
    keys = set(m) if not comp else set(want) - set(m)
    want = {k: v for k, v in want.items() if k in keys}
    assert _mat_dict(got) == want


@given(a=sparse_mat(), data=st.data())
@_SETTINGS
def test_extract_submatrix_matches_dict_oracle(a, data):
    """A[rows, cols] with random (possibly duplicate) indices."""
    rows = data.draw(st.lists(st.integers(0, 7), min_size=1, max_size=5))
    cols = data.draw(st.lists(st.integers(0, 7), min_size=1, max_size=5))
    got = K.to_table(
        K.extract_submatrix(_mat_tbl(a), np.array(rows, np.uint64),
                            np.array(cols, np.uint64)),
        sort_by=None,
    )
    want = {}
    for p, i in enumerate(rows):
        for q, j in enumerate(cols):
            if (i, j) in a:
                want[(p, q)] = float(a[(i, j)])
    assert _mat_dict(got) == want


@given(c=sparse_mat(), a_cells=st.data())
@_SETTINGS
def test_assign_submatrix_matches_dict_oracle(c, a_cells):
    """C[rows, cols] << A (no accum: region replaced) and with
    accum=plus (union + combine) vs dict oracles."""
    rows = [1, 3, 5]
    cols = [0, 2, 6]
    sub = a_cells.draw(
        st.dictionaries(
            st.tuples(st.integers(0, 2), st.integers(0, 2)),
            st.integers(1, 9), max_size=5))
    at = pa.table({
        "src": np.array([k[0] for k in sub], np.uint64),
        "dst": np.array([k[1] for k in sub], np.uint64),
        "w": np.array([float(v) for v in sub.values()], np.float64),
    })
    region = {(i, j) for i in rows for j in cols}
    mapped = {(rows[p], cols[q]): float(v) for (p, q), v in sub.items()}
    # no accum: region replaced by mapped pattern
    want = {k: float(v) for k, v in c.items() if k not in region}
    want.update(mapped)
    got = K.to_table(K.assign_submatrix(
        _mat_tbl(c), np.array(rows, np.uint64), np.array(cols, np.uint64), at),
        sort_by=None)
    assert _mat_dict(got) == want
    # accum=plus: union pattern, combine where both
    want2 = {k: float(v) for k, v in c.items()}
    for k, v in mapped.items():
        want2[k] = want2.get(k, 0.0) + v
    got2 = K.to_table(K.assign_submatrix(
        _mat_tbl(c), np.array(rows, np.uint64), np.array(cols, np.uint64), at,
        accum="plus"), sort_by=None)
    assert _mat_dict(got2) == want2


@given(a=sparse_mat(), b=sparse_mat(), m=sparse_mat())
@_SETTINGS
def test_mxm_dot_mode_equals_wedge_and_oracle(a, b, m):
    """The mask-driven dot-product mode (kernels._mxm_dot) must agree
    bit-for-bit with wedge mode and the dict oracle on every random
    sparse instance (reference core/matrix.py:2206 masked product)."""
    want: dict = {}
    for (i, k1), wa in a.items():
        for (k2, j), wb in b.items():
            if k1 == k2:
                want[(i, j)] = want.get((i, j), 0.0) + wa * wb
    want = {k: v for k, v in want.items() if k in m}
    stats: dict = {}
    got_dot = _mat_dict(K.to_table(
        K.mxm(_mat_tbl(a), _mat_tbl(b), "plus_times", mask=_mat_tbl(m),
              mode="dot"), sort_by=None))
    got_wedge = _mat_dict(K.to_table(
        K.mxm(_mat_tbl(a), _mat_tbl(b), "plus_times", mask=_mat_tbl(m),
              mode="wedge"), sort_by=None))
    got_auto = _mat_dict(K.to_table(
        K.mxm(_mat_tbl(a), _mat_tbl(b), "plus_times", mask=_mat_tbl(m),
              mode="auto", stats=stats), sort_by=None))
    assert got_dot == want
    assert got_wedge == want
    assert got_auto == want
    assert stats["mode"] in ("dot", "wedge")
    assert stats["est_wedges"] >= 0 and stats["est_dot_rows"] >= 0


@given(old=sparse_mat(), new=sparse_mat(), m=sparse_mat(),
       comp=st.booleans(), vm=st.booleans(), acc=st.sampled_from([None, "plus"]),
       rep=st.booleans(), use_mask=st.booleans())
@_SETTINGS
def test_merge_matrix_truth_table(old, new, m, comp, vm, acc, rep, use_mask):
    """Full matrix output control C(mask, accum, replace) << new vs a
    brute-force GrB masked-write oracle (VERDICT r3 next #2; reference
    core/mask.py:149,185 + core/descriptor.py:68-80). Mask values are
    drawn with explicit zeros so value_mask differs from structural."""
    mval = {k: float(v % 2) for k, v in m.items()}  # zeros present
    mtbl = pa.table({
        "src": np.array([k[0] for k in mval], np.uint64),
        "dst": np.array([k[1] for k in mval], np.uint64),
        "w": np.array(list(mval.values()), np.float64),
    })
    want: dict = {}
    keys = set(old) | set(new) | (set(mval) if use_mask else set())
    for key in keys:
        in_o, in_n = key in old, key in new
        if not use_mask:
            if rep and acc is None:
                in_o = False
        else:
            allowed = key in mval and (not vm or mval[key] != 0)
            if comp:
                allowed = not allowed
            in_n = in_n and allowed
            if acc is None:
                in_o = in_o and ((not allowed) or in_n)
            if rep:
                in_o = in_o and allowed
        if not (in_o or in_n):
            continue
        if in_o and in_n and acc is not None:
            want[key] = float(old[key] + new[key])
        elif in_n:
            want[key] = float(new[key])
        else:
            want[key] = float(old[key])
    got = _mat_dict(K.to_table(K.merge_matrix(
        _mat_tbl(old), _mat_tbl(new), mask=mtbl if use_mask else None,
        complement=comp, value_mask=vm, accum=acc, replace=rep),
        sort_by=None))
    assert got == want


@given(m=sparse_mat(), v=sparse_vec(max_id=7), mk=sparse_vec(max_id=7),
       comp=st.booleans(), vm=st.booleans())
@_SETTINGS
def test_mxv_value_mask_matches_oracle(m, v, mk, comp, vm):
    """w(mask.V) << A.mxv(v): value masks on the mxv output path
    (VERDICT r3 next #3; reference ValueMask core/mask.py:149)."""
    mkv = {k: float(x % 2) for k, x in mk.items()}  # explicit zeros
    mtbl = pa.table({"v": np.array(sorted(mkv), np.uint64),
                     "val": np.array([mkv[k] for k in sorted(mkv)], np.float64)})
    prod: dict = {}
    for (i, j), a in m.items():
        if j in v:
            prod[i] = prod.get(i, 0.0) + a * v[j]
    def allowed(i):
        ok = i in mkv and (not vm or mkv[i] != 0)
        return not ok if comp else ok
    want = {i: float(x) for i, x in prod.items() if allowed(i)}
    got = _as_dict(K.to_table(K.mxv(
        _mat_tbl(m), _vec_tbl(v), "plus_times", mask=mtbl,
        mask_complement=comp, mask_value=vm)))
    assert got == want


@given(c=sparse_mat(), data=st.data(), acc=st.sampled_from([None, "plus"]),
       rep=st.booleans(), vm=st.booleans(), comp=st.booleans())
@_SETTINGS
def test_assign_submatrix_masked_matches_dict_oracle(c, data, acc, rep, vm, comp):
    """C(M, accum, replace)[rows, cols] << A with a value mask carrying
    explicit zeros — GxB_subassign scope: the mask governs only the
    region, outside-region C is untouched."""
    rows = [1, 3, 5]
    cols = [0, 2, 6]
    sub = data.draw(st.dictionaries(
        st.tuples(st.integers(0, 2), st.integers(0, 2)),
        st.integers(1, 9), max_size=6))
    mcells = data.draw(st.dictionaries(
        st.tuples(st.sampled_from(rows), st.sampled_from(cols)),
        st.integers(0, 2), max_size=9))
    at = pa.table({
        "src": np.array([k[0] for k in sub], np.uint64),
        "dst": np.array([k[1] for k in sub], np.uint64),
        "w": np.array([float(v) for v in sub.values()], np.float64),
    })
    mt = pa.table({
        "src": np.array([k[0] for k in mcells], np.uint64),
        "dst": np.array([k[1] for k in mcells], np.uint64),
        "w": np.array([float(v) for v in mcells.values()], np.float64),
    })
    region = {(i, j) for i in rows for j in cols}
    mapped = {(rows[p], cols[q]): float(v) for (p, q), v in sub.items()}
    want = {k: float(v) for k, v in c.items() if k not in region}
    for key in region:
        in_o, in_n = key in c, key in mapped
        allowed = key in mcells and (not vm or mcells[key] != 0)
        if comp:
            allowed = not allowed
        in_n = in_n and allowed
        if acc is None:
            in_o = in_o and ((not allowed) or in_n)
        if rep:
            in_o = in_o and allowed
        if not (in_o or in_n):
            continue
        if in_o and in_n and acc is not None:
            want[key] = float(c[key]) + mapped[key]
        elif in_n:
            want[key] = mapped[key]
        else:
            want[key] = float(c[key])
    got = _mat_dict(K.to_table(K.assign_submatrix(
        _mat_tbl(c), np.array(rows, np.uint64), np.array(cols, np.uint64), at,
        accum=acc, mask=mt, value_mask=vm, complement=comp, replace=rep),
        sort_by=None))
    assert got == want


_POS_MONOIDS = {"min": min, "max": max, "plus": lambda a, b: a + b}


@_SETTINGS
@given(m=sparse_mat(), v=sparse_vec(max_id=7),
       mon=st.sampled_from(sorted(_POS_MONOIDS)),
       which=st.sampled_from(["firsti", "firstj", "secondi", "secondj"]),
       off=st.sampled_from([0, 1]))
def test_mxv_positional_matches_dict_oracle(m, v, mon, which, off):
    # mxv f(a_ij, u_j): firsti=i, firstj=j, secondi=j, secondj=0
    add = _POS_MONOIDS[mon]
    name = f"{mon}_{which}" + ("1" if off else "")
    want: dict = {}
    for (i, j), _a in m.items():
        if j in v:
            x = float({"firsti": i, "firstj": j,
                       "secondi": j, "secondj": 0}[which] + off)
            want[i] = x if i not in want else add(want[i], x)
    got = _as_dict(K.to_table(K.mxv(_mat_tbl(m), _vec_tbl(v), name)))
    assert got == want


@_SETTINGS
@given(m=sparse_mat(), v=sparse_vec(max_id=7),
       which=st.sampled_from(["firsti", "firstj", "secondi", "secondj"]))
def test_vxm_positional_matches_dict_oracle(m, v, which):
    # vxm f(u_i, a_ij), u' a 1xn row: firsti=0, firstj=i, secondi=i, secondj=j
    want: dict = {}
    for (i, j), _a in m.items():
        if i in v:
            x = float({"firsti": 0, "firstj": i,
                       "secondi": i, "secondj": j}[which])
            want[j] = x if j not in want else min(want[j], x)
    got = _as_dict(K.to_table(K.vxm(_vec_tbl(v), _mat_tbl(m), f"min_{which}")))
    assert got == want


@_SETTINGS
@given(a=sparse_mat(max_nnz=12), b=sparse_mat(max_nnz=12),
       which=st.sampled_from(["firsti", "firstj", "secondi", "secondj"]))
def test_mxm_positional_matches_dict_oracle(a, b, which):
    # mxm f(a_ik, b_kj): firsti=i, firstj=k, secondi=k, secondj=j
    want: dict = {}
    for (i, k), _x in a.items():
        for (k2, j), _y in b.items():
            if k != k2:
                continue
            val = float({"firsti": i, "firstj": k,
                         "secondi": k, "secondj": j}[which])
            want[(i, j)] = val if (i, j) not in want else want[(i, j)] + val
    t = K.to_table(K.mxm(_mat_tbl(a), _mat_tbl(b), f"plus_{which}"))
    got = {(s, d): w for s, d, w in zip(t["src"].to_pylist(),
                                        t["dst"].to_pylist(),
                                        t["w"].to_pylist())}
    assert got == want
