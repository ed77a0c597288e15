"""Multi-column value kernels: complex dtypes (FC32/FC64) and UDT struct
values over Ray Data vector/edge tables.

The reference exposes complex dtypes (FC32/FC64, registered from the
SuiteSparse C library — reference graphblas/core/dtypes.py:68-83) and
user-defined types (UDTs = numpy structured dtypes via
``dtypes.register_new``, reference graphblas/core/dtypes.py:178-244),
and the operator machinery resolves typed variants over them.  Arrow has
no complex type, but C's ``double _Complex`` is literally a pair of
float64s — so here a complex vector travels as TWO float64 columns
``(v, re, im)`` and a complex matrix as ``(src, dst, re, im)``; a UDT
value is a set of named columns, one per struct field.  Kernels view the
column pair as numpy ``complex128`` inside ``map_batches`` (zero-copy in,
one vectorized kernel, split back out), so the hot path stays Arrow ->
numpy with no Python-object rows.

Join-based semantics mirror kernels.py exactly (ewise_add = outer join,
ewise_mult = inner join); the bucketed co-group shuffle is the same
single ``groupby(bucket)`` exchange, generalized to k value columns.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from raygraph.kernels import _DEFAULT_BUCKETS, _ds
from raygraph.util import mix64


# ------------------------------------------------- generic k-column cogroup --


def _tag_multi(ds, side: int, key: str, num_buckets: int,
               val_cols: tuple[str, ...]):
    """Tag one side with its hash bucket; value columns ride as val_0..k."""

    def fn(t: pa.Table) -> pa.Table:
        v = np.asarray(t[key].to_numpy(zero_copy_only=False), np.uint64)
        cols = {
            "bucket": (mix64(v) % np.uint64(num_buckets)).astype(np.int32),
            "v": v,
            "side": np.full(len(v), side, np.int8),
        }
        for i, c in enumerate(val_cols):
            cols[f"val_{i}"] = np.asarray(
                t[c].to_numpy(zero_copy_only=False), np.float64)
        return pa.table(cols)

    return _ds(ds).map_batches(fn, batch_format="pyarrow")


def _cogroup_multi(sides: list, fn, val_cols: tuple[str, ...],
                   num_buckets: int = _DEFAULT_BUCKETS):
    """One groupby(bucket) shuffle over all sides; per bucket calls
    ``fn(v, vals: list[np.ndarray], side) -> pa.Table``."""
    tagged = [_tag_multi(ds, s, "v", num_buckets, val_cols)
              for ds, s in sides]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.union(t)

    k = len(val_cols)

    def gf(g: pa.Table) -> pa.Table:
        return fn(
            np.asarray(g["v"].to_numpy(zero_copy_only=False), np.uint64),
            [np.asarray(g[f"val_{i}"].to_numpy(zero_copy_only=False),
                        np.float64) for i in range(k)],
            np.asarray(g["side"].to_numpy(zero_copy_only=False), np.int8),
        )

    return u.groupby("bucket").map_groups(gf, batch_format="pyarrow")


def _join_sides_multi(v, vals: list, side, n_sides: int):
    """Multi-way outer join on unique-per-side keys, k value columns.

    Returns (keys, has[side, run], fields: list over k of
    vals[side, run]) — same contract as kernels._join_sides but with a
    dense per-side matrix PER FIELD."""
    order = np.lexsort((side, v))
    v, side = v[order], side[order]
    vals = [x[order] for x in vals]
    if len(v) == 0:
        return v, np.zeros((n_sides, 0), bool), [
            np.zeros((n_sides, 0), np.float64) for _ in vals]
    change = np.r_[True, v[1:] != v[:-1]]
    run_id = np.cumsum(change) - 1
    nruns = int(run_id[-1]) + 1
    has = np.zeros((n_sides, nruns), bool)
    has[side, run_id] = True
    fields = []
    for x in vals:
        m = np.zeros((n_sides, nruns), np.float64)
        m[side, run_id] = x
        fields.append(m)
    return v[change], has, fields


# ----------------------------------------------------------- UDT surface ----
# fn signature: fn(a: dict[field -> array], b: dict[field -> array])
#   -> dict[field -> array]; applied only where BOTH sides are present.


def ewise_udt(a, b, fn: Callable, val_cols: tuple[str, ...],
              *, union: bool = False,
              num_buckets: int = _DEFAULT_BUCKETS):
    """Element-wise op over struct-valued vectors (reference UDT ewise:
    a registered numpy structured-dtype op, core/dtypes.py:178-244 +
    operator register_new).  ``union=False`` = intersection
    (ewise_mult shape); ``union=True`` = op where both present,
    field-wise passthrough otherwise (ewise_add shape)."""
    k = len(val_cols)

    def join(v, vals, side) -> pa.Table:
        keys, has, fields = _join_sides_multi(v, vals, side, 2)
        both = has[0] & has[1]
        if union:
            sel = has[0] | has[1]
        else:
            sel = both
        keys = keys[sel]
        if len(keys) == 0:
            cols = {"v": pa.array([], pa.uint64())}
            for c in val_cols:
                cols[c] = pa.array([], pa.float64())
            return pa.table(cols)
        da = {c: fields[i][0][sel] for i, c in enumerate(val_cols)}
        db = {c: fields[i][1][sel] for i, c in enumerate(val_cols)}
        out = {c: np.where(has[0][sel], da[c], db[c]) for c in val_cols}
        bb = both[sel]
        if bb.any():
            res = fn({c: da[c][bb] for c in val_cols},
                     {c: db[c][bb] for c in val_cols})
            for c in val_cols:
                o = out[c]
                o[bb] = res[c]
        cols = {"v": keys}
        for c in val_cols:
            cols[c] = out[c]
        return pa.table(cols)

    return _cogroup_multi([(a, 0), (b, 1)], join, val_cols, num_buckets)


def apply_udt(x, fn: Callable, val_cols: tuple[str, ...],
              out_cols: tuple[str, ...] | None = None, *, key: str = "v"):
    """apply() over a struct-valued vector: ``fn(dict) -> dict`` runs
    per batch, vectorized; no shuffle."""
    out_cols = out_cols if out_cols is not None else val_cols

    def m(t: pa.Table) -> pa.Table:
        d = {c: np.asarray(t[c].to_numpy(zero_copy_only=False), np.float64)
             for c in val_cols}
        res = fn(d)
        cols = {key: np.asarray(t[key].to_numpy(zero_copy_only=False),
                                np.uint64)}
        for c in out_cols:
            cols[c] = res[c]
        return pa.table(cols)

    return _ds(x).map_batches(m, batch_format="pyarrow")


# ------------------------------------------------------- complex surface ----

COMPLEX_BINARY: dict[str, Callable] = {
    "plus": np.add,
    "minus": np.subtract,
    "times": np.multiply,
    "truediv": np.divide,
    "first": lambda a, b: a,
    "second": lambda a, b: b,
}

# unary: True = complex -> complex, False = complex -> float64
COMPLEX_UNARY: dict[str, tuple[Callable, bool]] = {
    "identity": (lambda z: z, True),
    "ainv": (np.negative, True),
    "minv": (lambda z: 1.0 / z, True),
    "conj": (np.conjugate, True),
    "exp": (np.exp, True),
    "sqrt": (np.sqrt, True),
    "abs": (np.abs, False),
    "creal": (np.real, False),
    "cimag": (np.imag, False),
    "carg": (np.angle, False),
}


def _z(re: np.ndarray, im: np.ndarray) -> np.ndarray:
    return re.astype(np.float64) + 1j * im.astype(np.float64)


def ewise_add_c(a, b, op_name: str = "plus",
                num_buckets: int = _DEFAULT_BUCKETS):
    """Complex element-wise UNION (FC64 ewise_add): op where both
    present, passthrough otherwise."""
    op = COMPLEX_BINARY[op_name]

    def fn(da, db):
        z = op(_z(da["re"], da["im"]), _z(db["re"], db["im"]))
        return {"re": z.real, "im": z.imag}

    return ewise_udt(a, b, fn, ("re", "im"), union=True,
                     num_buckets=num_buckets)


def ewise_mult_c(a, b, op_name: str = "times",
                 num_buckets: int = _DEFAULT_BUCKETS):
    """Complex element-wise INTERSECTION (FC64 ewise_mult)."""
    op = COMPLEX_BINARY[op_name]

    def fn(da, db):
        z = op(_z(da["re"], da["im"]), _z(db["re"], db["im"]))
        return {"re": z.real, "im": z.imag}

    return ewise_udt(a, b, fn, ("re", "im"), union=False,
                     num_buckets=num_buckets)


def cmplx(a, b, num_buckets: int = _DEFAULT_BUCKETS):
    """``binary.cmplx`` (reference core/operator/binary.py:336-368):
    build an FC64 vector from two REAL vectors — re from ``a``, im from
    ``b``, defined on the intersection (it is a binary ⊗)."""

    def widen(x, col):
        def m(t: pa.Table) -> pa.Table:
            v = np.asarray(t["v"].to_numpy(zero_copy_only=False), np.uint64)
            val = np.asarray(t["val"].to_numpy(zero_copy_only=False),
                             np.float64)
            z = np.zeros(len(v))
            return pa.table({"v": v, "re": val if col == "re" else z,
                             "im": val if col == "im" else z})

        return _ds(x).map_batches(m, batch_format="pyarrow")

    return ewise_udt(widen(a, "re"), widen(b, "im"),
                     lambda da, db: {"re": da["re"], "im": db["im"]},
                     ("re", "im"), union=False, num_buckets=num_buckets)


def apply_c(x, op_name: str, *, key: str = "v"):
    """Complex apply: conj / abs / creal / cimag / carg / exp / sqrt /
    ainv / minv (reference FC64 unary family).  Real-valued results come
    back as a plain ``(v, val)`` float64 vector."""
    fn, stays_complex = COMPLEX_UNARY[op_name]

    def m(t: pa.Table) -> pa.Table:
        z = _z(np.asarray(t["re"].to_numpy(zero_copy_only=False)),
               np.asarray(t["im"].to_numpy(zero_copy_only=False)))
        r = fn(z)
        v = np.asarray(t[key].to_numpy(zero_copy_only=False), np.uint64)
        if stays_complex:
            return pa.table({key: v, "re": r.real.astype(np.float64),
                             "im": r.imag.astype(np.float64)})
        return pa.table({key: v, "val": np.asarray(r, np.float64)})

    return _ds(x).map_batches(m, batch_format="pyarrow")


def mxv_c(edges, vec, *, salt: int = 0,
          num_buckets: int = _DEFAULT_BUCKETS):
    """Complex SpMV, plus_times over FC64: w[i] = Σ_j A[i,j] * x[j].

    Same shuffle shape as kernels.mxv: edges and the vector ride ONE
    bucketed co-group on the contraction key (dst), each bucket does a
    vectorized searchsorted gather + complex multiply + per-batch
    combine by src (⊕ = plus is component-separable, so re/im partials
    pre-aggregate independently), then one grouped Sum per component."""
    from ray.data.aggregate import Sum

    def tag_e(t: pa.Table) -> pa.Table:
        dst = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
        return pa.table({
            "bucket": (mix64(dst) % np.uint64(num_buckets)).astype(np.int32),
            "key": dst,
            "src": np.asarray(t["src"].to_numpy(zero_copy_only=False),
                              np.uint64),
            "re": np.asarray(t["re"].to_numpy(zero_copy_only=False),
                             np.float64),
            "im": np.asarray(t["im"].to_numpy(zero_copy_only=False),
                             np.float64),
            "side": np.zeros(t.num_rows, np.int8),
        })

    def tag_v(t: pa.Table) -> pa.Table:
        v = np.asarray(t["v"].to_numpy(zero_copy_only=False), np.uint64)
        return pa.table({
            "bucket": (mix64(v) % np.uint64(num_buckets)).astype(np.int32),
            "key": v,
            "src": np.zeros(len(v), np.uint64),
            "re": np.asarray(t["re"].to_numpy(zero_copy_only=False),
                             np.float64),
            "im": np.asarray(t["im"].to_numpy(zero_copy_only=False),
                             np.float64),
            "side": np.ones(len(v), np.int8),
        })

    u = _ds(edges).map_batches(tag_e, batch_format="pyarrow").union(
        _ds(vec).map_batches(tag_v, batch_format="pyarrow"))

    def gf(g: pa.Table) -> pa.Table:
        side = np.asarray(g["side"].to_numpy(zero_copy_only=False), np.int8)
        key = np.asarray(g["key"].to_numpy(zero_copy_only=False), np.uint64)
        re = np.asarray(g["re"].to_numpy(zero_copy_only=False), np.float64)
        im = np.asarray(g["im"].to_numpy(zero_copy_only=False), np.float64)
        ev = side == 0
        vk = key[~ev]
        if len(vk) == 0 or not ev.any():
            return pa.table({"v": pa.array([], pa.uint64()),
                             "re": pa.array([], pa.float64()),
                             "im": pa.array([], pa.float64())})
        vo = np.argsort(vk, kind="stable")
        vk = vk[vo]
        xz = _z(re[~ev][vo], im[~ev][vo])
        ek, esrc = key[ev], np.asarray(
            g["src"].to_numpy(zero_copy_only=False), np.uint64)[ev]
        pos = np.searchsorted(vk, ek)
        pos_c = np.minimum(pos, len(vk) - 1)
        hit = vk[pos_c] == ek
        if not hit.any():
            return pa.table({"v": pa.array([], pa.uint64()),
                             "re": pa.array([], pa.float64()),
                             "im": pa.array([], pa.float64())})
        z = _z(re[ev][hit], im[ev][hit]) * xz[pos_c[hit]]
        # per-batch combine on src before the grouped exchange
        s = esrc[hit]
        order = np.argsort(s, kind="stable")
        s, z = s[order], z[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        return pa.table({
            "v": s[starts],
            "re": np.add.reduceat(z.real, starts),
            "im": np.add.reduceat(z.imag, starts),
        })

    partials = u.groupby("bucket").map_groups(gf, batch_format="pyarrow")
    return partials.groupby("v").aggregate(
        Sum("re", alias_name="re"), Sum("im", alias_name="im"))


def reduce_scalar_c(x) -> complex:
    """Complex scalar reduce (⊕ = plus): per-batch partial sums, one
    driver-side combine of the tiny partials."""
    def m(t: pa.Table) -> pa.Table:
        re = np.asarray(t["re"].to_numpy(zero_copy_only=False), np.float64)
        im = np.asarray(t["im"].to_numpy(zero_copy_only=False), np.float64)
        return pa.table({"re": [float(re.sum())], "im": [float(im.sum())]})

    parts = _ds(x).map_batches(m, batch_format="pyarrow").take_all()
    return complex(sum(p["re"] for p in parts), sum(p["im"] for p in parts))
