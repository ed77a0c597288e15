"""IO bridges: Matrix Market, scipy.sparse, networkx (reference
graphblas/io/_matrixmarket.py:6, _scipy.py:8, _networkx.py:5).

These are interchange conveniences for driver-sized graphs — the scale
path in and out of this engine is partitioned Parquet edge tables
(graph.build_graph / Dataset.write_parquet). scipy/networkx are absent
from this container, so those bridges import-gate and raise a clear
error instead of failing at import time.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def mmread(path: str) -> pa.Table:
    """Read a Matrix Market coordinate file into an (src, dst, w) edge
    table (0-based; MM files are 1-based). Supports ``general`` and
    ``symmetric`` coordinate matrices, real/integer/pattern fields."""
    with open(path, "r", encoding="utf-8") as f:
        header = f.readline().strip().lower().split()
        if len(header) < 4 or header[0] != "%%matrixmarket":
            raise ValueError("not a MatrixMarket file")
        fmt, field = header[2], header[3]
        symmetry = header[4] if len(header) > 4 else "general"
        if fmt != "coordinate":
            raise ValueError("only coordinate (sparse) MatrixMarket supported")
        if field not in ("real", "integer", "pattern"):
            # complex/other fields would silently drop numeric content
            raise ValueError(f"unsupported MatrixMarket field: {field}")
        if symmetry not in ("general", "symmetric"):
            # skew-symmetric/hermitian would need negated/conjugated
            # mirror entries; parsing them as stored would silently drop
            # half the matrix
            raise ValueError(f"unsupported MatrixMarket symmetry: {symmetry}")
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        nrows, ncols, nnz = (int(x) for x in line.split())
        data = np.loadtxt(f, ndmin=2) if nnz else np.zeros((0, 3))
    if nnz and data.shape[0] != nnz:
        raise ValueError(f"expected {nnz} entries, found {data.shape[0]}")
    src = data[:, 0].astype(np.uint64) - 1 if nnz else np.empty(0, np.uint64)
    dst = data[:, 1].astype(np.uint64) - 1 if nnz else np.empty(0, np.uint64)
    if field == "pattern" or data.shape[1] < 3:
        w = np.ones(len(src), np.float64)
    else:
        w = data[:, 2].astype(np.float64)
    if symmetry == "symmetric" and len(src):
        off = src != dst
        src = np.concatenate([src, dst[off]])
        dst = np.concatenate([dst, data[:, 0].astype(np.uint64)[off] - 1])
        w = np.concatenate([w, w[off]])
    tbl = pa.table({"src": src, "dst": dst, "w": w})
    tbl = tbl.replace_schema_metadata({b"mm_shape": f"{nrows} {ncols}".encode()})
    return tbl


def mmwrite(path: str, edges: pa.Table, *, nrows: int | None = None,
            ncols: int | None = None, comment: str = "") -> None:
    """Write an (src, dst, w) edge table as a general real coordinate
    MatrixMarket file (1-based)."""
    src = np.asarray(edges["src"].to_numpy(zero_copy_only=False), np.uint64)
    dst = np.asarray(edges["dst"].to_numpy(zero_copy_only=False), np.uint64)
    w = (np.asarray(edges["w"].to_numpy(zero_copy_only=False), np.float64)
         if "w" in edges.column_names else np.ones(len(src)))
    if nrows is None:
        nrows = int(src.max()) + 1 if len(src) else 0
    if ncols is None:
        ncols = int(dst.max()) + 1 if len(dst) else 0
    with open(path, "w", encoding="utf-8") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        if comment:
            for line in comment.splitlines():
                f.write(f"%{line}\n")
        f.write(f"{nrows} {ncols} {len(src)}\n")
        for s, d, x in zip(src, dst, w):
            # repr(float(x)) round-trips exactly and stays a plain literal
            # (numpy>=2 scalar repr would emit 'np.float64(...)')
            f.write(f"{int(s) + 1} {int(d) + 1} {float(x)!r}\n")


def to_scipy(edges: pa.Table, *, n: int | None = None):
    """Edge table -> scipy.sparse.csr_matrix (driver-sized graphs only)."""
    try:
        from scipy.sparse import coo_matrix
    except ImportError as e:  # pragma: no cover - scipy absent in container
        raise ImportError("scipy is not installed in this environment; "
                          "use parquet edge tables for interchange") from e
    src = np.asarray(edges["src"].to_numpy(zero_copy_only=False), np.uint64)
    dst = np.asarray(edges["dst"].to_numpy(zero_copy_only=False), np.uint64)
    if len(src) and max(int(src.max()), int(dst.max())) >= 2**63:
        # scipy indices are signed: a full-range splitmix64 id would wrap
        # negative — require densely re-encoded ids for this bridge
        raise ValueError("to_scipy requires vertex ids < 2^63; "
                         "re-encode hashed ids to dense indices first")
    src, dst = src.astype(np.int64), dst.astype(np.int64)
    w = (np.asarray(edges["w"].to_numpy(zero_copy_only=False), np.float64)
         if "w" in edges.column_names else np.ones(len(src)))
    if n is None:
        n = int(max(src.max(), dst.max())) + 1 if len(src) else 0
    return coo_matrix((w, (src, dst)), shape=(n, n)).tocsr()


def from_scipy(m) -> pa.Table:
    """scipy sparse matrix -> (src, dst, w) edge table."""
    coo = m.tocoo()
    return pa.table({"src": coo.row.astype(np.uint64),
                     "dst": coo.col.astype(np.uint64),
                     "w": coo.data.astype(np.float64)})


def to_networkx(edges: pa.Table, *, directed: bool = True):
    """Edge table -> networkx (Di)Graph (driver-sized graphs only)."""
    try:
        import networkx as nx
    except ImportError as e:  # pragma: no cover - networkx absent
        raise ImportError("networkx is not installed in this environment") from e
    g = nx.DiGraph() if directed else nx.Graph()
    # uint64 -> python int: ids >= 2^63 must stay positive, not wrap
    src = np.asarray(edges["src"].to_numpy(zero_copy_only=False), np.uint64)
    dst = np.asarray(edges["dst"].to_numpy(zero_copy_only=False), np.uint64)
    w = (np.asarray(edges["w"].to_numpy(zero_copy_only=False), np.float64)
         if "w" in edges.column_names else np.ones(len(src)))
    g.add_weighted_edges_from(zip(src.tolist(), dst.tolist(), w.tolist()))
    return g


def from_networkx(g) -> pa.Table:
    """networkx graph -> (src, dst, w) edge table."""
    rows = [(int(u), int(v), float(d.get("weight", 1.0)))
            for u, v, d in g.edges(data=True)]
    if not rows:
        return pa.table({"src": pa.array([], pa.uint64()),
                         "dst": pa.array([], pa.uint64()),
                         "w": pa.array([], pa.float64())})
    src, dst, w = zip(*rows)
    return pa.table({"src": np.asarray(src, np.uint64),
                     "dst": np.asarray(dst, np.uint64),
                     "w": np.asarray(w, np.float64)})


# ------------------------------------------------ small constructors ----
# (reference matrix.py:1398-1577 from_dense/to_dense/from_dicts,
# vector.py:731-1997 from_dense/from_pairs — driver-sized conveniences;
# the scale path stays partitioned Parquet / from_coo)


def matrix_from_dense(a: np.ndarray, *, missing_value=None) -> pa.Table:
    """Dense 2-D array -> (src, dst, w) edge table. With
    ``missing_value`` set, entries equal to it are skipped (the
    reference's from_dense missing_value semantics); otherwise every
    cell becomes an explicit entry."""
    a = np.asarray(a)
    if a.ndim != 2:
        raise ValueError("matrix_from_dense: need a 2-D array")
    if missing_value is None:
        r, c = np.indices(a.shape)
        r, c = r.ravel(), c.ravel()
        w = a.ravel()
    else:
        # NaN != NaN elementwise, so `a != missing_value` would keep every
        # cell including the NaNs — match the reference's from_dense, which
        # treats a NaN missing_value as "skip the NaNs"
        if isinstance(missing_value, float) and np.isnan(missing_value):
            keep = ~np.isnan(a)
        else:
            keep = a != missing_value
        r, c = np.nonzero(keep)
        w = a[r, c]
    return pa.table({"src": r.astype(np.uint64), "dst": c.astype(np.uint64),
                     "w": w.astype(np.float64)})


def matrix_to_dense(edges: pa.Table, *, nrows: int | None = None,
                    ncols: int | None = None, fill=0.0) -> np.ndarray:
    """(src, dst, w) edge table -> dense 2-D array (driver-sized)."""
    s = np.asarray(edges["src"].to_numpy(zero_copy_only=False), np.int64)
    d = np.asarray(edges["dst"].to_numpy(zero_copy_only=False), np.int64)
    w = np.asarray(edges["w"].to_numpy(zero_copy_only=False), np.float64)
    nr = nrows if nrows is not None else (int(s.max()) + 1 if len(s) else 0)
    nc = ncols if ncols is not None else (int(d.max()) + 1 if len(d) else 0)
    out = np.full((nr, nc), fill, np.float64)
    out[s, d] = w
    return out


def matrix_from_dicts(d: dict, *, order: str = "rowwise") -> pa.Table:
    """{row: {col: val}} (or colwise {col: {row: val}}) -> edge table
    (reference Matrix.from_dicts)."""
    rows, cols, vals = [], [], []
    for outer, inner in d.items():
        for k, v in inner.items():
            rows.append(outer)
            cols.append(k)
            vals.append(v)
    r = np.asarray(rows, np.uint64)
    c = np.asarray(cols, np.uint64)
    if order == "colwise":
        r, c = c, r
    elif order != "rowwise":
        raise ValueError("order must be 'rowwise' or 'colwise'")
    return pa.table({"src": r, "dst": c,
                     "w": np.asarray(vals, np.float64)})


def matrix_to_dicts(edges: pa.Table) -> dict:
    """Edge table -> {row: {col: val}} (driver-sized)."""
    out: dict = {}
    s = np.asarray(edges["src"].to_numpy(zero_copy_only=False), np.int64)
    d = np.asarray(edges["dst"].to_numpy(zero_copy_only=False), np.int64)
    w = np.asarray(edges["w"].to_numpy(zero_copy_only=False), np.float64)
    for i, j, v in zip(s, d, w):
        out.setdefault(int(i), {})[int(j)] = float(v)
    return out


def vector_from_dense(x: np.ndarray, *, missing_value=None) -> pa.Table:
    """Dense 1-D array -> (v, val) vector table."""
    x = np.asarray(x)
    if x.ndim != 1:
        raise ValueError("vector_from_dense: need a 1-D array")
    if missing_value is None:
        idx = np.arange(len(x))
    elif isinstance(missing_value, float) and np.isnan(missing_value):
        idx = np.nonzero(~np.isnan(x))[0]  # NaN != NaN keeps everything
    else:
        idx = np.nonzero(x != missing_value)[0]
    return pa.table({"v": idx.astype(np.uint64),
                     "val": x[idx].astype(np.float64)})


def vector_to_dense(vec: pa.Table, *, size: int | None = None,
                    fill=0.0) -> np.ndarray:
    v = np.asarray(vec["v"].to_numpy(zero_copy_only=False), np.int64)
    x = np.asarray(vec["val"].to_numpy(zero_copy_only=False), np.float64)
    n = size if size is not None else (int(v.max()) + 1 if len(v) else 0)
    out = np.full(n, fill, np.float64)
    out[v] = x
    return out


def vector_from_pairs(pairs, *, dup_op: str = "raise") -> pa.Table:
    """[(index, value), ...] -> (v, val) table (reference
    Vector.from_pairs, vector.py:731): duplicate indices combine by the
    named monoid, or raise when dup_op='raise' (the reference default)."""
    from raygraph.ops import MONOID, local_combine

    if not pairs:
        return pa.table({"v": pa.array([], pa.uint64()),
                         "val": pa.array([], pa.float64())})
    v = np.asarray([p[0] for p in pairs], np.uint64)
    x = np.asarray([p[1] for p in pairs], np.float64)
    if dup_op == "raise":
        if len(np.unique(v)) != len(v):
            raise ValueError("vector_from_pairs: duplicate indices "
                             "(pass dup_op to combine)")
        return pa.table({"v": v, "val": x})
    k, s = local_combine(MONOID[dup_op], v, x)
    return pa.table({"v": k, "val": s})


# ------------------------------------------- pydata-sparse / awkward ----
# (reference io.py to_pydata_sparse/from_pydata_sparse and
# to_awkward/from_awkward, graphblas/io/_sparse.py + _awkward.py —
# import-gated like the scipy/networkx bridges above; driver-sized)


def to_pydata_sparse(edges: pa.Table, *, n: int | None = None):
    """Edge table -> sparse.COO (pydata/sparse)."""
    try:
        import sparse
    except ImportError as e:  # pragma: no cover - sparse absent
        raise ImportError("pydata 'sparse' is not installed in this "
                          "environment") from e
    src = np.asarray(edges["src"].to_numpy(zero_copy_only=False), np.uint64)
    dst = np.asarray(edges["dst"].to_numpy(zero_copy_only=False), np.uint64)
    w = (np.asarray(edges["w"].to_numpy(zero_copy_only=False), np.float64)
         if "w" in edges.column_names else np.ones(len(src)))
    if n is None:
        n = int(max(src.max(), dst.max())) + 1 if len(src) else 0
    return sparse.COO(np.stack([src, dst]).astype(np.intp), w,
                      shape=(n, n))


def from_pydata_sparse(m) -> pa.Table:
    """sparse.COO / GCXS -> (src, dst, w) edge table."""
    coo = m.tocoo() if hasattr(m, "tocoo") else m
    return pa.table({"src": np.asarray(coo.coords[0], np.uint64),
                     "dst": np.asarray(coo.coords[1], np.uint64),
                     "w": np.asarray(coo.data, np.float64)})


def vector_to_awkward(vec: pa.Table):
    """Vector -> awkward record array {indices, values}."""
    try:
        import awkward as ak
    except ImportError as e:  # pragma: no cover - awkward absent
        raise ImportError("awkward is not installed in this "
                          "environment") from e
    return ak.Array({
        "indices": np.asarray(vec["v"].to_numpy(zero_copy_only=False),
                              np.uint64),
        "values": np.asarray(vec["val"].to_numpy(zero_copy_only=False)),
    })


def vector_from_awkward(arr) -> pa.Table:
    """awkward {indices, values} record array -> (v, val) table."""
    import numpy as _np

    return pa.table({
        "v": _np.asarray(arr["indices"], _np.uint64),
        "val": _np.asarray(arr["values"]),
    })


def matrix_to_awkward(edges: pa.Table):
    """Matrix -> awkward ragged rows {row, cols, vals} (CSR-shaped)."""
    try:
        import awkward as ak
    except ImportError as e:  # pragma: no cover - awkward absent
        raise ImportError("awkward is not installed in this "
                          "environment") from e
    src = np.asarray(edges["src"].to_numpy(zero_copy_only=False), np.uint64)
    dst = np.asarray(edges["dst"].to_numpy(zero_copy_only=False), np.uint64)
    w = (np.asarray(edges["w"].to_numpy(zero_copy_only=False), np.float64)
         if "w" in edges.column_names else np.ones(len(src)))
    order = np.lexsort((dst, src))
    src, dst, w = src[order], dst[order], w[order]
    starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
    offsets = np.r_[starts, len(src)].astype(np.int64)
    return ak.Array({
        "row": src[starts],
        "cols": ak.unflatten(dst, np.diff(offsets)),
        "vals": ak.unflatten(w, np.diff(offsets)),
    })


def matrix_from_awkward(arr) -> pa.Table:
    """awkward ragged {row, cols, vals} -> (src, dst, w) table."""
    import awkward as ak
    import numpy as _np

    counts = ak.num(arr["cols"])
    src = _np.repeat(_np.asarray(arr["row"], _np.uint64),
                     _np.asarray(counts, _np.int64))
    return pa.table({
        "src": src,
        "dst": _np.asarray(ak.flatten(arr["cols"]), _np.uint64),
        "w": _np.asarray(ak.flatten(arr["vals"]), _np.float64),
    })


def matrix_from_scalar(s: float, nrows: int, ncols: int) -> pa.Table:
    """Constant (iso-valued full) matrix (reference ``Matrix.from_scalar``,
    core/matrix.py:1398 region): every cell holds ``s``.  Small-scale
    constructor — a dense nrows x ncols table; the reference's iso
    compression is an in-memory optimization our Arrow tables don't
    need at this size (SURVEY §1.3)."""
    return matrix_from_dense(np.full((int(nrows), int(ncols)), float(s)))


def vector_from_scalar(s: float, size: int) -> pa.Table:
    """Constant full vector (reference ``Vector.from_scalar``)."""
    return vector_from_dense(np.full(int(size), float(s)))


def ss_export_matrix(edges: pa.Table, format: str = "csr") -> dict:
    """SuiteSparse-style structural export of a COO edge table
    (reference ``Matrix.ss.export`` formats, core/ss/matrix.py:1165-1853):

    - ``csr`` / ``csc``: ``indptr`` spans the full index range
      [0, max_index+1) of the sorted axis (empty rows/cols cost one
      int64 each — the reference's non-hypersparse form);
    - ``dcsr`` / ``dcsc``: doubly-compressed — ``rows``/``cols`` lists
      only the NON-EMPTY majors and ``indptr`` has one entry per stored
      major (reference core/matrix.py:1704-1853), the form whose cost is
      independent of the index-space size (full-range uint64 vertex ids
      here, so dcsr/dcsc are the only exact exports for hashed ids);
    - ``coo``: sorted triples.

    Driver-side utility over a (small) materialized table — the
    distributed layout is the CSR-block Dataset (graph.py), which is
    itself doubly-compressed per partition (src_pos lists only non-empty
    rows)."""
    src = np.asarray(edges["src"].to_numpy(zero_copy_only=False), np.uint64)
    dst = np.asarray(edges["dst"].to_numpy(zero_copy_only=False), np.uint64)
    w = (np.asarray(edges["w"].to_numpy(zero_copy_only=False))
         if "w" in edges.column_names else np.ones(len(src)))
    major, minor = (src, dst) if format in ("csr", "dcsr") else (dst, src)
    if format == "coo":
        order = np.lexsort((dst, src))
        return {"format": "coo", "rows": src[order], "cols": dst[order],
                "values": w[order], "nvals": int(len(w))}
    if format not in ("csr", "csc", "dcsr", "dcsc"):
        raise ValueError(f"ss_export_matrix: unknown format {format!r}")
    order = np.lexsort((minor, major))
    major, minor, w = major[order], minor[order], w[order]
    idx_name = "col_indices" if format.endswith("sr") else "row_indices"
    if format in ("csr", "csc"):
        n = int(major.max()) + 1 if len(major) else 0
        counts = np.bincount(major.astype(np.int64), minlength=n)
        indptr = np.r_[0, np.cumsum(counts)].astype(np.int64)
        return {"format": format, "indptr": indptr, idx_name: minor,
                "values": w, "nvals": int(len(w))}
    umaj, counts = np.unique(major, return_counts=True)
    indptr = np.r_[0, np.cumsum(counts)].astype(np.int64)
    maj_name = "rows" if format == "dcsr" else "cols"
    return {"format": format, maj_name: umaj, "indptr": indptr,
            idx_name: minor, "values": w, "nvals": int(len(w))}


def ss_import_matrix(d: dict) -> pa.Table:
    """Inverse of :func:`ss_export_matrix` — rebuild the COO edge table."""
    fmt = d["format"]
    if fmt == "coo":
        return pa.table({"src": np.asarray(d["rows"], np.uint64),
                         "dst": np.asarray(d["cols"], np.uint64),
                         "w": np.asarray(d["values"])})
    indptr = np.asarray(d["indptr"], np.int64)
    counts = np.diff(indptr)
    if fmt in ("csr", "csc"):
        major = np.repeat(np.arange(len(counts), dtype=np.uint64), counts)
    elif fmt in ("dcsr", "dcsc"):
        key = "rows" if fmt == "dcsr" else "cols"
        major = np.repeat(np.asarray(d[key], np.uint64), counts)
    else:
        raise ValueError(f"ss_import_matrix: unknown format {fmt!r}")
    minor = np.asarray(d["col_indices" if fmt.endswith("sr")
                         else "row_indices"], np.uint64)
    src, dst = (major, minor) if fmt.endswith("sr") else (minor, major)
    return pa.table({"src": src, "dst": dst,
                     "w": np.asarray(d["values"])})
