"""Plain-text repr/formatting for vectors and matrices.

The reference ships a formatting module (reference
graphblas/core/formatting.py:349-533) that renders a header line
(name, nvals, size/shape, dtype) plus a truncated index/value grid with
``...`` ellipsis for large objects.  This is the driver-sized,
pandas-free equivalent over COO tables: small objects render as the
same dense grid (blank cell = missing element), large objects render a
head/tail COO listing — the display never materializes more than
``max_entries`` rows from a Dataset (``limit`` pushdown), so calling
repr on a 100-TB table is safe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raygraph.kernels import _ds, _val_dtype_of


def _head(x, n: int) -> pa.Table:
    if isinstance(x, pa.Table):
        return x.slice(0, n)
    from raygraph.kernels import to_table

    return to_table(x.limit(n), sort_by=None)


def _count(x) -> int:
    if isinstance(x, pa.Table):
        return x.num_rows
    return x.count()


def _cell(v) -> str:
    if isinstance(v, float):
        s = f"{v:.6g}"
        return s
    return str(v)


def _grid(rows: list[list[str]]) -> str:
    widths = [max(len(r[c]) for r in rows) for c in range(len(rows[0]))]
    return "\n".join(
        "  ".join(c.rjust(w) for c, w in zip(r, widths)) for r in rows)


def format_vector(x, size: int | None = None, *, max_entries: int = 10,
                  name: str = "v") -> str:
    """Reference-style vector repr: header + index/value grid.

    ≤ max_entries stored entries render fully (dense grid when the id
    space itself is small); larger vectors render head entries + '...'.
    """
    nvals = _count(x)
    dt = _val_dtype_of(x)
    head = _head(x, max_entries + 1)
    hdr = (f'"{name}"  nvals: {nvals}'
           + (f"  size: {size}" if size is not None else "")
           + f"  dtype: {np.dtype(dt).name}")
    if nvals == 0:
        return hdr + "\n(empty)"
    v = np.asarray(head["v"].to_numpy(zero_copy_only=False), np.uint64)
    val = np.asarray(head["val"].to_numpy(zero_copy_only=False))
    trunc = nvals > max_entries
    k = min(len(v), max_entries)
    idx_row = ["index"] + [str(int(i)) for i in v[:k]] + (["..."] if trunc else [])
    val_row = ["value"] + [_cell(x) for x in val[:k].tolist()] + (["..."] if trunc else [])
    return hdr + "\n" + _grid([idx_row, val_row])


def format_matrix(x, nrows: int | None = None, ncols: int | None = None, *,
                  max_entries: int = 10, max_dim: int = 12,
                  name: str = "A") -> str:
    """Reference-style matrix repr.

    When both dims are known and ≤ max_dim, renders the dense grid with
    blank cells for missing elements (the reference's small-matrix
    repr); otherwise a truncated COO listing with '...'.
    """
    nvals = _count(x)
    shape = (f"  shape: ({nrows}, {ncols})"
             if nrows is not None and ncols is not None else "")
    dt = _val_dtype_of(x, "w")
    hdr = f'"{name}"  nvals: {nvals}{shape}  dtype: {np.dtype(dt).name}'
    if nvals == 0:
        return hdr + "\n(empty)"
    small = (nrows is not None and ncols is not None
             and nrows <= max_dim and ncols <= max_dim)
    # dense-grid fetch is bounded by the declared dims, never by nvals
    head = _head(x, min(nvals, max_dim * max_dim) if small
                 else max_entries + 1)
    src = np.asarray(head["src"].to_numpy(zero_copy_only=False), np.uint64)
    dst = np.asarray(head["dst"].to_numpy(zero_copy_only=False), np.uint64)
    w = (np.asarray(head["w"].to_numpy(zero_copy_only=False))
         if "w" in head.column_names else np.ones(len(src)))
    if small:
        cells = {}
        for s, d, v in zip(src.tolist(), dst.tolist(), w.tolist()):
            cells[(int(s), int(d))] = _cell(v)
        rows = [[""] + [str(j) for j in range(ncols)]]
        for i in range(nrows):
            rows.append([str(i)] + [cells.get((i, j), "")
                                    for j in range(ncols)])
        return hdr + "\n" + _grid(rows)
    trunc = nvals > max_entries
    k = min(len(src), max_entries)
    rows = [["row", "col", "value"]]
    for i in range(k):
        rows.append([str(int(src[i])), str(int(dst[i])), _cell(w[i].item())])
    if trunc:
        rows.append(["...", "...", "..."])
    return hdr + "\n" + _grid(rows)


def format_scalar(value, *, name: str = "s") -> str:
    """Scalar repr (reference formatting.py:497)."""
    if value is None:
        return f'"{name}"  value: <missing>'
    t = np.asarray(value).dtype.name
    return f'"{name}"  value: {_cell(value if not isinstance(value, np.generic) else value.item())}  dtype: {t}'
