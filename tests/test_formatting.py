"""Repr/formatting grid output (reference formatting.py parity)."""

import numpy as np
import pyarrow as pa

from raygraph import formatting as F


def test_format_vector_small():
    t = pa.table({"v": np.array([0, 3, 5], np.uint64),
                  "val": np.array([1.5, -2.0, 7.25])})
    s = F.format_vector(t, size=6, name="x")
    lines = s.splitlines()
    assert lines[0] == '"x"  nvals: 3  size: 6  dtype: float64'
    assert lines[1].split() == ["index", "0", "3", "5"]
    assert lines[2].split() == ["value", "1.5", "-2", "7.25"]


def test_format_vector_truncated_and_empty():
    t = pa.table({"v": np.arange(25, dtype=np.uint64),
                  "val": np.arange(25, dtype=np.float64)})
    s = F.format_vector(t, max_entries=4)
    assert "..." in s and "nvals: 25" in s
    # only the head window appears
    assert " 20 " not in s

    e = pa.table({"v": np.array([], np.uint64),
                  "val": np.array([], np.float64)})
    assert F.format_vector(e).endswith("(empty)")


def test_format_matrix_dense_grid():
    t = pa.table({"src": np.array([0, 1, 2], np.uint64),
                  "dst": np.array([1, 0, 2], np.uint64),
                  "w": np.array([5.0, 3.5, 1.0])})
    s = F.format_matrix(t, nrows=3, ncols=3, name="A")
    lines = s.splitlines()
    assert lines[0] == '"A"  nvals: 3  shape: (3, 3)  dtype: float64'
    # header row then 3 data rows; missing cells blank
    assert lines[1].split() == ["0", "1", "2"]
    assert lines[2].split() == ["0", "5"]      # (0,1)=5, blanks collapse
    assert "3.5" in lines[3] and "1" in lines[4]


def test_format_matrix_coo_listing():
    n = 40
    t = pa.table({"src": np.arange(n, dtype=np.uint64),
                  "dst": np.arange(n, dtype=np.uint64),
                  "w": np.ones(n)})
    s = F.format_matrix(t, max_entries=5)
    assert "..." in s and "nvals: 40" in s
    assert s.splitlines()[1].split() == ["row", "col", "value"]


def test_format_matrix_on_dataset_limits():
    import ray.data as rd

    n = 1000
    t = pa.table({"src": np.arange(n, dtype=np.uint64),
                  "dst": np.arange(n, dtype=np.uint64),
                  "w": np.ones(n)})
    s = F.format_matrix(rd.from_arrow(t), max_entries=3)
    assert "nvals: 1000" in s and "..." in s


def test_format_scalar():
    assert F.format_scalar(None) == '"s"  value: <missing>'
    assert "value: 2.5" in F.format_scalar(2.5)
