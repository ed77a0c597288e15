"""Distributed graph build: COO edge Dataset -> per-partition Arrow CSR blocks.

Reference analog: ``Matrix.from_coo(rows, cols, vals, dup_op=...)`` ->
``GrB_Matrix_build`` (graphblas/core/matrix.py:643-698,885) plus the
import/export CSR surface (graphblas/core/ss/matrix.py:1165-3317). Here the
build is a two-shuffle Ray Data pipeline:

  stage 1 (groupby dst-part): resolve edges against the vertex registry
    (drop links to unknown urls), apply ``dup_op`` dedup on (src,dst), and
    annotate each edge with (dst_part, dst_pos) — the destination
    partition and the position of dst inside that partition's sorted
    vertex-id array. The vertex registry rides the SAME shuffle as the
    edges (tagged-union co-group), so no broadcast of the vertex set is
    ever needed — this is what keeps the build valid at 10^12-document
    scale where no single node can hold the id set.

  stage 2 (groupby src-part): build one CSR block Arrow row per partition
    (schema.CSR_BLOCK) with per-row positions precomputed, so that
    iteration-time SpMV does pure vectorized gathers with zero joins.

Partitioning is ``util.part_of`` (splitmix64 of the uint64 vertex id mod
P) and is the single partitioner shared by edges, vertex slices and all
iterative state (SURVEY.md §4 "Data partitioning").
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from raygraph.util import default_num_parts, part_of

def _tag_schema(wdt=np.float64) -> pa.Schema:
    """Tagged-union exchange schema, parameterized by the edge-weight
    dtype so int64/bool-weighted matrices keep their values exact through
    the build (matrix dtype fidelity, VERDICT r4 Missing #1; the
    reference carries any of 13 dtypes per collection,
    core/dtypes.py:16)."""
    return pa.schema(
        [
            pa.field("part", pa.int32()),
            pa.field("src", pa.uint64()),
            pa.field("dst", pa.uint64()),
            pa.field("w", pa.from_numpy_dtype(np.dtype(wdt))),
            pa.field("dst_part", pa.int32()),
            pa.field("dst_pos", pa.int64()),
            pa.field("kind", pa.int8()),  # 0 = edge row, 1 = vertex-registry row
        ]
    )


_TAG_SCHEMA = _tag_schema()


def _edge_w_dtype(edges_ds) -> np.dtype:
    """Schema-level weight dtype of a COO edge Dataset/Table (float64 for
    pattern-only inputs) — resolved ONCE at the build entry so every
    batch of the exchange emits the same Arrow type."""
    try:
        if isinstance(edges_ds, pa.Table):
            schema = edges_ds.schema
        else:
            s = edges_ds.schema()
            schema = s.base_schema if s is not None else None
        if schema is not None and "w" in schema.names:
            return np.dtype(schema.field("w").type.to_pandas_dtype())
    except Exception:
        pass
    return np.dtype(np.float64)


def _tag_table(part, src, dst, w, dst_part, dst_pos, kind,
               wdt=np.float64) -> pa.Table:
    n = len(src)
    return pa.Table.from_arrays(
        [
            pa.array(np.asarray(part, np.int32), pa.int32()),
            pa.array(np.asarray(src, np.uint64), pa.uint64()),
            pa.array(np.asarray(dst, np.uint64), pa.uint64()),
            pa.array(np.asarray(w, wdt)),
            pa.array(np.broadcast_to(np.asarray(dst_part, np.int32), (n,)), pa.int32()),
            pa.array(np.broadcast_to(np.asarray(dst_pos, np.int64), (n,)), pa.int64()),
            pa.array(np.broadcast_to(np.asarray(kind, np.int8), (n,)), pa.int8()),
        ],
        schema=_tag_schema(wdt),
    )


def _member_mask(sorted_ids: np.ndarray, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(is_member, position) of x in sorted_ids via searchsorted."""
    if len(sorted_ids) == 0:
        return np.zeros(len(x), bool), np.zeros(len(x), np.int64)
    pos = np.searchsorted(sorted_ids, x)
    pos_c = np.minimum(pos, len(sorted_ids) - 1)
    return sorted_ids[pos_c] == x, pos_c.astype(np.int64)


@dataclass
class Graph:
    """A built graph: materialized CSR-block Dataset + partition metadata.

    ``blocks`` has one Arrow row per non-empty partition (schema.CSR_BLOCK)
    and is pinned in the object store (``materialize()``) for reuse across
    algorithm iterations — the analog of the reference holding the Matrix
    in process heap between calls (SURVEY.md §3.1).
    """

    blocks: "object"  # ray.data.Dataset (materialized)
    num_parts: int
    sizes: np.ndarray  # vertices per partition (len = num_parts)
    nnz: int
    n_vertices: int
    _ids_cache: list | None = field(default=None, repr=False)

    # ---- driver-side helpers (sandbox-scale; at cluster scale these stay
    # ---- as per-partition object refs and never centralize — see engine.py)
    def iter_block_rows(self, columns: list[str] | None = None):
        """Yield (part, {col: numpy array}) per CSR block, zero-copy Arrow
        (never ``take_all`` — that converts the big list arrays to Python)."""
        ds = self.blocks if columns is None else self.blocks.select_columns(
            ["part"] + columns
        )
        for tbl in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            parts = tbl["part"].to_numpy(zero_copy_only=False)
            names = [c for c in tbl.column_names if c != "part"]
            for i in range(tbl.num_rows):
                row = {}
                for c in names:
                    v = tbl[c][i]
                    row[c] = np.asarray(v.values) if hasattr(v, "values") else v.as_py()
                yield int(parts[i]), row

    def ids_slices(self) -> list[np.ndarray]:
        """Per-partition sorted vertex id arrays (cached)."""
        if self._ids_cache is None:
            out: list[np.ndarray] = [np.empty(0, np.uint64) for _ in range(self.num_parts)]
            for p, row in self.iter_block_rows(["ids"]):
                out[p] = np.asarray(row["ids"], dtype=np.uint64)
            self._ids_cache = out
        return self._ids_cache

    def deg_slices(self) -> list[np.ndarray]:
        out = [np.zeros(s, np.float64) for s in self.sizes]
        for p, row in self.iter_block_rows(["deg"]):
            out[p] = np.asarray(row["deg"], dtype=np.float64)
        return out

    def state(self, fill, dtype=np.float64) -> list[np.ndarray]:
        """Dense per-partition state vector initialized to ``fill``."""
        return [np.full(int(s), fill, dtype=dtype) for s in self.sizes]

    def ids_ref_list(self) -> list:
        """Per-partition ObjectRefs to the sorted vertex-id arrays
        (cached): the id set is immutable, so iterative dataset-mode
        callers (scatter_min_by_id / gather_by_id, once per FastSV round)
        must not re-``ray.put`` O(n_vertices) bytes every call."""
        import ray

        refs = getattr(self, "_ids_refs", None)
        if refs is None:
            refs = [ray.put(a) for a in self.ids_slices()]
            self._ids_refs = refs
        return refs

    def block_ref_list(self) -> list:
        """Per-partition ObjectRefs to one-row CSR block tables (cached);
        pinned from the blocks Dataset when the graph was rebuilt from a
        checkpoint rather than built in-session."""
        import ray

        refs = getattr(self, "_block_refs", None)
        if refs is None:
            refs = [None] * self.num_parts
            for tbl in self.blocks.iter_batches(batch_size=None, batch_format="pyarrow"):
                parts = tbl["part"].to_numpy(zero_copy_only=False)
                for i in range(tbl.num_rows):
                    refs[int(parts[i])] = ray.put(tbl.slice(i, 1))
            self._block_refs = refs
        return refs

    def write_vertex_parquet(self, slices, path: str, name: str = "val",
                             *, resume: bool = True) -> int:
        """Write the (v, <name>) result as partitioned parquet, one file
        per graph partition, directly from tasks. ``slices`` items may be
        numpy arrays or ObjectRefs; vertex ids come from each partition's
        CSR block ref, so the driver never materializes the vertex table.

        Writes are ATOMIC (tmp file + rename), so a killed run never
        leaves a truncated partition file; with ``resume`` (default) a
        re-run skips partitions whose final file already exists — the
        "failed run skips finished partitions" output contract. Returns
        the number of partition files actually (re)written."""
        import ray

        os.makedirs(path, exist_ok=True)
        refs = self.block_ref_list()

        @ray.remote(num_cpus=1)
        def w(p, block, s):
            import pyarrow.parquet as _pq

            final = os.path.join(path, f"part_p{p:05d}.parquet")
            if resume and os.path.exists(final):
                return 0
            ids = np.asarray(block["ids"][0].values, np.uint64)
            tmp = final + ".tmp"
            _pq.write_table(
                pa.table({"v": ids, name: np.asarray(s)}), tmp,
                compression="zstd",
            )
            os.replace(tmp, final)  # atomic on POSIX
            return 1

        return int(sum(ray.get(
            [
                w.remote(p, refs[p], slices[p])
                for p in range(self.num_parts)
                if refs[p] is not None and int(self.sizes[p])
            ]
        )))

    def free_caches(self) -> None:
        """Release the fused/frontier routing caches (O(nnz) object-store
        bytes); algorithms rebuild them on demand. Call between pipeline
        phases when several graphs coexist (memory-aware rule, SCALE.md)."""
        self._fused_cache = None
        self._frontier_cache = None
        self._ids_refs = None

    def to_vertex_table(self, slices: list[np.ndarray], name: str = "val") -> pa.Table:
        """(v, val) Arrow table from per-partition state (driver-side)."""
        ids = self.ids_slices()
        v = np.concatenate([i for i in ids if len(i)]) if self.n_vertices else np.empty(0, np.uint64)
        val = np.concatenate([s for s in slices if len(s)]) if self.n_vertices else np.empty(0)
        order = np.argsort(v, kind="stable")
        return pa.table({"v": v[order], name: val[order]})

    def state_from_table(self, tbl: pa.Table, col: str = "val", fill=0.0, dtype=np.float64):
        """Scatter a (v, val) table into per-partition dense state."""
        out = self.state(fill, dtype=dtype)
        v = np.asarray(tbl["v"].to_numpy(zero_copy_only=False), np.uint64)
        val = np.asarray(tbl[col].to_numpy(zero_copy_only=False), dtype)
        p = part_of(v, self.num_parts)
        ids = self.ids_slices()
        for q in np.unique(p):
            sel = p == q
            ok, pos = _member_mask(ids[q], v[sel])
            out[q][pos[ok]] = val[sel][ok]
        return out


def _normalize_edges(edges_ds, symmetrize: bool, drop_self: bool,
                     num_parts: int, wdt=np.float64):
    """Edge Dataset -> tagged rows keyed by dst partition (kind=0)."""

    def prep(t: pa.Table) -> pa.Table:
        src = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
        dst = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
        if "w" in t.column_names:
            w = np.asarray(
                np.asarray(t["w"].to_numpy(zero_copy_only=False)), wdt)
        else:
            w = np.ones(len(src), wdt)
        if symmetrize:
            src, dst = np.r_[src, dst], np.r_[dst, src]
            w = np.r_[w, w]
        if drop_self:
            keep = src != dst
            src, dst, w = src[keep], dst[keep], w[keep]
        return _tag_table(part_of(dst, num_parts), src, dst, w, -1, -1, 0,
                          wdt=wdt)

    return edges_ds.map_batches(prep, batch_format="pyarrow")


def _vertex_rows(source_ds, num_parts: int, column: str | None,
                 wdt=np.float64):
    """Vertex registry rows: (part, src=id, kind=1), locally uniqued."""

    def vmap(t: pa.Table) -> pa.Table:
        if column is not None:
            v = np.unique(np.asarray(t[column].to_numpy(zero_copy_only=False), np.uint64))
        else:  # derive from edges: union of endpoints
            s = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
            d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
            v = np.unique(np.r_[s, d])
        z = np.zeros(len(v))
        return _tag_table(part_of(v, num_parts), v, z, z, -1, -1, 1, wdt=wdt)

    return source_ds.map_batches(vmap, batch_format="pyarrow")


def _split_group(g: pa.Table, wdt=np.float64):
    kind = np.asarray(g["kind"].to_numpy(zero_copy_only=False))
    src = np.asarray(g["src"].to_numpy(zero_copy_only=False), np.uint64)
    ids = np.unique(src[kind == 1])
    e = kind == 0
    return ids, src[e], (
        np.asarray(g["dst"].to_numpy(zero_copy_only=False), np.uint64)[e],
        np.asarray(
            np.asarray(g["w"].to_numpy(zero_copy_only=False)), wdt)[e],
        np.asarray(g["dst_part"].to_numpy(zero_copy_only=False), np.int32)[e],
        np.asarray(g["dst_pos"].to_numpy(zero_copy_only=False), np.int64)[e],
    )


def _emit_block_table(part, ids, es, ed, ew, edp, edpos, dup_op,
                      binarize, wdt=None) -> pa.Table:
    """Sort + dup_op dedup + one CSR block row (shared by both build paths).

    ``wdt`` is the block weight dtype; None derives it from ``ew`` (the
    exchange already normalized every batch). ``binarize`` always emits
    float64 ones (the weights are discarded); ``deg`` stays float64 (a
    normalization quantity for SpMV, not a stored value)."""
    wdt = np.dtype(wdt) if wdt is not None else np.asarray(ew).dtype
    if binarize:
        wdt = np.dtype(np.float64)
    ew = np.asarray(np.asarray(ew), wdt)
    if len(es):
        order = np.lexsort((ed, es))
        es, ed, ew = es[order], ed[order], ew[order]
        edp, edpos = edp[order], edpos[order]
        new = np.r_[True, (es[1:] != es[:-1]) | (ed[1:] != ed[:-1])]
        starts = np.flatnonzero(new)
        if len(starts) != len(es):
            if dup_op == "raise":
                raise ValueError(
                    "duplicate (src,dst) without dup_op (reference matrix.py:696)"
                )
            if dup_op == "count":
                ew = np.diff(np.r_[starts, len(es)]).astype(wdt)
            elif dup_op == "plus":
                ew = np.add.reduceat(ew, starts)
            elif dup_op == "min":
                ew = np.minimum.reduceat(ew, starts)
            elif dup_op == "max":
                ew = np.maximum.reduceat(ew, starts)
            else:  # first
                ew = ew[starts]
            es, edp, edpos = es[starts], edp[starts], edpos[starts]
        elif dup_op == "count":
            ew = np.ones(len(es), wdt)
        if binarize:
            ew = np.ones(len(es), np.float64)
        usrc, counts = np.unique(es, return_counts=True)
        indptr = np.r_[0, np.cumsum(counts)].astype(np.int64)
        _, src_pos = _member_mask(ids, usrc)
    else:
        ew = np.empty(0, wdt)
        edp = np.empty(0, np.int32)
        edpos = np.empty(0, np.int64)
        indptr = np.zeros(1, np.int64)
        src_pos = np.empty(0, np.int64)
    deg = np.zeros(len(ids), np.float64)
    if len(src_pos):
        deg[src_pos] = (np.add.reduceat(ew.astype(np.float64), indptr[:-1])
                        if len(ew) else 0.0)

    def _list(arr, typ):
        off = np.array([0, len(arr)], np.int64)
        return pa.LargeListArray.from_arrays(off, pa.array(np.asarray(arr, typ)))

    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "ids": _list(ids, np.uint64),
            "deg": _list(deg, np.float64),
            "src_pos": _list(src_pos, np.int64),
            "indptr": _list(indptr, np.int64),
            "dst_part": _list(edp, np.int32),
            "dst_pos": _list(edpos, np.int64),
            "w": _list(ew, wdt),
            "nnz": pa.array([int(len(ew))], pa.int64()),
        }
    )


def _graph_from_block_refs(block_refs, P, timings) -> "Graph":
    """Assemble the Graph object from per-partition CSR table refs."""
    import ray

    from raygraph.shuffle import refs_to_dataset

    blocks = refs_to_dataset(block_refs)
    if blocks is None:
        # zero-vertex input: materialize ONE structurally-valid empty block
        # so every downstream method (ids_slices/spmv/save_graph) sees a
        # real Dataset instead of crashing on blocks=None
        import ray.data as rd

        def _l(arr, typ):
            a = np.asarray(arr, typ)
            off = np.array([0, len(a)], np.int64)
            return pa.LargeListArray.from_arrays(off, pa.array(a))

        empty = pa.table({
            "part": pa.array([0], pa.int32()),
            "ids": _l([], np.uint64),
            "deg": _l([], np.float64),
            "src_pos": _l([], np.int64),
            "indptr": _l([0], np.int64),
            "dst_part": _l([], np.int32),
            "dst_pos": _l([], np.int64),
            "w": _l([], np.float64),
            "nnz": pa.array([0], pa.int64()),
        })
        blocks = rd.from_arrow(empty)
        # block_refs stays all-None: ref-based (fused) paths correctly see
        # no live blocks, Dataset paths read the one empty row

    @ray.remote
    def meta(tbl: pa.Table):
        n = pa.compute.list_value_length(tbl["ids"]).to_numpy(zero_copy_only=False)
        return (
            tbl["part"].to_numpy(zero_copy_only=False).tolist(),
            np.asarray(n, np.int64).tolist(),
            tbl["nnz"].to_numpy(zero_copy_only=False).tolist(),
        )

    sizes = np.zeros(P, np.int64)
    nnz = 0
    for parts, ns, nnzs in ray.get([meta.remote(r) for r in block_refs if r is not None]):
        for p, n_, z in zip(parts, ns, nnzs):
            sizes[int(p)] = int(n_)
            nnz += int(z)
    g = Graph(blocks=blocks, num_parts=P, sizes=sizes, nnz=nnz,
              n_vertices=int(sizes.sum()))
    g._block_refs = block_refs
    g.build_timings = timings
    return g


def _build_broadcast(edges_ds, verts, P, *, dup_op, binarize, symmetrize,
                     drop_self, check_src, t_start,
                     wdt=np.float64) -> "Graph":
    """Single-exchange build with broadcast per-partition vertex ids."""
    import time as _time

    import ray

    from raygraph.shuffle import exchange

    timings: dict[str, float] = {}

    # collect the (locally uniqued) vertex registry rows -> per-part ids
    vcol = []
    for tbl in verts.iter_batches(batch_size=None, batch_format="pyarrow"):
        vcol.append(np.asarray(tbl["src"].to_numpy(zero_copy_only=False), np.uint64))
    all_ids = np.unique(np.concatenate(vcol)) if vcol else np.empty(0, np.uint64)
    parts = part_of(all_ids, P)
    ids_sl = [np.ascontiguousarray(all_ids[parts == p]) for p in range(P)]
    ids_refs = [ray.put(a) for a in ids_sl]
    timings["verts_broadcast"] = _time.perf_counter() - t_start
    _t1 = _time.perf_counter()

    def prep(t: pa.Table) -> pa.Table:
        src = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
        dst = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
        # weightless input (binarized link tables): do NOT synthesize
        # 8 B/row of literal ones through the exchange — the reducer
        # re-derives implicit unit weights after routing
        has_w = "w" in t.column_names
        w = (np.asarray(
            np.asarray(t["w"].to_numpy(zero_copy_only=False)), wdt)
             if has_w else None)
        if symmetrize:
            src, dst = np.r_[src, dst], np.r_[dst, src]
            w = np.r_[w, w] if has_w else None
        if drop_self:
            keep = src != dst
            src, dst = src[keep], dst[keep]
            w = w[keep] if has_w else None
        cols = {
            "part": pa.array(part_of(src, P), pa.int32()),
            "src": pa.array(src, pa.uint64()),
            "dst": pa.array(dst, pa.uint64()),
        }
        if has_w:
            cols["w"] = pa.array(w)
        return pa.table(cols)

    tagged = edges_ds.map_batches(prep, batch_format="pyarrow")

    def csr_fast(g: pa.Table, part: int) -> pa.Table:
        ids = ray.get(ids_refs[part])
        es = np.asarray(g["src"].to_numpy(zero_copy_only=False), np.uint64)
        ed = np.asarray(g["dst"].to_numpy(zero_copy_only=False), np.uint64)
        ew = (np.asarray(
            np.asarray(g["w"].to_numpy(zero_copy_only=False)), wdt)
              if "w" in g.column_names else np.ones(len(es), wdt))
        if check_src:
            ok, _ = _member_mask(ids, es)
            es, ed, ew = es[ok], ed[ok], ew[ok]
        edp = part_of(ed, P)
        edpos = np.empty(len(ed), np.int64)
        ok_d = np.zeros(len(ed), bool)
        for q in np.unique(edp):
            sel = edp == q
            okq, posq = _member_mask(ray.get(ids_refs[int(q)]), ed[sel])
            ok_d[sel] = okq
            edpos[sel] = posq
        es, ed, ew = es[ok_d], ed[ok_d], ew[ok_d]
        edp, edpos = edp[ok_d], edpos[ok_d]
        return _emit_block_table(part, ids, es, ed, ew, edp, edpos, dup_op,
                                 binarize, wdt=wdt)

    block_refs = exchange([tagged], P, csr_fast, part_kwarg="part")
    timings["csr"] = _time.perf_counter() - _t1

    # parts with vertices but no out-edges still need their block row
    @ray.remote
    def empty_block(part, ids):
        z = np.empty(0, wdt)
        return _emit_block_table(part, ids, np.empty(0, np.uint64),
                                 np.empty(0, np.uint64), z,
                                 np.empty(0, np.int32), np.empty(0, np.int64),
                                 dup_op, binarize, wdt=wdt)

    for p in range(P):
        if block_refs[p] is None and len(ids_sl[p]):
            block_refs[p] = empty_block.remote(p, ids_refs[p])

    return _graph_from_block_refs(block_refs, P, timings)


def build_graph(
    edges_ds,
    *,
    vertices_ds=None,
    vertex_column: str = "v",
    num_parts: int | None = None,
    dup_op: str = "plus",  # "plus" | "count" | "min" | "max" | "first" | "raise"
    binarize: bool = False,
    symmetrize: bool = False,
    drop_self: bool = False,
) -> Graph:
    """Build a partitioned CSR graph from a COO edge Dataset.

    ``vertices_ds`` (optional) fixes the vertex universe; edges whose
    endpoint is not in it are dropped (unknown-url links). ``dup_op``
    merges duplicate (src,dst) pairs (reference dup_op semantics,
    graphblas/core/matrix.py:696-698 — "raise" reproduces the reference's
    ValueError on unmerged duplicates). ``binarize`` maps every surviving
    weight to 1.0 (reference ``A << A.apply(unary.one)``, Pagerank
    notebook cell 11).
    """
    P = default_num_parts(num_parts)
    wdt = _edge_w_dtype(edges_ds)  # carried through both exchanges exactly

    tagged = _normalize_edges(edges_ds, symmetrize, drop_self, P, wdt=wdt)
    if vertices_ds is not None:
        verts = _vertex_rows(vertices_ds, P, vertex_column, wdt=wdt)
        check_src = True
    else:
        verts = _vertex_rows(edges_ds, P, None, wdt=wdt)
        check_src = False
    # the vertex registry rides BOTH build shuffles; materialize it once so
    # its (possibly expensive) upstream never re-executes — it is locally
    # uniqued id rows, tiny next to the edges
    verts = verts.materialize()

    import time as _time

    timings: dict[str, float] = {}
    _t0 = _time.perf_counter()

    if verts.count() == 0:
        # zero-vertex input: short-circuit to a structurally valid empty
        # graph (the exchange stages would otherwise emit part-less tables)
        return _graph_from_block_refs([None] * P, P, timings)

    # ---- fast path: when the vertex id set is small enough to broadcast
    # (default 256 MB ~ 32M vertices), the whole build is ONE exchange keyed
    # by src partition; dst membership/positions come from per-partition id
    # refs fetched inside the task (zero-copy plasma). Above the threshold
    # the scale-honest two-stage routing below runs instead.
    bc_max = int(os.environ.get("GRAFT_BROADCAST_VERTS_MAX", str(256 << 20)))
    if 8 * verts.count() <= bc_max:
        return _build_broadcast(
            edges_ds, verts, P,
            dup_op=dup_op, binarize=binarize, symmetrize=symmetrize,
            drop_self=drop_self, check_src=check_src, t_start=_t0, wdt=wdt,
        )

    # ---- stage 1: co-grouped by dst partition — resolve membership and
    # annotate dst_pos. SORT-FREE: dedup is folded into stage 2's single
    # lexsort (one full sort of the edges instead of two).
    def resolve(g: pa.Table) -> pa.Table:
        part = int(g["part"][0].as_py())
        ids, es, (ed, ew, _dp, _dpos) = _split_group(g, wdt)
        ok, pos = _member_mask(ids, ed)
        es, ed, ew, pos = es[ok], ed[ok], ew[ok], pos[ok]
        return _tag_table(part_of(es, P), es, ed, ew, part, pos, 0, wdt=wdt)

    from raygraph.shuffle import exchange, refs_to_dataset

    resolved = refs_to_dataset(exchange([tagged, verts], P, resolve))
    timings["resolve"] = _time.perf_counter() - _t0
    _t1 = _time.perf_counter()

    # ---- stage 2: co-grouped by src partition — dedup (dup_op) + one CSR
    # block row per partition
    def build_block(g: pa.Table) -> pa.Table:
        part = int(g["part"][0].as_py())
        ids, es, (ed, ew, edp, edpos) = _split_group(g, wdt)
        if check_src:
            ok, _ = _member_mask(ids, es)
            es, ed, ew, edp, edpos = es[ok], ed[ok], ew[ok], edp[ok], edpos[ok]
        return _emit_block_table(part, ids, es, ed, ew, edp, edpos, dup_op,
                                 binarize, wdt=wdt)

    stage2_in = ([resolved] if resolved is not None else []) + [verts]
    block_refs = exchange(stage2_in, P, build_block)
    timings["csr"] = _time.perf_counter() - _t1
    return _graph_from_block_refs(block_refs, P, timings)


def _emit_block_pos(part, ids, sp, dp, dpos, w, dup_op, binarize,
                    drop_self, wdt=None) -> pa.Table:
    """CSR block row from POSITION-encoded edges (sp = src position in this
    partition's ids, dp/dpos = dst partition/position). Same dedup semantics
    as _emit_block_table, but no id resolution — used when the edges already
    carry positions (symmetrize_graph)."""
    sp = np.asarray(sp, np.int64)
    dp = np.asarray(dp, np.int32)
    dpos = np.asarray(dpos, np.int64)
    wdt = np.dtype(wdt) if wdt is not None else np.asarray(w).dtype
    if binarize:
        wdt = np.dtype(np.float64)
    w = np.asarray(np.asarray(w), wdt)
    if drop_self and len(sp):
        keep = ~((dp == part) & (dpos == sp))
        sp, dp, dpos, w = sp[keep], dp[keep], dpos[keep], w[keep]
    if len(sp):
        # pack (sp, dp, dpos) into one uint64 key when the bounds allow
        # (positions < 2^24, partitions < 2^12 — true for any partition of
        # < 16M vertices): a single stable integer argsort is a radix sort,
        # ~2-3x cheaper than the 3-pass lexsort on this bandwidth-bound
        # stage (stability preserves dup_op='first' semantics)
        if (int(sp.max()) < (1 << 24) and int(dpos.max()) < (1 << 24)
                and int(dp.max()) < (1 << 12)):
            key = ((sp.astype(np.uint64) << np.uint64(36))
                   | (dp.astype(np.uint64) << np.uint64(24))
                   | dpos.astype(np.uint64))
            order = np.argsort(key, kind="stable")
            sp, dp, dpos, w = sp[order], dp[order], dpos[order], w[order]
            key = key[order]
            new = np.r_[True, key[1:] != key[:-1]]
        else:
            order = np.lexsort((dpos, dp, sp))
            sp, dp, dpos, w = sp[order], dp[order], dpos[order], w[order]
            new = np.r_[True, (sp[1:] != sp[:-1]) | (dp[1:] != dp[:-1])
                        | (dpos[1:] != dpos[:-1])]
        starts = np.flatnonzero(new)
        if len(starts) != len(sp):
            if dup_op == "raise":
                raise ValueError(
                    "duplicate (src,dst) without dup_op (reference matrix.py:696)"
                )
            if dup_op == "count":
                w = np.diff(np.r_[starts, len(sp)]).astype(wdt)
            elif dup_op == "plus":
                w = np.add.reduceat(w, starts)
            elif dup_op == "min":
                w = np.minimum.reduceat(w, starts)
            elif dup_op == "max":
                w = np.maximum.reduceat(w, starts)
            else:  # first
                w = w[starts]
            sp, dp, dpos = sp[starts], dp[starts], dpos[starts]
        elif dup_op == "count":
            w = np.ones(len(sp), wdt)
        if binarize:
            w = np.ones(len(sp), np.float64)
        row_starts = np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]])
        src_pos = sp[row_starts]
        indptr = np.r_[0, np.cumsum(np.diff(np.r_[row_starts, len(sp)]))].astype(np.int64)
    else:
        w = np.empty(0, wdt)
        dp = np.empty(0, np.int32)
        dpos = np.empty(0, np.int64)
        indptr = np.zeros(1, np.int64)
        src_pos = np.empty(0, np.int64)
    deg = np.zeros(len(ids), np.float64)
    if len(src_pos):
        deg[src_pos] = np.add.reduceat(w.astype(np.float64), indptr[:-1])

    def _list(arr, typ):
        off = np.array([0, len(arr)], np.int64)
        return pa.LargeListArray.from_arrays(off, pa.array(np.asarray(arr, typ)))

    return pa.table(
        {
            "part": pa.array([part], pa.int32()),
            "ids": _list(ids, np.uint64),
            "deg": _list(deg, np.float64),
            "src_pos": _list(src_pos, np.int64),
            "indptr": _list(indptr, np.int64),
            "dst_part": _list(dp, np.int32),
            "dst_pos": _list(dpos, np.int64),
            "w": _list(w, wdt),
            "nnz": pa.array([int(len(w))], pa.int64()),
        }
    )


def symmetrize_graph(g: "Graph", *, dup_op: str = "first", binarize: bool = True,
                     drop_self: bool = True) -> "Graph":
    """Symmetric graph derived from an already-built directed graph's CSR
    blocks — ONE exchange of position-encoded reversed edges, instead of
    re-running the whole build (url hashing + vertex resolution) from the
    raw link table. An edge (u→v) stored in partition p as
    (src_pos, dst_part=q, dst_pos) becomes, for partition q, the reversed
    edge (src_pos'=dst_pos, dst_part'=p, dst_pos'=src_pos): positions are
    already resolved, so no vertex registry shuffle is needed.

    Reference analog: ``A + A.T`` / the FastSV notebook's symmetric input
    requirement (Connected Components -- FastSV.ipynb cell 2)."""
    import ray

    P = g.num_parts
    block_refs = g.block_ref_list()

    def _cols(tbl, names):
        return {c: np.asarray(tbl[c][0].values) for c in names}

    # binarize discards every weight at emit time — don't ship 8 B/edge
    # of them through the exchange (same slimming as the build path)
    ship_w = not binarize

    def _reverse_split(tbl, P):
        """Reversed-edge packets by new owner (= old dst_part)."""
        b = _cols(tbl, ("src_pos", "indptr", "dst_part", "dst_pos", "w"))
        sp_exp = np.repeat(b["src_pos"], np.diff(b["indptr"]))
        dp, dpos, w = b["dst_part"], b["dst_pos"], b["w"]
        order = np.argsort(dp, kind="stable")
        dp_s = dp[order]
        out = [None] * P
        if len(dp_s):
            starts = np.flatnonzero(np.r_[True, dp_s[1:] != dp_s[:-1]])
            ends = np.r_[starts[1:], len(dp_s)]
            for s, e in zip(starts, ends):
                sel = order[s:e]
                # (new src_pos, new dst_pos[, w]); new dst_part = sender
                out[int(dp_s[s])] = (dpos[sel], sp_exp[sel]) + (
                    (w[sel],) if ship_w else ())
        return tuple(out) if P > 1 else out[0]

    rev = ray.remote(num_returns=P)(_reverse_split) if P > 1 else ray.remote(_reverse_split)

    def _merge_sym(q, tbl, senders, *packets):
        """Own forward edges + incoming reversed packets -> symmetric block."""
        ids = np.asarray(tbl["ids"][0].values, np.uint64)
        b = _cols(tbl, ("src_pos", "indptr", "dst_part", "dst_pos", "w"))
        sp = [np.repeat(b["src_pos"], np.diff(b["indptr"]))]
        dp = [b["dst_part"]]
        dpos = [b["dst_pos"]]
        w = [b["w"]]
        for p, pk in zip(senders, packets):
            if pk is not None:
                sp.append(np.asarray(pk[0], np.int64))
                dp.append(np.full(len(pk[0]), p, np.int32))
                dpos.append(np.asarray(pk[1], np.int64))
                w.append(np.asarray(pk[2], np.float64) if len(pk) > 2
                         else np.ones(len(pk[0]), np.float64))
        return _emit_block_pos(q, ids, np.concatenate(sp), np.concatenate(dp),
                               np.concatenate(dpos), np.concatenate(w),
                               dup_op, binarize, drop_self)

    merge = ray.remote(_merge_sym)

    live = [p for p in range(P) if block_refs[p] is not None]
    splits = {p: rev.remote(block_refs[p], P) for p in live}
    if P == 1:
        splits = {p: [r] for p, r in splits.items()}
    out_refs: list = [None] * P
    for q in range(P):
        if block_refs[q] is None:
            continue  # no vertices in q -> no reversed edges can target it
        out_refs[q] = merge.remote(q, block_refs[q], live,
                                   *[splits[p][q] for p in live])
    return _graph_from_block_refs(out_refs, P, {"symmetrize": 0.0})


def edges_from_pages(pages_ds, concurrency=(1, 8), urls_ds=None):
    """pages -> (extracted_ds, links_ds, vertices_ds) ready for build_graph.

    ``urls_ds``: optional url-only Dataset for the vertex scan (e.g.
    ``read_parquet(dir, columns=["url"])``). The vertex table needs ONLY
    the url column; without this, the scan is pruned to ``url`` via
    ``select_columns`` — but a column-pruned re-read of the source skips
    decoding the html payload entirely (measured 9.6 s -> 1.2 s on the
    4 M-page bench table), which is the "prune at the read" rule at 100 TB.
    """
    from raygraph.extract import extract_pages, links_table
    from raygraph.util import hash_strings

    extracted = extract_pages(pages_ds, concurrency=concurrency)
    links = links_table(extracted)

    def vmap(t: pa.Table) -> pa.Table:
        return pa.table({"v": hash_strings(t["url"].to_pylist())})

    vsrc = urls_ds if urls_ds is not None else pages_ds.select_columns(["url"])
    vertices = vsrc.map_batches(vmap, batch_format="pyarrow")
    return extracted, links, vertices
