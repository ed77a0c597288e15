"""Explicit hash exchange on raw Ray tasks (two waves, no sort).

``exchange(datasets, P, fn)`` routes every row of the input datasets to
the partition named by its ``part`` column and applies ``fn(table)`` per
partition — the manual partitioned hash shuffle from the Ray guide,
used where a generic ``groupby(part).map_groups`` would pay a full
sort-shuffle for what is already an integer-keyed routing problem
(graph build: SURVEY.md §7.3 'edge dedup / id-encode' shuffles).

  wave 1  one task per input block: slice the block into P sub-tables
          (num_returns=P — partition q's packet is its own object, so
          wave 2 task q pulls ONLY its packets)
  wave 2  one task per partition: concat packets (fixed block order ->
          deterministic) and apply fn

Returns the per-partition result table refs; wrap with
``ray.data.from_arrow_refs`` to continue in Dataset land.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _split_by_part(tbl: pa.Table, P: int, drop_part: bool = False):
    if not isinstance(tbl, pa.Table):
        # blocks produced by pandas-format map_groups stages can surface
        # as DataFrames from to_arrow_refs at high parallelism
        import pandas as pd

        if isinstance(tbl, pd.DataFrame):
            tbl = pa.Table.from_pandas(tbl, preserve_index=False)
        else:  # pragma: no cover - unknown block type
            tbl = pa.table(tbl)
    cols = tbl.column_names
    if "part" not in cols:
        # an EMPTY upstream block can lose its schema entirely (Ray
        # map_groups emits zero-column empties; seen at high
        # parallelism where some input block held no rows) — nothing to
        # route. A non-empty block without ``part`` is a caller bug.
        if len(tbl) == 0:
            return [None] * P
        raise KeyError(f"exchange input block lacks 'part' column: {cols}")
    part = np.asarray(tbl["part"].to_numpy(zero_copy_only=False))
    order = np.argsort(part, kind="stable")
    tbl = tbl.take(pa.array(order))
    part = part[order]
    if drop_part:
        # the routing key is constant per packet — don't ship 4 B/row of
        # it through the object store; wave 2 knows its own q
        tbl = tbl.drop_columns(["part"])
    out = [None] * P
    if len(part):
        starts = np.flatnonzero(np.r_[True, part[1:] != part[:-1]])
        ends = np.r_[starts[1:], len(part)]
        for s, e in zip(starts, ends):
            out[int(part[s])] = tbl.slice(int(s), int(e - s))
    return out


def exchange(datasets: list, P: int, fn, *, fn_kwargs: dict | None = None,
             part_kwarg: str | None = None) -> list:
    """Route rows of ``datasets`` (all carrying an int ``part`` column) to
    their partition and apply ``fn(part_table) -> pa.Table`` per partition.
    Returns a list of ObjectRefs to the result tables (empty parts skipped,
    their slot is None).

    ``part_kwarg``: when set, the ``part`` column is DROPPED from every
    packet before it ships (wave 2 already knows its own partition index)
    and ``fn`` receives the index as ``fn(tbl, <part_kwarg>=q)`` — 4 B/row
    less exchange traffic for fns that don't need per-row part values."""
    import ray

    fn_kwargs = fn_kwargs or {}
    drop_part = part_kwarg is not None

    split = ray.remote(num_returns=P)(
        lambda t: tuple(_split_by_part(t, P, drop_part))
    ) if P > 1 else ray.remote(lambda t: _split_by_part(t, P, drop_part)[0])

    @ray.remote(num_returns=2)
    def apply(q, *packets):
        tables = [p for p in packets if p is not None and p.num_rows > 0]
        if not tables:
            return None, 0
        kw = dict(fn_kwargs)
        if part_kwarg is not None:
            kw[part_kwarg] = q
        out = fn(pa.concat_tables(tables, promote_options="permissive"), **kw)
        return out, (out.num_rows if out is not None else 0)

    block_refs: list = []
    for ds in datasets:
        block_refs.extend(ds.to_arrow_refs())

    splits = [split.remote(b) for b in block_refs]
    if P == 1:
        splits = [[s] for s in splits]
    out_refs, n_refs = [], []
    for q in range(P):
        o, n = apply.remote(q, *[s[q] for s in splits])
        out_refs.append(o)
        n_refs.append(n)
    # only the tiny per-part row counts come back to the driver; the result
    # tables stay in the object store
    counts = ray.get(n_refs)
    return [o if n > 0 else None for o, n in zip(out_refs, counts)]


def refs_to_dataset(refs: list):
    """Non-empty result refs -> Ray Dataset (no driver materialization)."""
    import ray.data as rd

    keep = [r for r in refs if r is not None]
    if not keep:
        return None
    return rd.from_arrow_refs(keep)
