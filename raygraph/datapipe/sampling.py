"""Deterministic sampling / statistics stages for training-data curation.

A 100-TB corpus pipeline constantly needs (a) a reproducible stratified
sample ("n docs per language/source for eval") and (b) exact column
quantiles ("p99 doc length for the truncation budget"). Both are built
combiner-first so the shuffle carries only bounded partials, and both
are deterministic functions of the input — md5-ranked sampling and
integer histograms — so a DuckDB oracle reproduces them bit-for-bit.

Reference parity note: python-graphblas has no sampling surface; these
are the §"beyond the reference" training-data operators (SURVEY §2.7).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _md5_hex(ids: np.ndarray) -> np.ndarray:
    return np.array([hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids])


def sample_per_group(
    ds,
    *,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
):
    """Deterministic stratified sample: the ``n`` rows per group with the
    lexicographically smallest ``md5(str(id))`` digests (ties by id).

    md5 ranking is a uniform pseudo-random draw that needs no RNG state,
    is stable under repartitioning/restarts, and is exactly reproducible
    by a SQL oracle (``row_number() OVER (PARTITION BY g ORDER BY
    md5(CAST(id AS VARCHAR)), id) <= n``).

    Scale shape: each batch keeps at most n rows per group it sees
    (combiner), so the groupby shuffle carries <= n x groups x batches
    rows — never the corpus. Returns (group_col, id_col, *keep_cols).
    """
    cols = [group_col, id_col, *keep_cols]

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), np.int64)
        if len(ids) == 0:
            return t.select(cols).append_column("h", pa.array([], pa.string()))
        grp = t[group_col].to_pandas().to_numpy()
        hx = _md5_hex(ids)
        # rank within group: sort by (group, h, id), keep first n per group
        order = np.lexsort((ids, hx, grp))
        g_sorted = grp[order]
        change = np.r_[True, g_sorted[1:] != g_sorted[:-1]]
        # position within the run of equal groups
        idx = np.arange(len(order))
        run_start = np.maximum.accumulate(np.where(change, idx, 0))
        keep = order[(idx - run_start) < n]
        out = t.select(cols).take(keep)
        return out.append_column("h", pa.array(hx[keep]))

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", id_col]).head(n)
        return g.drop(columns=["h"]).reset_index(drop=True)

    return partials.groupby(group_col).map_groups(final, batch_format="pandas")


def column_quantiles(ds, *, col: str, pcts: tuple[int, ...] = (25, 50, 75, 90, 99)):
    """Exact percentiles of an integer column, distributed.

    Per-batch value-count partials (combiner) -> groupby(value).sum —
    the shuffle carries one row per distinct value per batch, bounded by
    the column's cardinality, never the row count. The tiny merged
    histogram is reduced on the driver: pct p selects the smallest v
    whose cumulative count reaches ``ceil(p*N/100)`` — pure integer
    arithmetic, so the SQL oracle ((p*N + 99) // 100 over a windowed
    cumsum) agrees exactly.

    Returns a pyarrow.Table (pct:int64, v:int64), one row per pct.
    """

    sch = ds.schema()
    col_type = dict(zip(sch.names, sch.types))[col]
    if not pa.types.is_integer(col_type):
        raise ValueError(
            f"column_quantiles: column {col!r} is {col_type}, not integral — "
            "the exact-histogram method is integer-only (a float column "
            "would be silently truncated)"
        )

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col].to_numpy(zero_copy_only=False), np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": u, "cnt": c.astype(np.int64)})

    hist = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .sum("cnt")
    )
    rows = hist.take_all()  # one row per distinct value: bounded, tiny
    if not rows:
        return pa.table({"pct": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    vals = np.array([r["v"] for r in rows], np.int64)
    cnts = np.array([r["sum(cnt)"] for r in rows], np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    total = int(cum[-1])
    out_p, out_v = [], []
    for p in pcts:
        thresh = (int(p) * total + 99) // 100
        out_p.append(int(p))
        out_v.append(int(vals[np.searchsorted(cum, thresh, side="left")]))
    return pa.table({"pct": pa.array(out_p, pa.int64()), "v": pa.array(out_v, pa.int64())})


def hll_registers(ds, *, col: str, p: int = 10):
    """HyperLogLog register table for approximate-distinct-count of an
    integer column: ``(register, maxrank)`` with ``register = top p bits
    of mix64(value)`` and ``maxrank = max over values of (position of the
    leftmost 1-bit in the remaining 64-p bits, or 64-p+1 for zero)`` —
    the standard Flajolet HLL sketch (m = 2^p registers), made
    fully deterministic (splitmix64) so the registers themselves are
    oracle-checkable bit for bit; the cardinality estimate is a trivial
    driver-side fold of the m rows.

    Scale shape: textbook sketch mergeability — each batch reduces to at
    most m (register, rank) partials via sort + ``maximum.reduceat``,
    and ONE ``groupby(register).max`` shuffle of m-bounded partials
    merges them. 100 TB of values shuffle at most m rows per block.
    Bit lengths are computed integer-exactly (power-of-two searchsorted,
    never float log2 — 2^54-1 rounds up in float64)."""
    from raygraph.util import mix64

    m_bits = 64 - p
    pow2 = (np.uint64(1) << np.arange(0, m_bits, dtype=np.uint64))

    def partial(t: pa.Table) -> pa.Table:
        x = np.asarray(t[col].to_numpy(zero_copy_only=False)).astype(np.uint64)
        h = mix64(x)
        reg = (h >> np.uint64(m_bits)).astype(np.int64)
        w = h & ((np.uint64(1) << np.uint64(m_bits)) - np.uint64(1))
        # bitlen(w) = #powers-of-two <= w, exact; rank = m_bits - bitlen + 1
        bitlen = np.searchsorted(pow2, w, side="right")
        rank = (m_bits - bitlen + 1).astype(np.int64)
        order = np.argsort(reg, kind="stable")
        reg, rank = reg[order], rank[order]
        starts = np.flatnonzero(np.r_[True, reg[1:] != reg[:-1]])
        return pa.table({"register": reg[starts],
                         "maxrank": np.maximum.reduceat(rank, starts)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("register").max("maxrank"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"register": t["register"],
                         "maxrank": t["max(maxrank)"].cast(pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow").sort(key="register")


def hll_estimate(registers: pa.Table, *, p: int = 10) -> float:
    """Cardinality estimate from :func:`hll_registers` output (registers
    absent from the table count as zero): the standard HLL-with-
    small-range-correction formula."""
    m = 1 << p
    ranks = np.zeros(m, np.float64)
    ranks[np.asarray(registers["register"].to_numpy(zero_copy_only=False))] = \
        np.asarray(registers["maxrank"].to_numpy(zero_copy_only=False))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-ranks))
    zeros = int((ranks == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


_CMS_K1 = np.uint64(0x9E3779B97F4A7C15)
_CMS_K2 = np.uint64(0xD1B54A32D192ED03)


def cms_counters(ds, *, text_col: str = "text", depth: int = 4,
                 width: int = 1024):
    """Count-Min sketch of the corpus token-frequency distribution:
    ``(row, counter, count)`` nonzero cells of a depth × width counter
    matrix, where token occurrences hash to ``mix64(token_hash ^
    seed_row) % width`` per row — the standard CMS (Cormode &
    Muthukrishnan), deterministic (splitmix64 row seeds + the repo's
    code-point Horner token hash) so the counters are oracle-checkable
    bit for bit. Point estimates are ``min over rows`` of the queried
    cells — a driver-side fold of at most depth rows per query.

    Scale shape: textbook mergeability again — each batch reduces to at
    most depth × width partial cells (bincount per row), ONE
    ``groupby(cell).sum`` shuffle merges them; 100 TB of text shuffles
    ≤ depth·width rows per block."""
    import pyarrow.compute as pc

    from raygraph.datapipe.dedup import _token_hashes
    from raygraph.util import mix64

    seeds = [(np.uint64(r) * _CMS_K2) ^ _CMS_K1 for r in range(depth)]

    def partial(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        lst = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(txt, "")), r"\s+")
        toks = [s for s in lst.values.to_pylist() if s != ""]
        rows, ctrs, cnts = [], [], []
        if toks:
            h = _token_hashes(toks)
            for r, seed in enumerate(seeds):
                c = (mix64(h ^ seed) % np.uint64(width)).astype(np.int64)
                bc = np.bincount(c, minlength=width)
                nz = np.flatnonzero(bc)
                rows.append(np.full(len(nz), r, np.int64))
                ctrs.append(nz.astype(np.int64))
                cnts.append(bc[nz].astype(np.int64))
        if not rows:
            return pa.table({"row": pa.array([], pa.int64()),
                             "counter": pa.array([], pa.int64()),
                             "count": pa.array([], pa.int64())})
        return pa.table({"row": np.concatenate(rows),
                         "counter": np.concatenate(ctrs),
                         "count": np.concatenate(cnts)})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["row", "counter"]).sum("count"))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({"row": t["row"], "counter": t["counter"],
                         "count": t["sum(count)"].cast(pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow").sort(
        key=["row", "counter"])


def cms_estimate(cells: pa.Table, tokens: list[str], *, depth: int = 4,
                 width: int = 1024) -> dict[str, int]:
    """Point frequency estimates (min over rows) for ``tokens`` from
    :func:`cms_counters` output."""
    from raygraph.datapipe.dedup import _token_hashes
    from raygraph.util import mix64

    grid = np.zeros((depth, width), np.int64)
    grid[np.asarray(cells["row"].to_numpy(zero_copy_only=False)),
         np.asarray(cells["counter"].to_numpy(zero_copy_only=False))] = \
        np.asarray(cells["count"].to_numpy(zero_copy_only=False))
    h = _token_hashes(list(tokens))
    out = {}
    for i, tok in enumerate(tokens):
        est = min(int(grid[r, int(mix64(h[i:i + 1]
                    ^ ((np.uint64(r) * _CMS_K2) ^ _CMS_K1))[0]
                    % np.uint64(width))]) for r in range(depth))
        out[tok] = est
    return out


def weighted_sample(ds, *, n: int, id_col: str = "doc_id",
                    weight_col: str = "n_chars"):
    """Deterministic weight-proportional sample without replacement —
    the Efraimidis-Spirakis A-ES exponential race: each row draws
    u ∈ (0, 1] from its md5 digest (first 13 hex chars = 52 exact
    bits) and races with key −ln(u)/w; the n smallest keys win, which
    samples without replacement with probability proportional to w.
    md5-derived uniforms need no RNG state, survive repartitioning /
    restarts, and the SQL oracle reproduces the key bit-for-bit
    (``'0x' || substr(md5(id), 1, 13)`` cast to BIGINT).

    Scale shape: each batch keeps its n smallest keys (combiner), so
    only ≤ n rows per batch reach the driver-side final top-n fold —
    never the corpus. Rows with w ≤ 0 never win. Returns
    (id_col, weight_col) sorted by id.
    """
    import hashlib

    TWO52 = float(1 << 52)

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), np.int64)
        w = np.asarray(t[weight_col].to_numpy(zero_copy_only=False),
                       np.float64)
        keep = w > 0
        ids, w = ids[keep], w[keep]
        h = np.array([int(hashlib.md5(str(int(i)).encode())
                          .hexdigest()[:13], 16) for i in ids],
                     np.int64)
        u = (h + 1) / TWO52
        key = -np.log(u) / w
        order = np.lexsort((ids, key))[:n]
        return pa.table({id_col: ids[order],
                         weight_col: w[order],
                         "key": key[order]})

    pt = partial  # per-batch combiner
    parts = ds.map_batches(pt, batch_format="pyarrow")
    import ray
    tabs = [x for x in ray.get(parts.materialize().to_arrow_refs())
            if x.num_rows]
    if not tabs:  # nothing with positive weight: empty sample, not a crash
        return pa.table({id_col: pa.array([], pa.int64()),
                         weight_col: pa.array([], pa.float64())})
    allt = pa.concat_tables(tabs)
    key = np.asarray(allt["key"].to_numpy(zero_copy_only=False), np.float64)
    ids = np.asarray(allt[id_col].to_numpy(zero_copy_only=False), np.int64)
    order = np.lexsort((ids, key))[:n]
    out = allt.take(order).drop_columns(["key"])
    return out.sort_by([(id_col, "ascending")])
