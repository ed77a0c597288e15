"""Deduplication operators over document tables.

Every variant follows the sketch-then-shuffle shape: per-batch vectorized
signature computation in ``map_batches`` (actor pools where state is
compiled), then ONE grouped exchange on the signature key, then (for the
near-dup variants) candidate-pair verification and clustering. Clustering
reuses the engine's distributed connected components over the candidate
pair graph — the dedup graph IS a link graph.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from raygraph.util import mix64

# ------------------------------------------------------------------ exact ----


def exact_dedup(docs_ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: content md5 -> hash-partitioned groupby -> keep min id.

    Returns one row per distinct content: (content_hash, keep_id, n_dups).
    Scale shape: the groupby shuffles only (hash, id) pairs, never text.
    """

    def hash_batch(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        hashes = [hashlib.md5((s or "").encode("utf-8")).hexdigest() for s in texts]
        return pa.table(
            {
                "content_hash": pa.array(hashes, pa.string()),
                id_col: t[id_col],
            }
        )

    from ray.data.aggregate import Count, Min

    return (
        docs_ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups"))
    )


# ---------------------------------------------------------------- minhash ----


def _char_shingles(s: str, k: int) -> np.ndarray:
    """Hashes of all k-char shingles, vectorized (rolling window view)."""
    b = np.frombuffer(s.encode("utf-8"), np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = np.zeros(len(win), np.uint64)
        for j in range(k):
            h = h * np.uint64(1099511628211) + win[:, j]
    return np.unique(mix64(h))


class MinHasher:
    """Actor: num_hashes minhash values per doc from k-char shingles.

    The per-actor state (hash seeds) is built once in ``__init__``.
    """

    def __init__(self, num_hashes: int = 64, k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(1, 2**63, size=num_hashes, dtype=np.uint64)
        self.k = k
        self.num_hashes = num_hashes

    def signature(self, s: str) -> np.ndarray:
        sh = _char_shingles(s or "", self.k)
        if len(sh) == 0:
            return np.zeros(self.num_hashes, np.uint64)
        with np.errstate(over="ignore"):
            # min over shingles of mix64(shingle ^ seed), vectorized per seed
            return mix64(sh[:, None] ^ self.seeds[None, :]).min(axis=0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(s) for s in batch["text"].fillna("")])
        batch["minhash"] = list(sigs.astype(np.uint64))
        return batch


def _pairs_in_segments(values: np.ndarray, seg_starts: np.ndarray,
                       seg_sizes: np.ndarray, cap: int = 200):
    """All intra-segment ordered pairs (i<j), vectorized per distinct size;
    segments larger than ``cap`` are skipped (degenerate-bucket guard)."""
    a_out, b_out = [], []
    for s in np.unique(seg_sizes):
        if s < 2 or s > cap:
            continue
        segs = np.flatnonzero(seg_sizes == s)
        idx = seg_starts[segs][:, None] + np.arange(s)[None, :]
        mem = values[idx]
        iu, ju = np.triu_indices(int(s), 1)
        a_out.append(mem[:, iu].ravel())
        b_out.append(mem[:, ju].ravel())
    if not a_out:
        return np.empty(0, values.dtype), np.empty(0, values.dtype)
    return np.concatenate(a_out), np.concatenate(b_out)


def _segments_of(cols: list[np.ndarray], tiebreak: np.ndarray):
    """Sort rows by key columns (+tiebreak) and return order + segment layout."""
    order = np.lexsort((tiebreak, *reversed(cols)))
    change = np.zeros(len(tiebreak), bool)
    if len(tiebreak):
        change[0] = True
        for a in cols:
            a = a[order]
            change[1:] |= a[1:] != a[:-1]
    starts = np.flatnonzero(change)
    sizes = np.diff(np.r_[starts, len(tiebreak)])
    return order, starts, sizes


def distinct_pairs(pairs_ds, *, val_col: str | None = None, val_reduce: str = "min",
                   num_buckets: int = 64):
    """Distinct (a,b) pairs via coarse-bucketed vectorized dedup.

    A plain ``groupby(["a","b"]).aggregate`` pays per-group overhead on
    hundreds of thousands of tiny groups; here pairs hash into
    ``num_buckets`` coarse buckets (ONE shuffle) and each bucket dedups
    with a numpy lexsort — constant group count regardless of pair count.
    ``val_col`` optionally carries a value reduced per pair (min/max).
    """
    red = {"min": np.minimum, "max": np.maximum}[val_reduce]

    def add_bucket(t: pa.Table) -> pa.Table:
        a = np.asarray(t["a"].to_numpy(zero_copy_only=False), np.uint64)
        b = np.asarray(t["b"].to_numpy(zero_copy_only=False), np.uint64)
        with np.errstate(over="ignore"):
            bk = mix64(a * np.uint64(0x9E3779B97F4A7C15) ^ b) % np.uint64(num_buckets)
        return t.append_column("_pb", pa.array(bk.astype(np.int32)))

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        a = g["a"].to_numpy(np.int64)
        b = g["b"].to_numpy(np.int64)
        if len(a) == 0:
            out = {"a": a, "b": b}
            if val_col is not None:
                out[val_col] = g[val_col].to_numpy()
            return pd.DataFrame(out)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        starts = np.flatnonzero(new)
        out = {"a": a[starts], "b": b[starts]}
        if val_col is not None:
            v = g[val_col].to_numpy()[order]
            out[val_col] = red.reduceat(v, starts) if len(v) else v
        return pd.DataFrame(out)

    return (
        pairs_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(uniq, batch_format="pandas")
    )


def _band_rows(t: pa.Table, id_col: str, bands: int, rows: int) -> pa.Table:
    """Explode signatures into (band, band_hash, id) rows for LSH bucketing."""
    ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False))
    sig = np.stack([np.asarray(x) for x in t["minhash"].to_pylist()]).astype(np.uint64)
    out_band, out_hash, out_id = [], [], []
    with np.errstate(over="ignore"):
        for b in range(bands):
            seg = sig[:, b * rows : (b + 1) * rows]
            h = np.zeros(len(seg), np.uint64)
            for j in range(rows):
                h = mix64(h ^ seg[:, j])
            out_band.append(np.full(len(seg), b, np.int32))
            out_hash.append(h)
            out_id.append(ids)
    return pa.table(
        {
            "band": np.concatenate(out_band),
            "band_hash": np.concatenate(out_hash),
            id_col: np.concatenate(out_id),
        }
    )


def minhash_lsh_pairs(
    docs_ds,
    *,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
    jaccard_threshold: float = 0.5,
    seed: int = 42,
):
    """Candidate near-dup pairs via MinHash + LSH banding.

    shingle -> minhash -> band -> ``groupby(band, band_hash)`` -> pairs
    within each bucket, verified by estimated Jaccard (fraction of equal
    signature components >= threshold). Returns (a, b, sim) pairs, a < b.
    """
    rows = num_hashes // bands
    signed = docs_ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_hashes": num_hashes, "k": k, "seed": seed},
        batch_format="pandas",
        concurrency=(1, 8),
        batch_size=1024,
    ).materialize()  # consumed twice: banding + signature verification
    def banded_with_coarse(t: pa.Table) -> pa.Table:
        b = _band_rows(t, id_col, bands, rows)
        with np.errstate(over="ignore"):
            coarse = mix64(
                np.asarray(b["band_hash"].to_numpy(zero_copy_only=False), np.uint64)
                ^ (np.asarray(b["band"].to_numpy(zero_copy_only=False), np.uint64) + 1)
                * np.uint64(0x9E3779B97F4A7C15)
            ) % np.uint64(64)
        return b.append_column("coarse", pa.array(coarse.astype(np.int32)))

    banded = signed.map_batches(banded_with_coarse, batch_format="pyarrow")

    # coarse hash buckets: many tiny (band, band_hash) groups ride one group,
    # pair generation is vectorized inside (per-group python calls would
    # dominate at scale)
    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        band = g["band"].to_numpy(np.int64)
        bh = g["band_hash"].to_numpy(np.uint64)
        ids = g[id_col].to_numpy(np.int64)
        order, starts, sizes = _segments_of([band, bh], ids)
        a, b = _pairs_in_segments(ids[order], starts, sizes)
        return pd.DataFrame({"a": a, "b": b})

    pairs = distinct_pairs(
        banded.groupby("coarse").map_groups(bucket_pairs, batch_format="pandas")
    )

    # verification: re-sign both sides and estimate Jaccard from signatures.
    # signatures are small; collect the signature table once as the lookup
    # side (broadcast small side) — at larger scale this becomes a third
    # co-grouped join on id.
    sig_tbl = signed.select_columns([id_col, "minhash"]).to_pandas()
    sig_map = {int(i): np.asarray(s, np.uint64) for i, s in
               zip(sig_tbl[id_col], sig_tbl["minhash"])}
    import ray

    sig_ref = ray.put(sig_map)

    def verify(t: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(sig_ref)
        if len(t) == 0:
            return pd.DataFrame({"a": [], "b": [], "sim": []})
        sims = [
            float((m[int(a)] == m[int(b)]).mean()) for a, b in zip(t["a"], t["b"])
        ]
        t = t.copy()
        t["sim"] = sims
        return t[t["sim"] >= jaccard_threshold]

    return pairs.map_batches(verify, batch_format="pandas")


def dedup_clusters(pairs_ds, all_ids_ds, *, id_col: str = "doc_id", num_parts: int = 16):
    """Near-dup clusters: connected components over the candidate-pair graph.

    Returns (doc_id, keep_id): keep_id = min doc id of the near-dup
    cluster (singletons keep themselves).
    """
    import ray.data as rd

    from raygraph.algorithms.components import connected_components
    from raygraph.graph import build_graph

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": np.asarray(t["a"].to_numpy(zero_copy_only=False), np.uint64),
                "dst": np.asarray(t["b"].to_numpy(zero_copy_only=False), np.uint64),
            }
        )

    def to_verts(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": np.asarray(t[id_col].to_numpy(zero_copy_only=False), np.uint64)}
        )

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow")
    verts = all_ids_ds.map_batches(to_verts, batch_format="pyarrow")
    g = build_graph(edges, vertices_ds=verts, num_parts=num_parts,
                    symmetrize=True, drop_self=True, binarize=True)
    f, _ = connected_components(g)
    return g.to_vertex_table(f, "keep_id")


# ----------------------------------------------------------------- simhash ----


class SimHasher:
    """64-bit SimHash over word tokens (sign of summed token-hash bits)."""

    def __init__(self, seed: int = 7):
        import re

        self.word = re.compile(r"\w+")
        self.seed = np.uint64(seed)

    def sim64(self, s: str) -> np.uint64:
        toks = self.word.findall((s or "").lower())
        if not toks:
            return np.uint64(0)
        with np.errstate(over="ignore"):
            hs = mix64(pd.util.hash_array(np.asarray(toks, object)) ^ self.seed)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        score = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        out = np.uint64(0)
        for i in np.flatnonzero(score > 0):
            out |= np.uint64(1) << np.uint64(i)
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = [self.sim64(s) for s in batch["text"].fillna("")]
        batch["simhash"] = batch["simhash"].astype(np.uint64)
        return batch


def simhash_pairs(docs_ds, *, id_col: str = "doc_id", max_hamming: int = 3):
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Block on each of the 4 16-bit chunks (a pair within distance 3 must
    agree exactly on at least one chunk) -> groupby chunk bucket ->
    verify Hamming within bucket.
    """
    signed = docs_ds.map_batches(SimHasher, batch_format="pandas",
                                 concurrency=(1, 8), batch_size=2048)

    def chunks(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False))
        sh = np.asarray(t["simhash"].to_numpy(zero_copy_only=False), np.uint64)
        out = []
        for c in range(4):
            key = (sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            out.append(pa.table({"chunk": np.full(len(ids), c, np.int32),
                                 "key": key, id_col: ids, "simhash": sh}))
        return pa.concat_tables(out)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        chunk = g["chunk"].to_numpy(np.int64)
        key = g["key"].to_numpy(np.uint64)
        ids = g[id_col].to_numpy(np.int64)
        sh = g["simhash"].to_numpy(np.uint64)
        order, starts, sizes = _segments_of([chunk, key], ids)
        ids_s, sh_s = ids[order], sh[order]
        pos = np.arange(len(ids_s))
        ia, ib = _pairs_in_segments(pos, starts, sizes, cap=500)
        if len(ia) == 0:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        x = sh_s[ia] ^ sh_s[ib]
        ham = np.unpackbits(x[:, None].view(np.uint8), axis=1).sum(axis=1)
        keep = ham <= max_hamming
        return pd.DataFrame({"a": ids_s[ia][keep], "b": ids_s[ib][keep],
                             "hamming": ham[keep].astype(np.int64)})

    def chunks_with_coarse(t: pa.Table) -> pa.Table:
        c = chunks(t)
        with np.errstate(over="ignore"):
            coarse = mix64(
                np.asarray(c["key"].to_numpy(zero_copy_only=False), np.uint64)
                ^ (np.asarray(c["chunk"].to_numpy(zero_copy_only=False), np.uint64) + 1)
                * np.uint64(0x9E3779B97F4A7C15)
            ) % np.uint64(64)
        return c.append_column("coarse", pa.array(coarse.astype(np.int32)))

    return distinct_pairs(
        signed.map_batches(chunks_with_coarse, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(bucket_pairs, batch_format="pandas"),
        val_col="hamming",
        val_reduce="min",
    )


# ----------------------------------------------------------- ngram jaccard ----


def ngram_jaccard(a_texts: list[str], b_texts: list[str], n: int = 3) -> np.ndarray:
    """Exact word-n-gram Jaccard for verified candidate pairs (vectorized
    per pair; used as the exact verifier behind MinHash estimates)."""
    out = np.empty(len(a_texts))
    for i, (a, b) in enumerate(zip(a_texts, b_texts)):
        ta, tb = (a or "").split(), (b or "").split()
        sa = {tuple(ta[j : j + n]) for j in range(max(0, len(ta) - n + 1))}
        sb = {tuple(tb[j : j + n]) for j in range(max(0, len(tb) - n + 1))}
        u = len(sa | sb)
        out[i] = (len(sa & sb) / u) if u else 1.0
    return out
