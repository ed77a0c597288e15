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
    banded = signed.map_batches(
        lambda t: _band_rows(t, id_col, bands, rows), batch_format="pyarrow"
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2 or len(ids) > 200:  # degenerate bucket guard (log-worthy)
            return pd.DataFrame({"a": [], "b": []})
        iu, ju = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"a": ids[iu], "b": ids[ju]})

    pairs = (
        banded.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")  # distinct pairs
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
        if len(g) < 2 or len(g) > 500:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy(np.uint64)
        order = np.argsort(ids)
        ids, sh = ids[order], sh[order]
        iu, ju = np.triu_indices(len(ids), 1)
        x = sh[iu] ^ sh[ju]
        ham = np.array([bin(int(v)).count("1") for v in x])
        keep = ham <= max_hamming
        return pd.DataFrame({"a": ids[iu][keep], "b": ids[ju][keep],
                             "hamming": ham[keep]})

    return (
        signed.map_batches(chunks, batch_format="pyarrow")
        .groupby(["chunk", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
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
