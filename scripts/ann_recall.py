"""Measure ANN recall@k vs exact cosine top-k on the testdata embeddings.

Runs knn_cosine (ground truth), knn_cosine_lsh (banded hyperplane LSH)
and knn_cosine_ivf (inverted-file index) over the same query set and
reports per-variant mean recall@k plus the candidate-work fraction the
approximate paths actually scored. Usage:

    python scripts/ann_recall.py [sf_dir] [n_queries] [k]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray
    import ray.data as rd

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raygraph.datapipe.similarity import knn_cosine, knn_cosine_ivf, knn_cosine_lsh

    emb = rd.read_parquet(f"{sf}/embeddings.parquet")
    n_corpus = emb.count()
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/embeddings.parquet").sort_by("vec_id")
    qids = np.asarray(t["vec_id"].to_numpy()[:nq], np.int64)
    Q = np.stack([np.asarray(e, np.float64) for e in t["embedding"].to_pylist()[:nq]])

    def topsets(df):
        return {
            int(q): set(g.sort_values("rank")["vec_id"].head(k))
            for q, g in df.groupby("query_id")
        }

    exact = topsets(knn_cosine(emb, Q, k=k, query_ids=qids).to_pandas())

    out = {"sf": sf, "n_corpus": int(n_corpus), "n_queries": nq, "k": k}
    for name, fn in {
        "lsh_b16r2": lambda: knn_cosine_lsh(emb, Q, k=k, bands=16,
                                            planes_per_band=2, query_ids=qids),
        "ivf_nlist16_nprobe4": lambda: knn_cosine_ivf(emb, Q, k=k, nlist=16,
                                                      nprobe=4, query_ids=qids),
    }.items():
        approx = topsets(fn().to_pandas())
        recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
        out[f"recall@{k}_{name}"] = round(float(np.mean(recalls)), 4)
        out[f"min_recall_{name}"] = round(float(np.min(recalls)), 4)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
