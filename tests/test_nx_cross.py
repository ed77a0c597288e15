"""Cross-library checks: pin raygraph semantics against networkx (an
independent public implementation) on random graphs — import-gated like
the io.py bridges."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

nx = pytest.importorskip("networkx")

from tests import fixtures as fx  # noqa: E402


def _edges(pairs):
    s, d = zip(*pairs)
    return rd.from_arrow(pa.table({
        "src": np.array(s, np.uint64), "dst": np.array(d, np.uint64),
        "w": np.ones(len(s), np.float64)}))


def _random_undirected(n=40, p=0.12, seed=31):
    A = (fx.random_graph(n, p, seed=seed, symmetric=True) != 0)
    np.fill_diagonal(A, False)
    G = nx.from_numpy_array(A.astype(int))
    iu, ju = np.nonzero(np.triu(A, 1))
    return G, list(zip(iu.tolist(), ju.tolist()))


def test_rich_club_matches_networkx():
    from raygraph.algorithms.metrics import rich_club

    G, pairs = _random_undirected()
    got = rich_club(_edges(pairs), ks=(1, 2, 3, 4)).to_pydict()
    want = nx.rich_club_coefficient(G, normalized=False)
    for k, phi in zip(got["k"], got["phi_ppm"]):
        if k in want:
            assert phi == int(want[k] * 1_000_000), k


def test_s_metric_matches_networkx():
    from raygraph.algorithms.metrics import s_metric

    G, pairs = _random_undirected(seed=37)
    got = s_metric(_edges(pairs)).to_pydict()
    want = int(sum(G.degree(u) * G.degree(v) for u, v in G.edges()))
    assert got["s_metric"] == [want]


def test_transitivity_matches_networkx():
    from raygraph.algorithms.metrics import transitivity

    G, pairs = _random_undirected(seed=41)
    got = transitivity(_edges(pairs)).to_pydict()
    want = nx.transitivity(G)
    assert abs(got["transitivity_ppm"][0] / 1e6 - want) < 2e-6


def test_scc_labels_match_networkx():
    from raygraph.algorithms.scc import scc_fused
    from raygraph.graph import build_graph

    A = (fx.random_graph(40, 0.08, seed=43) != 0)
    np.fill_diagonal(A, False)
    G = nx.from_numpy_array(A.astype(int), create_using=nx.DiGraph)
    e = rd.from_arrow(fx.dense_to_edge_table(A.astype(np.float64)))
    g = build_graph(e, num_parts=4, dup_op="first", binarize=True)

    def swap(t):
        return pa.table({"src": t["dst"], "dst": t["src"], "w": t["w"]})

    gT = build_graph(e.map_batches(swap, batch_format="pyarrow"),
                     num_parts=4, dup_op="first", binarize=True)
    labels = scc_fused(g, gT)
    t = g.to_vertex_table(labels, "scc").to_pandas()
    mine = {}
    for v, c in zip(t["v"], t["scc"]):
        mine.setdefault(c, set()).add(int(v))
    mine_sets = {frozenset(s) for s in mine.values()}
    verts = set(int(v) for v in t["v"])
    want_sets = {frozenset(c & verts) for c in
                 nx.strongly_connected_components(G)}
    want_sets = {c for c in want_sets if c}
    assert mine_sets == want_sets


def test_bowtie_matches_networkx_reach():
    # (nx.pagerank needs scipy, absent here — the dangling-PageRank
    # dense-numpy oracle lives in test_cores instead)
    from raygraph.algorithms.scc import bowtie

    A = (fx.random_graph(40, 0.06, seed=47) != 0)
    np.fill_diagonal(A, False)
    G = nx.from_numpy_array(A.astype(int), create_using=nx.DiGraph)
    e = rd.from_arrow(fx.dense_to_edge_table(A.astype(np.float64)))
    out = bowtie(e, num_parts=4).to_pydict()
    got = dict(zip(out["v"], out["cls"]))
    verts = set(got)
    sccs = [c & verts for c in nx.strongly_connected_components(G)]
    sccs = [c for c in sccs if c]
    core = max(sccs, key=lambda c: (len(c), -min(c)))
    r = min(core)
    fwd = (nx.descendants(G, r) | {r}) & verts
    bwd = (nx.ancestors(G, r) | {r}) & verts
    for v in verts:
        want = ("core" if v in core else
                "out" if v in fwd else
                "in" if v in bwd else "other")
        assert got[v] == want, (v, got[v], want)
