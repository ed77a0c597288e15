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
            # engine is exact-integer floor; nx returns a double —
            # compare with tolerance, not int() truncation
            assert abs(phi / 1e6 - want[k]) < 2e-6, k


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


def test_local_clustering_matches_networkx():
    from raygraph import kernels as K
    from raygraph.algorithms.metrics import local_clustering

    G, pairs = _random_undirected(seed=53)
    t = K.to_table(local_clustering(_edges(pairs)), sort_by=None).to_pydict()
    want = nx.clustering(G)
    tri_want = nx.triangles(G)
    for v, tri, ppm in zip(t["v"], t["tri"], t["lcc_ppm"]):
        assert tri == tri_want[v]
        assert abs(ppm / 1e6 - want[v]) < 2e-6


def test_kcore_matches_networkx():
    from raygraph import kernels as K
    from raygraph.algorithms.cores import kcore

    G, pairs = _random_undirected(n=50, p=0.1, seed=59)
    mine = set(K.to_table(kcore(_edges(pairs), 3),
                          sort_by=None).to_pydict()["v"])
    want = set(nx.k_core(G, 3).nodes)
    assert mine == want


def test_ktruss_matches_networkx():
    from raygraph import kernels as K
    from raygraph.algorithms.cores import edge_support

    # 3-truss edges = edges of nx.k_truss(G, 3) (every edge in >= 1
    # triangle after the peel); compare via our iterated peel query path
    from raygraph.pipelines.queries import QUERIES  # noqa: F401
    G, pairs = _random_undirected(n=40, p=0.15, seed=61)
    # replicate q_ktruss92's loop at k=3 on this fixture
    e = _edges(pairs)
    from raygraph.algorithms.cores import sym_edges
    sym = sym_edges(e).materialize()
    while True:
        sup = edge_support(sym.map_batches(
            lambda t: t, batch_format="pyarrow")).materialize()
        t = K.to_table(sup, sort_by=None)
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.uint64)
        d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.uint64)
        su = np.asarray(t["support"].to_numpy(zero_copy_only=False))
        keep = su >= 1  # k-2 with k=3
        if keep.all() and len(s) == sym.count() // 2:
            break
        both = pa.table({"src": np.r_[s[keep], d[keep]],
                         "dst": np.r_[d[keep], s[keep]],
                         "w": np.ones(2 * int(keep.sum()), np.float64)})
        new = rd.from_arrow(both).materialize()
        if new.count() == sym.count():
            sym = new
            break
        sym = new
    mine = set()
    t = K.to_table(sym, sort_by=None)
    for a, b in zip(t["src"].to_pylist(), t["dst"].to_pylist()):
        mine.add((min(a, b), max(a, b)))
    want = {(min(u, v), max(u, v)) for u, v in nx.k_truss(G, 3).edges}
    assert mine == want


def test_modularity_matches_networkx():
    from raygraph import kernels as K
    from raygraph.algorithms.metrics import modularity

    A = (fx.random_graph(30, 0.12, seed=67) != 0)
    np.fill_diagonal(A, False)
    G = nx.from_numpy_array(A.astype(int), create_using=nx.DiGraph)
    iu, ju = np.nonzero(A)
    e = rd.from_arrow(pa.table({"src": iu.astype(np.uint64),
                                "dst": ju.astype(np.uint64),
                                "w": np.ones(len(iu))}))
    vs = np.unique(np.concatenate([iu, ju])).astype(np.uint64)
    labs = pa.table({"v": vs, "label": (vs % np.uint64(3)).astype(np.int64)})
    m = modularity(e, labs)
    t = m if isinstance(m, pa.Table) else K.to_table(m, sort_by=None)
    q_mine = sum(t.to_pydict()["q"])
    comms = [set(int(v) for v in vs[vs % 3 == c]) for c in range(3)]
    q_want = nx.algorithms.community.modularity(G, comms)
    assert abs(q_mine - q_want) < 1e-5


def test_adamic_adar_matches_networkx():
    from raygraph import kernels as K
    from raygraph.algorithms.metrics import adamic_adar

    G, pairs = _random_undirected(n=40, p=0.15, seed=71)
    out = K.to_table(adamic_adar(_edges(pairs)), sort_by=None).to_pydict()
    got = {(a, b): aa for a, b, aa in
           zip(out["src"], out["dst"], out["aa"])}
    ebunch = list(got)
    for u, v, want in nx.adamic_adar_index(G, ebunch):
        assert abs(got[(u, v)] - want) < 1e-5, (u, v)


def test_katz_converged_matches_networkx():
    from raygraph.algorithms.katz import katz_fused
    from raygraph.graph import build_graph

    A = (fx.random_graph(30, 0.1, seed=73) != 0).astype(np.float64)
    g = build_graph(rd.from_arrow(fx.dense_to_edge_table(A)),
                    num_parts=4, dup_op="first", binarize=True)
    xs = katz_fused(g, alpha=0.05, beta=1.0, itermax=300, normalize=True)
    t = g.to_vertex_table(xs, "katz").to_pandas().set_index("v")["katz"]
    verts = sorted(int(v) for v in t.index)
    G = nx.from_numpy_array(A[np.ix_(verts, verts)].astype(int),
                            create_using=nx.DiGraph)
    want = nx.katz_centrality(G, alpha=0.05, beta=1.0, max_iter=2000,
                              tol=1e-12)
    got = np.array([t[v] for v in verts])
    np.testing.assert_allclose(got, [want[i] for i in range(len(verts))],
                               atol=1e-6)


def test_eigen_direction_matches_networkx():
    from raygraph.algorithms.katz import katz_fused
    from raygraph.graph import build_graph

    A = (fx.random_graph(30, 0.15, seed=79) != 0).astype(np.float64)
    g = build_graph(rd.from_arrow(fx.dense_to_edge_table(A)),
                    num_parts=4, dup_op="first", binarize=True)
    xs = katz_fused(g, alpha=1.0, beta=0.0, itermax=200, normalize=True,
                    x0=1.0)
    t = g.to_vertex_table(xs, "eig").to_pandas().set_index("v")["eig"]
    verts = sorted(int(v) for v in t.index)
    # our eigen accrues from IN-edges (y = Aᵀx) — nx's directed
    # eigenvector_centrality is the left-eigenvector (in-edge) form
    # already, so NO reverse here
    G = nx.from_numpy_array(A[np.ix_(verts, verts)].astype(int),
                            create_using=nx.DiGraph)
    want = nx.eigenvector_centrality(G, max_iter=2000, tol=1e-12)
    wv = np.array([want[i] for i in range(len(verts))])
    wv = wv / np.linalg.norm(wv)  # nx normalizes L2 already; idempotent
    got = np.array([t[v] for v in verts])
    np.testing.assert_allclose(got, wv, atol=1e-6)


def test_avg_neighbor_degree_matches_networkx():
    from raygraph.algorithms.metrics import avg_neighbor_degree

    G, pairs = _random_undirected(n=40, p=0.15, seed=83)
    out = avg_neighbor_degree(_edges(pairs)).to_pandas()
    want = nx.average_neighbor_degree(G)
    for r in out.itertuples():
        assert abs(r.avg_nbr_deg_ppm / 1e6 - want[r.v]) < 2e-6, r.v


def test_betweenness_all_sources_matches_networkx():
    from raygraph.algorithms.betweenness import betweenness
    from raygraph.graph import build_graph

    A = (fx.random_graph(25, 0.12, seed=89) != 0)
    np.fill_diagonal(A, False)
    e = rd.from_arrow(fx.dense_to_edge_table(A.astype(np.float64)))
    g = build_graph(e, num_parts=4, dup_op="first", binarize=True)

    def swap(t):
        return pa.table({"src": t["dst"], "dst": t["src"], "w": t["w"]})

    gT = build_graph(e.map_batches(swap, batch_format="pyarrow"),
                     num_parts=4, dup_op="first", binarize=True)
    verts = sorted(int(v) for v in
                   np.concatenate([i for i in g.ids_slices() if len(i)]))
    # every vertex as a landmark + unbounded depth = full Brandes
    out = betweenness(g, gT, verts, depth=100).to_pandas()
    got = dict(zip(out["v"].astype(int), out["bc"]))
    G = nx.from_numpy_array(A.astype(int), create_using=nx.DiGraph)
    want = nx.betweenness_centrality(G, normalized=False)
    for v in verts:
        assert abs(got.get(v, 0.0) - want[v]) < 1e-5, v


def test_sssp_matches_networkx_dijkstra():
    from raygraph.algorithms.paths import sssp
    from raygraph.graph import build_graph

    rng = np.random.default_rng(97)
    A = (fx.random_graph(30, 0.12, seed=97) != 0).astype(np.float64)
    W = np.where(A > 0, np.round(rng.uniform(1, 10, A.shape), 3), 0.0)
    iu, ju = np.nonzero(W)
    e = rd.from_arrow(pa.table({"src": iu.astype(np.uint64),
                                "dst": ju.astype(np.uint64),
                                "w": W[iu, ju]}))
    g = build_graph(e, num_parts=4, dup_op="first")
    src = int(iu[0])
    dist, _ = sssp(g, src)
    t = g.to_vertex_table(dist, "dist").to_pandas().set_index("v")["dist"]
    G = nx.from_numpy_array(W, create_using=nx.DiGraph)  # weight attr
    want = nx.single_source_dijkstra_path_length(G, src, weight="weight")
    for v in t.index:
        if np.isfinite(t[v]):
            assert abs(t[v] - want[int(v)]) < 1e-9, v
        else:
            assert int(v) not in want, v


def test_bfs_levels_match_networkx():
    from raygraph.algorithms.paths import bfs_levels
    from raygraph.graph import build_graph

    A = (fx.random_graph(40, 0.07, seed=101) != 0).astype(np.float64)
    e = rd.from_arrow(fx.dense_to_edge_table(A))
    g = build_graph(e, num_parts=4, dup_op="first", binarize=True)
    src = int(np.nonzero(A)[0][0])
    dist, _ = bfs_levels(g, src)
    t = g.to_vertex_table(dist, "dist").to_pandas().set_index("v")["dist"]
    G = nx.from_numpy_array(A.astype(int), create_using=nx.DiGraph)
    want = nx.single_source_shortest_path_length(G, src)
    for v in t.index:
        if np.isfinite(t[v]):
            assert int(t[v]) == want[int(v)], v
        else:
            assert int(v) not in want, v


def test_wl_partition_matches_networkx():
    from raygraph.algorithms.wl import wl_colors

    # 1-WL refinement converges to a canonical stable partition; our
    # uniform-init mix64 colors and nx's degree-init subgraph hashes
    # must induce the SAME partition once both have stabilized (our
    # round k+1 carries nx-iteration-k information, so run both past
    # the stabilization depth). Undirected graph: our in-neighbor
    # accrual over the symmetric edge list == nx's neighbor multiset.
    A = (fx.random_graph(30, 0.12, seed=103, symmetric=True) != 0)
    np.fill_diagonal(A, False)
    iu, ju = np.nonzero(A)  # both directions present
    e = rd.from_arrow(pa.table({"src": iu.astype(np.uint64),
                                "dst": ju.astype(np.uint64),
                                "w": np.ones(len(iu))}))
    vs = np.unique(np.concatenate([iu, ju])).astype(np.uint64)
    out = wl_colors(e, vs, rounds=5)
    t = out.to_pandas() if hasattr(out, "to_pandas") else out
    if not hasattr(t, "itertuples"):
        t = t.to_pandas()
    mine = {}
    for r in t.itertuples():
        mine.setdefault(r.color, set()).add(int(r.v))
    mine_sets = {frozenset(s) for s in mine.values()}
    G = nx.from_numpy_array(A.astype(int))
    h = nx.weisfeiler_lehman_subgraph_hashes(G, iterations=4)
    want = {}
    for v, hs in h.items():
        want.setdefault(hs[-1], set()).add(int(v))
    want_sets = {frozenset(s & set(map(int, vs))) for s in want.values()}
    want_sets = {s for s in want_sets if s}
    assert mine_sets == want_sets
