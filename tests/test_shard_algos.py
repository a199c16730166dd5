"""Shard-resident tail graph algorithms (graph/algos.py) vs their
Dataset-engine twins and NetworkX (VERDICT r4 "Next" #1-3).

Every algorithm here runs through the generic CSRShard per-vertex value
protocol — per-vertex state never visits the driver — and must produce
EXACTLY what the (already NetworkX-certified) Dataset-engine formulation
produces on the same input:

- HITS          == hits_dataset          (and nx.hits at 1e-6)
- BFS           == bfs_distance_dataset
- k-core        == coreness_dataset      (and nx.core_number exact)
- SCC           == scc_dataset           (and nx exact)
- MIS           == mis_dataset           (same fixed blake2b priorities)
- HyperBall     == hyperball()           (same HLL kernels row-for-row)
- betweenness   == betweenness_dataset   (and nx at 1e-9, both graph kinds)
- weighted / personalized PageRank (runner.pagerank) vs NetworkX
- weighted LPA (runner.label_propagation) vs labelprop_dataset(weight_col)
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from metis_ray.graph.partition import build_graph_dir
from metis_ray.graph.runner import GraphRunner

P = 4
N = 60
M = 260


def _random_multigraph(seed: int, n: int = N, m: int = M):
    """(src, dst) int64 arrays: self-loops + parallel edges included."""
    rng = np.random.RandomState(seed)
    return (rng.randint(0, n, m).astype(np.int64),
            rng.randint(0, n, m).astype(np.int64))


def _edges_ds(src, dst, w=None) -> rd.Dataset:
    cols = {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    if w is not None:
        cols["w"] = pa.array(w, pa.float64())
    return rd.from_arrow(pa.table(cols))


def _verts_ds(n: int = N) -> rd.Dataset:
    return rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.arange(n), pa.int64())}))


@pytest.fixture(scope="module")
def g1(ray_session):
    return _random_multigraph(23)


@pytest.fixture(scope="module")
def dir_g1(g1, tmp_path_factory):
    src, dst = g1
    return build_graph_dir(_edges_ds(src, dst), _verts_ds(),
                           str(tmp_path_factory.mktemp("dirg1")) + "/g", P,
                           directed=True)


@pytest.fixture(scope="module")
def und_g1(g1, tmp_path_factory):
    src, dst = g1
    return build_graph_dir(_edges_ds(src, dst), _verts_ds(),
                           str(tmp_path_factory.mktemp("undg1")) + "/g", P,
                           directed=False)


@pytest.fixture(scope="module")
def distinct_g1(g1, tmp_path_factory):
    """Distinct directed edges (betweenness sigma counts paths once)."""
    src, dst = g1
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    return build_graph_dir(_edges_ds(pairs[:, 0], pairs[:, 1]), _verts_ds(),
                           str(tmp_path_factory.mktemp("distg1")) + "/g", P,
                           directed=True)


def _vals(tbl, col) -> dict:
    v, x = tbl["v"], tbl[col]
    if hasattr(v, "to_pylist"):         # pa.Table column
        return dict(zip(v.to_pylist(), x.to_pylist()))
    return dict(zip(v.tolist(), x.tolist()))   # pandas DataFrame


def _runner(graph_dir):
    return GraphRunner(graph_dir)


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------

def test_hits_shard_matches_dataset_and_networkx(g1, dir_g1):
    import networkx as nx
    from metis_ray.graph.algos import hits_shard
    from metis_ray.graph.dataset_engine import hits_dataset

    src, dst = g1
    r = _runner(dir_g1)
    try:
        got_tbl, epochs = hits_shard(r, max_iter=200, tol=1e-10)
    finally:
        r.shutdown()
    assert epochs >= 2
    got_h = _vals(got_tbl, "hub")
    got_a = _vals(got_tbl, "authority")

    want_ds, _ = hits_dataset(_edges_ds(src, dst), _verts_ds(),
                              max_iter=200, tol=1e-10)
    wdf = want_ds.to_pandas().sort_values("v")
    np.testing.assert_allclose(
        [got_h[v] for v in wdf["v"]], wdf["hub"], atol=1e-9, rtol=0)
    np.testing.assert_allclose(
        [got_a[v] for v in wdf["v"]], wdf["authority"], atol=1e-9, rtol=0)

    # independent oracle on the deduped simple digraph view nx uses
    g = nx.DiGraph()
    g.add_nodes_from(range(N))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    # nx.hits counts each distinct edge once; rerun shard engine on the
    # distinct multiset for the apples-to-apples comparison
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        gd = build_graph_dir(_edges_ds(pairs[:, 0], pairs[:, 1]),
                             _verts_ds(), td + "/g", P, directed=True)
        r2 = _runner(gd)
        try:
            tbl2, _ = hits_shard(r2, max_iter=500, tol=1e-12)
        finally:
            r2.shutdown()
    h2, a2 = _vals(tbl2, "hub"), _vals(tbl2, "authority")
    # scipy isn't installed here; _hits_python is networkx's own
    # pure-python power iteration with identical semantics
    from networkx.algorithms.link_analysis.hits_alg import _hits_python
    wh, wa = _hits_python(g, max_iter=2000, tol=1e-12)
    np.testing.assert_allclose([h2[v] for v in sorted(wh)],
                               [wh[v] for v in sorted(wh)], atol=1e-6)
    np.testing.assert_allclose([a2[v] for v in sorted(wa)],
                               [wa[v] for v in sorted(wa)], atol=1e-6)


# ---------------------------------------------------------------------------
# BFS
# ---------------------------------------------------------------------------

def test_bfs_shard_matches_dataset(g1, dir_g1):
    from metis_ray.graph.algos import bfs_shard
    from metis_ray.graph.dataset_engine import bfs_distance_dataset

    src, dst = g1
    seeds = [0, 7]
    r = _runner(dir_g1)
    try:
        got_tbl, _ = bfs_shard(r, seeds)
    finally:
        r.shutdown()
    got = _vals(got_tbl, "dist")

    want_ds, _ = bfs_distance_dataset(_edges_ds(src, dst), _verts_ds(), seeds)
    want = _vals(want_ds.to_pandas(), "dist")
    assert got == want
    assert got[0] == 0 and got[7] == 0


def test_bfs_shard_unknown_seed_raises(dir_g1):
    from metis_ray.graph.algos import bfs_shard
    r = _runner(dir_g1)
    try:
        with pytest.raises(ValueError, match="not a graph vertex"):
            bfs_shard(r, [10**9])
    finally:
        r.shutdown()


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------

def test_kcore_shard_matches_networkx(g1, und_g1):
    import networkx as nx
    from metis_ray.graph.algos import kcore_shard

    src, dst = g1
    r = _runner(und_g1)
    try:
        got_tbl, _ = kcore_shard(r)
    finally:
        r.shutdown()
    got = _vals(got_tbl, "core")

    g = nx.Graph()
    g.add_nodes_from(range(N))
    g.add_edges_from((int(s), int(d)) for s, d in zip(src, dst) if s != d)
    assert got == nx.core_number(g)


# ---------------------------------------------------------------------------
# SCC
# ---------------------------------------------------------------------------

def test_scc_shard_matches_networkx(g1, dir_g1):
    import networkx as nx
    from metis_ray.graph.algos import scc_shard

    src, dst = g1
    r = _runner(dir_g1)
    try:
        got_tbl, _ = scc_shard(r)
    finally:
        r.shutdown()
    got = _vals(got_tbl, "scc")

    g = nx.DiGraph()
    g.add_nodes_from(range(N))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = {}
    for comp in nx.strongly_connected_components(g):
        mn = min(comp)
        for v in comp:
            want[v] = mn
    assert got == want


def test_scc_shard_structured(tmp_path):
    """Two one-way-bridged cycles, a DAG tail, a self-loop singleton, an
    isolated vertex (mirror of test_scc_structured for the shard engine)."""
    from metis_ray.graph.algos import scc_shard

    edges_list = [(10, 11), (11, 12), (12, 10), (20, 21), (21, 20),
                  (12, 20), (20, 30), (30, 31), (31, 32), (40, 40)]
    src, dst = (np.array(c, np.int64) for c in zip(*edges_list))
    verts = rd.from_arrow(pa.table({"vertex_id": pa.array(
        [10, 11, 12, 20, 21, 30, 31, 32, 40, 50], pa.int64())}))
    gd = build_graph_dir(_edges_ds(src, dst), verts,
                         str(tmp_path / "g"), P, directed=True)
    r = _runner(gd)
    try:
        got_tbl, _ = scc_shard(r)
    finally:
        r.shutdown()
    assert _vals(got_tbl, "scc") == {
        10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
        30: 30, 31: 31, 32: 32, 40: 40, 50: 50}


# ---------------------------------------------------------------------------
# MIS
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 5])
def test_mis_shard_matches_dataset(g1, und_g1, seed):
    from metis_ray.graph.algos import mis_shard
    from metis_ray.graph.dataset_engine import mis_dataset

    src, dst = g1
    r = _runner(und_g1)
    try:
        got_tbl, _ = mis_shard(r, seed=seed)
    finally:
        r.shutdown()
    got = _vals(got_tbl, "in_mis")

    want_ds, _ = mis_dataset(_edges_ds(src, dst), _verts_ds(), seed=seed)
    want = _vals(want_ds.to_pandas(), "in_mis")
    assert got == want

    # graph invariants: independence + maximality
    adj = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    chosen = {v for v, m in got.items() if m}
    for v in chosen:
        assert not (adj.get(v, set()) & chosen)
    for v, m in got.items():
        if not m:
            assert adj.get(v, set()) & chosen, f"{v} violates maximality"


# ---------------------------------------------------------------------------
# HyperBall
# ---------------------------------------------------------------------------

def test_hyperball_shard_matches_dataset(g1, dir_g1):
    from metis_ray.graph.algos import hyperball_shard
    from metis_ray.graph.hyperball import hyperball

    src, dst = g1
    r = _runner(dir_g1)
    try:
        got = hyperball_shard(r, p=7)
    finally:
        r.shutdown()
    want = hyperball(_edges_ds(src, dst), _verts_ds(), p=7)

    assert got["epochs"] == want["epochs"]
    np.testing.assert_allclose(got["nf"]["nf"].to_numpy(),
                               want["nf"]["nf"].to_numpy(), rtol=1e-12)
    assert abs(got["effective_diameter"] - want["effective_diameter"]) < 1e-9
    gdf = got["centrality"].to_pandas().sort_values("v").reset_index(drop=True)
    wdf = want["centrality"].to_pandas().sort_values("v").reset_index(drop=True)
    assert (gdf["v"] == wdf["v"]).all()
    np.testing.assert_allclose(gdf["ball"], wdf["ball"], rtol=1e-12)
    np.testing.assert_allclose(gdf["harmonic"], wdf["harmonic"], rtol=1e-12)


# ---------------------------------------------------------------------------
# Betweenness
# ---------------------------------------------------------------------------

def test_betweenness_shard_directed_exact(g1, distinct_g1):
    import networkx as nx
    from metis_ray.graph.algos import betweenness_shard

    src, dst = g1
    r = _runner(distinct_g1)
    try:
        got_tbl, _ = betweenness_shard(r, directed=True)
    finally:
        r.shutdown()
    got = _vals(got_tbl, "betweenness")

    g = nx.DiGraph()
    g.add_nodes_from(range(N))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = nx.betweenness_centrality(g, normalized=False)
    np.testing.assert_allclose([got[v] for v in sorted(want)],
                               [want[v] for v in sorted(want)], atol=1e-9)


def test_betweenness_shard_undirected_and_subset(g1, und_g1):
    import networkx as nx
    from metis_ray.graph.algos import betweenness_shard
    from metis_ray.graph.betweenness import betweenness_dataset

    src, dst = g1
    g = nx.Graph()
    g.add_nodes_from(range(N))
    g.add_edges_from((int(s), int(d)) for s, d in zip(src, dst) if s != d)
    want = nx.betweenness_centrality(g, normalized=False)

    r = _runner(und_g1)
    try:
        got_tbl, _ = betweenness_shard(r, directed=False)
        sub_tbl, _ = betweenness_shard(r, sources=[0, 1, 2], directed=False)
    finally:
        r.shutdown()
    got = _vals(got_tbl, "betweenness")
    np.testing.assert_allclose([got[v] for v in sorted(want)],
                               [want[v] for v in sorted(want)], atol=1e-9)

    # source-subset variant == dataset twin's subset semantics
    want_sub, _ = betweenness_dataset(_edges_ds(src, dst), _verts_ds(),
                                      sources=[0, 1, 2], directed=False)
    ws = _vals(want_sub.to_pandas(), "betweenness")
    gs = _vals(sub_tbl, "betweenness")
    np.testing.assert_allclose([gs[v] for v in sorted(ws)],
                               [ws[v] for v in sorted(ws)], atol=1e-9)


# ---------------------------------------------------------------------------
# Weighted / personalized PageRank + weighted LPA on the shard engine
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def gw(ray_session):
    src, dst = _random_multigraph(31)
    # deterministic integer-ish weights so DuckDB/NX agree bit-for-bit
    w = ((src * 7 + dst * 13) % 5 + 1).astype(np.float64)
    return src, dst, w


@pytest.fixture(scope="module")
def dir_gw(gw, tmp_path_factory):
    src, dst, w = gw
    return build_graph_dir(_edges_ds(src, dst, w), _verts_ds(),
                           str(tmp_path_factory.mktemp("dirgw")) + "/g", P,
                           directed=True, weight_col="w")


@pytest.fixture(scope="module")
def und_gw(gw, tmp_path_factory):
    src, dst, w = gw
    return build_graph_dir(_edges_ds(src, dst, w), _verts_ds(),
                           str(tmp_path_factory.mktemp("undgw")) + "/g", P,
                           directed=False, weight_col="w")


def test_shard_pagerank_weighted_matches_networkx(gw, dir_gw):
    import networkx as nx
    from networkx.algorithms.link_analysis.pagerank_alg import \
        _pagerank_python

    src, dst, w = gw
    r = _runner(dir_gw)
    try:
        stats = r.pagerank(alpha=0.85, tol=1e-11, max_iter=500,
                           payload_dtype="float64", weighted=True)
        assert stats.converged
        got = _vals(r.collect("rank"), "rank")
    finally:
        r.shutdown()

    g = nx.DiGraph()
    g.add_nodes_from(range(N))
    for s, d, wt in zip(src.tolist(), dst.tolist(), w.tolist()):
        # parallel edges sum their weights (the layout keeps each row; the
        # scatter sums contributions, so DiGraph must accumulate)
        if g.has_edge(s, d):
            g[s][d]["weight"] += wt
        else:
            g.add_edge(s, d, weight=wt)
    want = _pagerank_python(g, alpha=0.85, tol=1e-12, max_iter=1000,
                            weight="weight")
    np.testing.assert_allclose([got[v] for v in sorted(want)],
                               [want[v] for v in sorted(want)],
                               atol=1e-8, rtol=0)


def test_shard_pagerank_personalized_matches_networkx(g1, dir_g1):
    import networkx as nx
    from networkx.algorithms.link_analysis.pagerank_alg import \
        _pagerank_python

    src, dst = g1
    seeds = {0: 3.0, 7: 1.0}
    r = _runner(dir_g1)
    try:
        stats = r.pagerank(alpha=0.85, tol=1e-11, max_iter=500,
                           payload_dtype="float64", personalization=seeds)
        assert stats.converged
        got = _vals(r.collect("rank"), "rank")
    finally:
        r.shutdown()

    g = nx.MultiDiGraph()
    g.add_nodes_from(range(N))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = _pagerank_python(nx.DiGraph(g), alpha=0.85, tol=1e-12,
                            max_iter=1000, personalization=seeds)
    # the layout keeps parallel edges (multiset) while nx.DiGraph dedups;
    # compare on the distinct multiset instead
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        gd = build_graph_dir(_edges_ds(pairs[:, 0], pairs[:, 1]),
                             _verts_ds(), td + "/g", P, directed=True)
        r2 = _runner(gd)
        try:
            stats = r2.pagerank(alpha=0.85, tol=1e-11, max_iter=500,
                                payload_dtype="float64",
                                personalization=seeds)
            assert stats.converged
            got2 = _vals(r2.collect("rank"), "rank")
        finally:
            r2.shutdown()
    np.testing.assert_allclose([got2[v] for v in sorted(want)],
                               [want[v] for v in sorted(want)],
                               atol=1e-8, rtol=0)
    # multiset run still a valid distribution
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_shard_pagerank_personalized_unknown_seed_raises(dir_g1):
    r = _runner(dir_g1)
    try:
        with pytest.raises(ValueError, match="not a graph vertex"):
            r.pagerank(personalization={10**9: 1.0}, max_iter=3)
    finally:
        r.shutdown()


def test_shard_lpa_weighted_matches_dataset(gw, und_gw):
    from metis_ray.graph.dataset_engine import labelprop_dataset

    src, dst, w = gw
    r = _runner(und_gw)
    try:
        r.label_propagation(max_iter=30, weighted=True)
        got = _vals(r.collect("label"), "label")
    finally:
        r.shutdown()

    want_ds, _ = labelprop_dataset(_edges_ds(src, dst, w), _verts_ds(),
                                   max_iter=30, weight_col="w")
    want = _vals(want_ds.to_pandas(), "label")
    assert got == want


# ---------------------------------------------------------------------------
# Weighted SSSP (min-plus frontier Bellman-Ford)
# ---------------------------------------------------------------------------

def test_sssp_shard_matches_networkx_dijkstra(gw, dir_gw):
    import networkx as nx

    from metis_ray.graph.algos import sssp_shard

    src, dst, w = gw
    seeds = [0, 7]
    r = _runner(dir_gw)
    try:
        out, epochs = sssp_shard(r, seeds)
    finally:
        r.shutdown()
    got = _vals(out, "dist")
    assert epochs > 1

    g = nx.MultiDiGraph()
    g.add_nodes_from(range(N))
    for s, d, wt in zip(src.tolist(), dst.tolist(), w.tolist()):
        g.add_edge(s, d, weight=wt)
    want = nx.multi_source_dijkstra_path_length(g, seeds, weight="weight")
    for v in range(N):
        assert got[v] == want.get(v, -1.0), v
    assert any(d == -1.0 for d in got.values()) or len(want) == N


def test_sssp_shard_zero_weights_terminate(ray_session, tmp_path):
    import networkx as nx

    from metis_ray.graph.algos import sssp_shard

    src, dst = _random_multigraph(5, n=30, m=90)
    w = ((src + dst) % 3).astype(np.float64)          # zeros included
    gd = build_graph_dir(_edges_ds(src, dst, w), _verts_ds(30),
                         str(tmp_path) + "/g", P, directed=True,
                         weight_col="w")
    r = _runner(gd)
    try:
        out, _ = sssp_shard(r, [0])
    finally:
        r.shutdown()
    got = _vals(out, "dist")
    g = nx.MultiDiGraph()
    g.add_nodes_from(range(30))
    for s, d, wt in zip(src.tolist(), dst.tolist(), w.tolist()):
        g.add_edge(s, d, weight=wt)
    want = nx.multi_source_dijkstra_path_length(g, [0], weight="weight")
    for v in range(30):
        assert got[v] == want.get(v, -1.0), v


def test_sssp_shard_guards(dir_g1, dir_gw):
    from metis_ray.graph.algos import sssp_shard

    r = _runner(dir_g1)                               # unweighted dir
    try:
        with pytest.raises(ValueError, match="no edge weights"):
            sssp_shard(r, [0])
    finally:
        r.shutdown()
    r = _runner(dir_gw)
    try:
        with pytest.raises(ValueError, match="not a graph vertex"):
            sssp_shard(r, [10**9])
    finally:
        r.shutdown()


# ---------------------------------------------------------------------------
# Eigenvector + Katz centrality (nx semantics; distinct-edge weighted graph
# because NetworkX refuses multigraphs for both)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def distinct_gw(gw):
    """Distinct (src, dst) of gw with their (pair-deterministic) weights."""
    src, dst, _ = gw
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    s, d = pairs[:, 0], pairs[:, 1]
    w = ((s * 7 + d * 13) % 5 + 1).astype(np.float64)
    return s, d, w


@pytest.fixture(scope="module")
def dir_distinct_gw(distinct_gw, tmp_path_factory):
    s, d, w = distinct_gw
    return build_graph_dir(_edges_ds(s, d, w), _verts_ds(),
                           str(tmp_path_factory.mktemp("ddgw")) + "/g", P,
                           directed=True, weight_col="w")


def _nx_weighted_digraph(distinct_gw):
    import networkx as nx
    s, d, w = distinct_gw
    g = nx.DiGraph()
    g.add_nodes_from(range(N))
    for a, b, wt in zip(s.tolist(), d.tolist(), w.tolist()):
        g.add_edge(a, b, weight=wt)
    return g


def test_eigenvector_shard_matches_networkx(distinct_gw, dir_distinct_gw):
    import networkx as nx

    from metis_ray.graph.algos import eigenvector_shard

    r = _runner(dir_distinct_gw)
    try:
        out, epochs = eigenvector_shard(r, max_iter=1000, tol=1e-10,
                                        weighted=True)
    finally:
        r.shutdown()
    got = _vals(out, "eigenvector")
    want = nx.eigenvector_centrality(_nx_weighted_digraph(distinct_gw),
                                     max_iter=1000, tol=1e-10,
                                     weight="weight")
    np.testing.assert_allclose([got[v] for v in sorted(want)],
                               [want[v] for v in sorted(want)],
                               atol=1e-7, rtol=0)
    assert epochs < 1000


def test_eigenvector_shard_fixed_iteration_transcription(
        distinct_gw, dir_distinct_gw):
    """tol=0 runs exactly max_iter iterations of the documented recurrence
    — the deterministic mode the golden twins transcribe sequentially."""
    from metis_ray.graph.algos import eigenvector_shard

    iters = 40
    r = _runner(dir_distinct_gw)
    try:
        out, epochs = eigenvector_shard(r, max_iter=iters, tol=0.0,
                                        weighted=True)
    finally:
        r.shutdown()
    assert epochs == iters
    got = _vals(out, "eigenvector")

    s, d, w = distinct_gw
    x = np.full(N, 1.0 / N)
    for _ in range(iters):
        x2 = x.copy()
        np.add.at(x2, d, x[s] * w)
        x = x2 / (np.sqrt((x2 * x2).sum()) or 1.0)
    np.testing.assert_allclose([got[v] for v in range(N)], x,
                               atol=1e-11, rtol=0)


def test_katz_shard_matches_networkx(distinct_gw, dir_distinct_gw):
    import networkx as nx

    from metis_ray.graph.algos import katz_shard

    r = _runner(dir_distinct_gw)
    try:
        out, _ = katz_shard(r, alpha=0.01, beta=1.0, max_iter=2000,
                            tol=1e-10, weighted=True)
    finally:
        r.shutdown()
    got = _vals(out, "katz")
    want = nx.katz_centrality(_nx_weighted_digraph(distinct_gw), alpha=0.01,
                              beta=1.0, max_iter=2000, tol=1e-10,
                              weight="weight")
    np.testing.assert_allclose([got[v] for v in sorted(want)],
                               [want[v] for v in sorted(want)],
                               atol=1e-9, rtol=0)


def test_katz_shard_divergence_raises(dir_distinct_gw):
    from metis_ray.graph.algos import katz_shard

    r = _runner(dir_distinct_gw)
    try:
        with pytest.raises(RuntimeError, match="no convergence"):
            katz_shard(r, alpha=0.9, beta=1.0, max_iter=50, tol=1e-10,
                       weighted=True)
    finally:
        r.shutdown()


def test_seed_init_safe_on_empty_shard():
    """Zero-vertex shards are a loadable state (partition backfill on
    small/skewed graphs): the seed-position probe must not IndexError on
    the empty vertex array, and no seed may be claimed by an empty shard."""
    import types
    from metis_ray.graph.algos import (_bfs_init, _bw_init, _seed_positions,
                                       _sssp_init)
    sh = types.SimpleNamespace(n=0, verts=np.empty(0, np.int64), vals={})
    seeds = np.array([3, 7], dtype=np.int64)
    pos, ok = _seed_positions(sh, seeds)
    assert not ok.any()
    assert _bfs_init(sh, seeds) == 0
    assert sh.vals["dist"].shape == (0,)
    assert _sssp_init(sh, seeds) == 0
    assert _bw_init(sh, seeds) == 0
    assert sh.vals["dist"].shape == (0, len(seeds))   # bw: (n, k) matrix
