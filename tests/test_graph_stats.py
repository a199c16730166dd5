"""Whole-graph statistics (graph/stats.py) vs NetworkX oracles."""

import numpy as np
import pyarrow as pa
import pytest

nx = pytest.importorskip("networkx")


def _mk(src, dst, n=None, vids=None):
    import ray.data as rd
    edges = rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64), pa.int64()),
        "dst": pa.array(np.asarray(dst, np.int64), pa.int64())}))
    if vids is None:
        vids = np.arange(n, dtype=np.int64)
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.asarray(vids, np.int64), pa.int64())}))
    return edges, verts


def _rand(n=80, m=400, seed=7, self_loops=False):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    if not self_loops:
        keep = src != dst
        src, dst = src[keep], dst[keep]
    return src, dst


def test_reciprocity_matches_networkx():
    from metis_ray.graph.stats import reciprocity
    src, dst = _rand(n=40, m=500, seed=11)      # dense => many reciprocals
    edges, _ = _mk(src, dst, n=40)
    got = reciprocity(edges)
    g = nx.DiGraph()
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    assert got["edges"] == g.number_of_edges()
    assert got["reciprocity"] == pytest.approx(
        nx.overall_reciprocity(g), abs=1e-12)


def test_reciprocity_self_loops_and_duplicates():
    """Documented semantics: distinct edge set; self-loops reciprocated."""
    from metis_ray.graph.stats import reciprocity
    #       a<->b pair, c->d one-way, e self-loop, duplicate rows everywhere
    src = [1, 2, 1, 3, 5, 5, 3]
    dst = [2, 1, 2, 4, 5, 5, 4]
    edges, _ = _mk(src, dst, n=6)
    got = reciprocity(edges)
    # distinct edges: (1,2),(2,1),(3,4),(5,5) => 4; reciprocated: 2 + 1
    assert got == {"reciprocated": 3, "edges": 4, "reciprocity": 0.75}


def test_assortativity_matches_networkx():
    from metis_ray.graph.stats import degree_assortativity
    src, dst = _rand(n=60, m=700, seed=5)
    edges, _ = _mk(src, dst, n=60)
    got = degree_assortativity(edges)
    g = nx.DiGraph()
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = nx.degree_assortativity_coefficient(g, x="out", y="in")
    assert got["edges"] == g.number_of_edges()
    assert got["assortativity"] == pytest.approx(want, abs=1e-8)


def test_assortativity_degenerate_regular_graph():
    """A directed cycle is degree-regular: zero variance => NaN, not a
    crash (NetworkX raises/warns here; we return NaN)."""
    from metis_ray.graph.stats import degree_assortativity
    n = 12
    src = np.arange(n)
    dst = (src + 1) % n
    edges, _ = _mk(src, dst, n=n)
    got = degree_assortativity(edges)
    assert got["edges"] == n and np.isnan(got["assortativity"])


def test_clustering_matches_networkx():
    from metis_ray.graph.stats import clustering_coefficients
    src, dst = _rand(n=50, m=300, seed=9)
    vids = np.arange(55)                        # 5 isolated vertices
    edges, verts = _mk(src, dst, vids=vids)
    got = clustering_coefficients(edges, verts).to_pandas()
    g = nx.Graph()
    g.add_nodes_from(range(55))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = nx.clustering(g)
    assert len(got) == 55
    for v, cc in zip(got["v"], got["clustering"]):
        assert cc == pytest.approx(want[int(v)], abs=1.01e-6), int(v)


def test_modularity_matches_networkx():
    import ray.data as rd
    from metis_ray.graph.stats import modularity
    src, dst = _rand(n=45, m=260, seed=14)
    edges, _ = _mk(src, dst, n=45)
    lab = np.arange(45, dtype=np.int64) % 4           # fixed 4-way partition
    labels = rd.from_arrow(pa.table({
        "v": pa.array(np.arange(45, dtype=np.int64), pa.int64()),
        "label": pa.array(lab, pa.int64())}))
    t = modularity(edges, labels).to_pandas().iloc[0]
    g = nx.Graph()
    g.add_nodes_from(range(45))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    comms = [set(np.flatnonzero(lab == c).tolist()) for c in range(4)]
    assert t["n_edges"] == g.number_of_edges()
    assert t["n_communities"] == 4
    assert t["modularity"] == pytest.approx(
        nx.community.modularity(g, comms), abs=1.01e-6)


def test_modularity_no_edges():
    import ray.data as rd
    from metis_ray.graph.stats import modularity
    edges = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    labels = rd.from_arrow(pa.table({
        "v": pa.array([1, 2], pa.int64()),
        "label": pa.array([1, 1], pa.int64())}))
    t = modularity(edges, labels).to_pandas().iloc[0]
    assert t["n_edges"] == 0 and t["n_communities"] == 1
    assert np.isnan(t["modularity"])


def test_modularity_partial_labels_raise():
    """Labels that do not cover every edge-incident vertex are not a
    partition: NetworkX raises NotAPartition, we raise ValueError (an
    inner join would silently compute a plausible wrong Q)."""
    import ray.data as rd
    from metis_ray.graph.stats import modularity
    edges, _ = _mk([0, 1, 2], [1, 2, 3], n=4)
    labels = rd.from_arrow(pa.table({
        "v": pa.array([0, 1], pa.int64()),
        "label": pa.array([0, 0], pa.int64())}))
    with pytest.raises(ValueError, match="not a partition"):
        modularity(edges, labels)


def test_clustering_ignores_self_loops():
    """nx.clustering ignores self-loops; degrees must not be inflated."""
    from metis_ray.graph.stats import clustering_coefficients
    # triangle 0-1-2 plus a self-loop on 0
    src = [0, 1, 2, 0]
    dst = [1, 2, 0, 0]
    edges, verts = _mk(src, dst, n=3)
    got = clustering_coefficients(edges, verts).to_pandas()
    g = nx.Graph()
    g.add_edges_from([(0, 1), (1, 2), (2, 0), (0, 0)])
    want = nx.clustering(g)
    for v, cc in zip(got["v"], got["clustering"]):
        assert cc == pytest.approx(want[int(v)], abs=1.01e-6), int(v)


def test_clustering_empty_vertex_block():
    """graph_vertices() can emit zero-row blocks (all-quarantined input
    partitions); the join left side must be compacted first."""
    import ray.data as rd
    from metis_ray.graph.stats import clustering_coefficients
    src, dst = _rand(n=20, m=60, seed=1)
    edges, _ = _mk(src, dst, n=20)
    empty = rd.from_arrow(pa.table({
        "vertex_id": pa.array([], pa.int64())}))
    full = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.arange(20, dtype=np.int64), pa.int64())}))
    verts = empty.union(full)
    got = clustering_coefficients(edges, verts).to_pandas()
    assert len(got) == 20


def test_assortativity_star_graph():
    """Hub graph: fewer distinct src keys than join partitions must not
    crash the chained join (empty-partition compaction between joins)."""
    from metis_ray.graph.stats import degree_assortativity
    n = 20
    src = np.zeros(n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    edges, _ = _mk(src, dst, n=n)
    got = degree_assortativity(edges)
    assert got["edges"] == n - 1
    # all x = n-1, all y = 1: zero variance on both axes => NaN
    assert np.isnan(got["assortativity"])


def test_average_neighbor_degree_matches_networkx():
    from metis_ray.graph.stats import average_neighbor_degree
    src, dst = _rand(n=40, m=200, seed=19)
    vids = np.arange(44)                     # 4 isolated vertices
    edges, verts = _mk(src, dst, vids=vids)
    got = average_neighbor_degree(edges, verts).to_pandas()
    g = nx.Graph()
    g.add_nodes_from(range(44))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = nx.average_neighbor_degree(g)
    assert len(got) == 44
    for v, m in zip(got["v"], got["avg_neighbor_degree"]):
        assert m == pytest.approx(want[int(v)], abs=1.01e-6), int(v)


def test_average_neighbor_degree_no_edges():
    import ray.data as rd
    from metis_ray.graph.stats import average_neighbor_degree
    edges = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.arange(3, dtype=np.int64), pa.int64())}))
    got = average_neighbor_degree(edges, verts).to_pandas()
    assert got["avg_neighbor_degree"].tolist() == [0.0, 0.0, 0.0]


def test_stats_on_real_corpus_graph(tiny_corpus_dir):
    """The new statistics vs NetworkX over the ACTUAL ingested corpus
    graph (not synthetic edge lists): summary scalars, clustering and
    average neighbor degree must all match on the real edge table."""
    from metis_ray.graph.stats import (average_neighbor_degree,
                                       clustering_coefficients,
                                       graph_summary)
    from metis_ray.pipelines.linkgraph import graph_vertices, ingest

    res = ingest(tiny_corpus_dir)
    verts = graph_vertices(res.files)
    edf = res.edges_file.select_columns(["src", "dst"]).to_pandas()
    vids = verts.to_pandas()["vertex_id"].tolist()

    g = nx.DiGraph()
    g.add_nodes_from(int(v) for v in vids)
    g.add_edges_from(zip(edf["src"], edf["dst"]))

    row = graph_summary(res.edges_file, verts).to_pandas().iloc[0]
    assert row["n_vertices"] == len(vids)
    assert row["n_edges"] == g.number_of_edges()
    assert row["density"] == pytest.approx(nx.density(g), abs=1e-6)
    assert row["reciprocity"] == pytest.approx(
        nx.overall_reciprocity(g), abs=1e-6)
    want_r = nx.degree_assortativity_coefficient(g, x="out", y="in")
    assert row["assortativity"] == pytest.approx(want_r, abs=1e-6)

    u = g.to_undirected()
    cc = clustering_coefficients(res.edges_file, verts).to_pandas()
    want_cc = nx.clustering(u)
    assert len(cc) == len(vids)
    for v, c in zip(cc["v"], cc["clustering"]):
        assert c == pytest.approx(want_cc[int(v)], abs=1.01e-6), int(v)

    nd = average_neighbor_degree(res.edges_file, verts).to_pandas()
    want_nd = nx.average_neighbor_degree(u)
    for v, m in zip(nd["v"], nd["avg_neighbor_degree"]):
        assert m == pytest.approx(want_nd[int(v)], abs=1e-9), int(v)


def _brandes_reference(adj, nodes, sources):
    """Textbook sequential Brandes (unweighted, exact int σ), restricted
    to the given source set — the independent oracle for k-source runs."""
    import collections
    bc = {v: 0.0 for v in nodes}
    for s in sources:
        dist = {s: 0}
        sigma = collections.defaultdict(int)
        sigma[s] = 1
        order = [s]
        dq = collections.deque([s])
        while dq:
            u = dq.popleft()
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    order.append(w)
                    dq.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = collections.defaultdict(float)
        for w in reversed(order):
            for x in adj.get(w, ()):
                if dist.get(x) == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[x] * (1.0 + delta[x])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_on_real_corpus_graph(tiny_corpus_dir):
    """k-source betweenness over the real corpus graph vs a sequential
    Brandes transcription restricted to the same source set."""
    from metis_ray.graph.betweenness import betweenness_dataset
    from metis_ray.pipelines.linkgraph import graph_vertices, ingest

    res = ingest(tiny_corpus_dir)
    verts = graph_vertices(res.files)
    vids = sorted(int(v) for v in verts.to_pandas()["vertex_id"])
    sources = vids[:8]
    got = betweenness_dataset(res.edges_file, verts,
                              sources=sources)[0].to_pandas()
    got = dict(zip(got["v"].astype(int), got["betweenness"]))

    edf = res.edges_file.select_columns(["src", "dst"]).to_pandas()
    adj = {}
    for a, b in zip(edf["src"], edf["dst"]):
        adj.setdefault(int(a), set()).add(int(b))
    want = _brandes_reference(adj, vids, sources)
    for v in vids:
        assert got[v] == pytest.approx(want[v], abs=1e-6), v


def test_graph_summary_exact():
    from metis_ray.graph.stats import graph_summary
    src, dst = _rand(n=30, m=260, seed=3)
    edges, verts = _mk(src, dst, n=30)
    t = graph_summary(edges, verts).to_pandas()
    g = nx.DiGraph()
    g.add_nodes_from(range(30))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    row = t.iloc[0]
    assert row["n_vertices"] == 30
    assert row["n_edges"] == g.number_of_edges()
    assert row["density"] == pytest.approx(nx.density(g), abs=1e-6)
    assert row["reciprocity"] == pytest.approx(
        nx.overall_reciprocity(g), abs=1e-6)
    assert row["assortativity"] == pytest.approx(
        nx.degree_assortativity_coefficient(g, x="out", y="in"), abs=1e-6)


def test_modularity_duplicate_labels_raise():
    """A duplicate vertex row in the label table is not a partition: the
    row-count coverage check alone would be fooled (3 join rows == 3
    edge-incident vertices with vertex 2 unlabeled and vertex 0 doubled),
    silently double-counting deg_c/sw. NetworkX raises NotAPartition."""
    import ray.data as rd
    from metis_ray.graph.stats import modularity
    edges, _ = _mk([0, 1], [1, 2], n=3)
    labels = rd.from_arrow(pa.table({
        "v": pa.array([0, 0, 1], pa.int64()),
        "label": pa.array([0, 0, 0], pa.int64())}))
    with pytest.raises(ValueError, match="not a partition"):
        modularity(edges, labels)


def test_mutual_edges_matches_networkx_reciprocity(ray_session):
    import networkx as nx

    import ray.data as rd

    from metis_ray.graph.stats import mutual_edges
    rng = np.random.RandomState(17)
    n, m = 40, 400
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": pa.array(src), "dst": pa.array(dst)}))
    got = mutual_edges(ds).to_pandas()
    pairs = {(int(r.src), int(r.dst)) for r in got.itertuples()}

    E = {(int(a), int(b)) for a, b in zip(src, dst) if a != b}
    want = {(min(a, b), max(a, b)) for (a, b) in E if (b, a) in E}
    assert pairs == want
    # cardinality ties out with nx.overall_reciprocity over the DiGraph
    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    G.add_edges_from(E)
    assert 2 * len(pairs) == round(nx.overall_reciprocity(G) *
                                   G.number_of_edges())
