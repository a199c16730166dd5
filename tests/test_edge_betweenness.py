"""Edge betweenness (graph/algos.py::edge_betweenness_shard) vs NetworkX
edge_betweenness_centrality (full sources, both graph kinds) and a
sequential k-source Brandes-edge transcription."""

from collections import deque

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from metis_ray.graph.partition import build_graph_dir

P = 4


def _dir(src, dst, n, tmp, directed):
    # DISTINCT edges: the same contract as vertex betweenness (Brandes'
    # sigma counting requires a simple graph)
    pairs = sorted({(int(a), int(b)) for a, b in zip(src, dst) if a != b})
    edges = rd.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64())}))
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.arange(n), pa.int64())}))
    return build_graph_dir(edges, verts, str(tmp) + "/g", P,
                           directed=directed), pairs


def _run(src, dst, n, tmp, *, directed, sources=None):
    from metis_ray.graph.algos import edge_betweenness_shard
    from metis_ray.graph.runner import GraphRunner
    d, pairs = _dir(src, dst, n, tmp, directed)
    runner = GraphRunner(d)
    try:
        out, _ = edge_betweenness_shard(runner, sources=sources,
                                        directed=directed)
    finally:
        runner.shutdown()
    df = out.to_pandas()
    return ({(int(r.src), int(r.dst)): float(r.betweenness)
             for r in df.itertuples()}, pairs)


def _brandes_edges(adj, sources):
    """Sequential Brandes with edge accumulation (Brandes 2001, alg. 1
    extended to edges) — the independent transcription."""
    ebc: dict = {}
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[v]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for x in adj.get(w, ()):
                if dist.get(x) == dist[w] + 1:
                    c = sigma[w] / sigma[x] * (1.0 + delta[x])
                    ebc[(w, x)] = ebc.get((w, x), 0.0) + c
                    delta[w] += c
    return ebc


def test_edge_betweenness_full_matches_networkx_directed(ray_session,
                                                         tmp_path):
    import networkx as nx
    rng = np.random.RandomState(41)
    n, m = 30, 120
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    got, pairs = _run(src, dst, n, tmp_path, directed=True)
    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    G.add_edges_from(pairs)
    want = nx.edge_betweenness_centrality(G, normalized=False)
    for e, w in want.items():
        assert got.get(e, 0.0) == pytest.approx(w, abs=1e-9), e
    for e, w in got.items():
        assert want.get(e, 0.0) == pytest.approx(w, abs=1e-9), e


def test_edge_betweenness_full_matches_networkx_undirected(ray_session,
                                                           tmp_path):
    import networkx as nx
    rng = np.random.RandomState(43)
    n, m = 25, 80
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    got, pairs = _run(src, dst, n, tmp_path, directed=False)
    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from(pairs)
    want = {(min(a, b), max(a, b)): w for (a, b), w in
            nx.edge_betweenness_centrality(G, normalized=False).items()}
    for e in set(want) | set(got):
        assert got.get(e, 0.0) == pytest.approx(want.get(e, 0.0),
                                                abs=1e-9), e


def test_edge_betweenness_k_sources_matches_transcription(ray_session,
                                                          tmp_path):
    rng = np.random.RandomState(47)
    n, m = 40, 160
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    sources = list(range(8))
    got, pairs = _run(src, dst, n, tmp_path, directed=True,
                      sources=sources)
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
    want = _brandes_edges(adj, sources)
    for e in set(want) | set(got):
        assert got.get(e, 0.0) == pytest.approx(want.get(e, 0.0),
                                                abs=1e-9), e


def test_harmonic_full_matches_networkx(ray_session, tmp_path):
    import networkx as nx
    from metis_ray.graph.algos import harmonic_shard
    from metis_ray.graph.runner import GraphRunner
    rng = np.random.RandomState(53)
    n, m = 30, 100
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    d, pairs = _dir(src, dst, n, tmp_path, directed=True)
    runner = GraphRunner(d)
    try:
        out, _ = harmonic_shard(runner)      # sources = all = exact
    finally:
        runner.shutdown()
    got = {int(r.v): float(r.harmonic)
           for r in out.to_pandas().itertuples()}
    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    G.add_edges_from(pairs)
    want = nx.harmonic_centrality(G)
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_harmonic_k_sources_matches_transcription(ray_session, tmp_path):
    from metis_ray.graph.algos import harmonic_shard
    from metis_ray.graph.runner import GraphRunner
    rng = np.random.RandomState(59)
    n, m = 40, 150
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    sources = list(range(6))
    d, pairs = _dir(src, dst, n, tmp_path, directed=True)
    runner = GraphRunner(d)
    try:
        out, _ = harmonic_shard(runner, sources=sources)
    finally:
        runner.shutdown()
    got = {int(r.v): float(r.harmonic)
           for r in out.to_pandas().itertuples()}

    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
    want = {v: 0.0 for v in range(n)}
    for s in sources:
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for u in adj.get(v, ()):
                if u not in dist:
                    dist[u] = dist[v] + 1
                    q.append(u)
        for v, dd in dist.items():
            if dd > 0:
                want[v] += 1.0 / dd
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_closeness_full_matches_networkx(ray_session, tmp_path):
    import networkx as nx
    from metis_ray.graph.algos import closeness_shard
    from metis_ray.graph.runner import GraphRunner
    rng = np.random.RandomState(61)
    n, m = 30, 100
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    d, pairs = _dir(src, dst, n, tmp_path, directed=True)
    runner = GraphRunner(d)
    try:
        out, _ = closeness_shard(runner)     # sources = all, WF-scaled
    finally:
        runner.shutdown()
    got = {int(r.v): float(r.closeness)
           for r in out.to_pandas().itertuples()}
    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    G.add_edges_from(pairs)
    want = nx.closeness_centrality(G)        # incoming-distance, WF-scaled
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_closeness_k_sources_matches_transcription(ray_session, tmp_path):
    from metis_ray.graph.algos import closeness_shard
    from metis_ray.graph.runner import GraphRunner
    rng = np.random.RandomState(67)
    n, m = 40, 150
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    sources = list(range(6))
    d, pairs = _dir(src, dst, n, tmp_path, directed=True)
    runner = GraphRunner(d)
    try:
        out, _ = closeness_shard(runner, sources=sources)
    finally:
        runner.shutdown()
    got = {int(r.v): float(r.closeness)
           for r in out.to_pandas().itertuples()}

    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
    r_cnt = {v: 0 for v in range(n)}
    sd = {v: 0 for v in range(n)}
    for s in sources:
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for u in adj.get(v, ()):
                if u not in dist:
                    dist[u] = dist[v] + 1
                    q.append(u)
        for v, dd in dist.items():
            if dd > 0:
                r_cnt[v] += 1
                sd[v] += dd
    for v in range(n):
        want = r_cnt[v] / sd[v] if sd[v] > 0 else 0.0
        assert got[v] == pytest.approx(want, abs=1e-9), v
