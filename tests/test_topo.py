"""Topological layering (graph/algos.py::topo_shard) vs
nx.topological_generations on DAGs and a sequential Kahn transcription on
cyclic digraphs (leftover = on or downstream of a cycle, layer -1)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from metis_ray.graph.partition import build_graph_dir

P = 4


def _run(pairs, n, tmp):
    from metis_ray.graph.algos import topo_shard
    from metis_ray.graph.runner import GraphRunner
    edges = rd.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64())}))
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.arange(n), pa.int64())}))
    d = build_graph_dir(edges, verts, str(tmp) + "/g", P, directed=True)
    runner = GraphRunner(d)
    try:
        out, epochs = topo_shard(runner)
    finally:
        runner.shutdown()
    return ({int(r.v): int(r.layer) for r in out.to_pandas().itertuples()},
            epochs)


def _kahn(pairs, n):
    indeg = {v: 0 for v in range(n)}
    out: dict = {v: [] for v in range(n)}
    for a, b in pairs:
        if a != b:
            indeg[b] += 1
            out[a].append(b)
    layer = {v: -1 for v in range(n)}
    frontier = [v for v in range(n) if indeg[v] == 0]
    t = 0
    while frontier:
        nxt = []
        for v in frontier:
            layer[v] = t
            for u in out[v]:
                indeg[u] -= 1
                if indeg[u] == 0:
                    nxt.append(u)
        frontier = nxt
        t += 1
    return layer


def test_topo_dag_matches_networkx_generations(ray_session, tmp_path):
    import networkx as nx
    rng = np.random.RandomState(19)
    n = 50
    pairs = sorted({(int(a), int(b)) for a, b in
                    ((rng.randint(0, n), rng.randint(0, n))
                     for _ in range(220)) if a < b})   # a<b => acyclic
    got, _ = _run(pairs, n, tmp_path)
    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    G.add_edges_from(pairs)
    for t, gen in enumerate(nx.topological_generations(G)):
        for v in gen:
            assert got[v] == t, (v, got[v], t)
    assert min(got.values()) >= 0                      # DAG: no leftovers


def test_topo_cyclic_matches_kahn_transcription(ray_session, tmp_path):
    rng = np.random.RandomState(23)
    n, m = 40, 130
    pairs = sorted({(int(a), int(b)) for a, b in
                    zip(rng.randint(0, n, m), rng.randint(0, n, m))
                    if a != b})
    got, _ = _run(pairs, n, tmp_path)
    want = _kahn(pairs, n)
    assert got == want
    assert any(v < 0 for v in want.values()), \
        "probe graph must actually contain a cycle"


def test_topo_pure_cycle_all_tainted(ray_session, tmp_path):
    n = 6
    pairs = [(i, (i + 1) % n) for i in range(n)] + [(0, 5)]
    got, epochs = _run(pairs, n, tmp_path)
    assert all(v == -1 for v in got.values())
    assert epochs == 0                                 # nothing peelable
