"""Double-sweep diameter lower bound (graph/algos.py) vs the sequential
transcription and NetworkX exact diameter on structured graphs."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from metis_ray.graph.partition import build_graph_dir

P = 4


def _dir(src, dst, ids, tmp):
    edges = rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64), pa.int64()),
        "dst": pa.array(np.asarray(dst, np.int64), pa.int64())}))
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.asarray(sorted(ids), np.int64),
                              pa.int64())}))
    return build_graph_dir(edges, verts, str(tmp) + "/g", P,
                           directed=False)


def _adj(src, dst):
    adj = {}
    for a, b in zip(src, dst):
        adj.setdefault(int(a), set()).add(int(b))
    return adj


def _run(src, dst, ids, tmp):
    from metis_ray.graph.algos import double_sweep_diameter
    from metis_ray.graph.runner import GraphRunner
    runner = GraphRunner(_dir(src, dst, ids, tmp))
    try:
        return double_sweep_diameter(runner)
    finally:
        runner.shutdown()


def test_double_sweep_matches_reference_random(ray_session, tmp_path):
    from metis_ray.graph.algos import diameter_reference
    rng = np.random.RandomState(13)
    n, m = 50, 120
    src, dst = rng.randint(0, n, m), rng.randint(0, n, m)
    got = _run(src, dst, range(n), tmp_path)
    want = diameter_reference(_adj(src, dst), range(n))
    assert {k: got[k] for k in want} == want


def test_double_sweep_exact_on_path_and_star(ray_session, tmp_path):
    import networkx as nx
    from metis_ray.graph.algos import diameter_reference
    # path 0-1-...-9: double sweep from an endpoint is EXACT (9)
    src, dst = list(range(9)), list(range(1, 10))
    got = _run(src, dst, range(10), tmp_path / "p")
    G = nx.path_graph(10)
    assert got["diameter_lb"] == nx.diameter(G) == 9
    assert got == {**got,
                   **diameter_reference(_adj(src, dst), range(10))}
    # star: diameter 2, found from any leaf
    src = [0] * 6
    dst = list(range(1, 7))
    got = _run(src, dst, range(7), tmp_path / "s")
    assert got["diameter_lb"] == 2
    # isolated start vertex (id -? smallest id isolated): bound 0
    got = _run([5, 6], [6, 7], [1, 5, 6, 7], tmp_path / "i")
    assert got["diameter_lb"] == 0 and got["start"] == 1
