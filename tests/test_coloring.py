"""Jones-Plassmann greedy coloring (graph/algos.py::coloring_shard) vs the
sequential greedy-by-priority reference and NetworkX greedy_color driven by
the same order."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from metis_ray.graph.partition import build_graph_dir

P = 4


def _edges_ds(src, dst) -> rd.Dataset:
    return rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64), pa.int64()),
        "dst": pa.array(np.asarray(dst, np.int64), pa.int64())}))


def _verts_ds(ids) -> rd.Dataset:
    return rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.asarray(sorted(ids), np.int64),
                              pa.int64())}))


def _adj(src, dst):
    adj = {}
    for a, b in zip(src, dst):
        adj.setdefault(int(a), set()).add(int(b))
    return adj


def _run(src, dst, ids, tmp, seed=0):
    from metis_ray.graph.algos import coloring_shard
    from metis_ray.graph.runner import GraphRunner
    d = build_graph_dir(_edges_ds(src, dst), _verts_ds(ids),
                        str(tmp) + "/g", P, directed=False)
    runner = GraphRunner(d)
    try:
        out, epochs = coloring_shard(runner, seed=seed)
    finally:
        runner.shutdown()
    df = out.to_pandas().sort_values("v").reset_index(drop=True)
    return [(int(r.v), int(r.color)) for r in df.itertuples()], epochs


def test_coloring_matches_reference_and_networkx(ray_session, tmp_path):
    import networkx as nx
    from metis_ray.graph.algos import coloring_reference
    rng = np.random.RandomState(31)
    n, m = 60, 300
    src = rng.randint(0, n, m)          # multigraph incl. self-loops
    dst = rng.randint(0, n, m)
    got, epochs = _run(src, dst, range(n), tmp_path)
    want = coloring_reference(_adj(src, dst), range(n), seed=0)
    assert got == want

    # independent oracle: NetworkX greedy_color fed the identical order
    # assigns the identical colors (self-loops removed — nx would raise)
    import hashlib
    G = nx.Graph()
    G.add_nodes_from(range(n))
    G.add_edges_from((a, b) for a, b in zip(src, dst) if a != b)
    order = sorted(G.nodes, key=lambda v: (int.from_bytes(
        hashlib.blake2b(b"0:%d" % v, digest_size=8).digest(), "big"), v))
    nx_col = nx.greedy_color(G, strategy=lambda g, colors: order)
    assert dict(got) == {int(v): int(c) for v, c in nx_col.items()}

    # proper coloring invariant + superstep bound sanity
    col = dict(got)
    assert all(col[int(a)] != col[int(b)]
               for a, b in zip(src, dst) if a != b)
    assert epochs < 2 * n


def test_coloring_structured_cases(ray_session, tmp_path):
    from metis_ray.graph.algos import coloring_reference
    # clique K6 needs 6 colors; path + isolated vertices stay small
    src, dst = [], []
    for a in range(6):
        for b in range(a + 1, 6):
            src.append(a)
            dst.append(b)
    src += [10, 11, 12]
    dst += [11, 12, 13]
    ids = list(range(6)) + list(range(10, 14)) + [99]
    got, _ = _run(src, dst, ids, tmp_path, seed=7)
    assert got == coloring_reference(_adj(src, dst), ids, seed=7)
    col = dict(got)
    assert sorted(col[v] for v in range(6)) == [0, 1, 2, 3, 4, 5]
    assert col[99] == 0
    assert max(col[v] for v in range(10, 14)) <= 1


def test_run_table_algorithm_registry(ray_session, tmp_path):
    """The extension-surface registry resolves and runs a tail algorithm
    end-to-end on a graph dir."""
    from metis_ray.graph import _table_algorithms, run_table_algorithm
    src, dst = [0, 1, 2], [1, 2, 3]
    d = build_graph_dir(_edges_ds(src, dst), _verts_ds(range(4)),
                        str(tmp_path) + "/g", P, directed=False)
    out, epochs = run_table_algorithm("coloring", d, seed=0)
    assert out.num_rows == 4 and epochs > 0
    res = run_table_algorithm("diameter", d)
    assert res["diameter_lb"] == 3
    assert sorted(_table_algorithms()) == sorted([
        "hits", "bfs", "kcore", "scc", "mis", "hyperball", "betweenness",
        "edge_betweenness", "sssp", "eigenvector", "katz", "coloring",
        "harmonic", "closeness", "topo", "diameter"])
    with pytest.raises(KeyError):
        run_table_algorithm("nope", d)
