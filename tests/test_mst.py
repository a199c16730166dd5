"""Boruvka minimum spanning forest (graph/mst.py) vs NetworkX and the
sequential Kruskal reference under the same total edge order."""

import numpy as np
import pyarrow as pa
import pytest


def _mk_edges(rows):
    import ray.data as rd
    s, d, w = (list(c) for c in zip(*rows)) if rows else ([], [], [])
    return rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(s, np.int64), pa.int64()),
        "dst": pa.array(np.asarray(d, np.int64), pa.int64()),
        "w": pa.array(np.asarray(w, np.float64), pa.float64())}))


def _mk_verts(ids):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.asarray(sorted(ids), np.int64),
                              pa.int64())}))


def _forest_rows(ds):
    df = ds.to_pandas()
    if df.empty:                       # empty Ray datasets drop columns
        return []
    df = df.sort_values(["src", "dst"]).reset_index(drop=True)
    return [(int(r.src), int(r.dst), float(r.weight))
            for r in df.itertuples()]


def _run(rows, ids, **kw):
    from metis_ray.graph.mst import minimum_spanning_forest
    forest, labels, rounds = minimum_spanning_forest(
        _mk_edges(rows), _mk_verts(ids), weight_col="w", **kw)
    return _forest_rows(forest), labels.to_pandas(), rounds


def test_mst_unique_weights_matches_networkx():
    import networkx as nx
    rng = np.random.RandomState(7)
    n = 80
    rows = []
    seen = set()
    for _ in range(300):
        a, b = int(rng.randint(0, n)), int(rng.randint(0, n))
        if a == b:
            continue
        w = float(rng.rand())          # unique with prob 1
        rows.append((a, b, w))
        seen.add((min(a, b), max(a, b)))
    got, labels, rounds = _run(rows, range(n))

    G = nx.Graph()
    G.add_nodes_from(range(n))
    for a, b, w in rows:
        k = (min(a, b), max(a, b))
        if not G.has_edge(*k) or G[k[0]][k[1]]["weight"] > w:
            G.add_edge(*k, weight=w)
    want = sorted((min(a, b), max(a, b), float(d["weight"]))
                  for a, b, d in nx.minimum_spanning_edges(G, data=True))
    assert got == want
    assert rounds <= int(np.ceil(np.log2(n))) + 1


def test_mst_ties_match_kruskal_reference():
    from metis_ray.graph.mst import mst_reference
    rng = np.random.RandomState(21)
    n = 50
    rows = [(int(rng.randint(0, n)), int(rng.randint(0, n)),
             float(rng.randint(1, 4)))          # heavy ties + self-loops
            for _ in range(400)]
    got, _, _ = _run(rows, range(n))
    assert got == mst_reference(rows, list(range(n)))


def test_mst_labels_are_the_connected_components():
    import networkx as nx
    rng = np.random.RandomState(3)
    # two far-apart blocks + isolated vertices 100..104
    rows = [(int(rng.randint(0, 20)), int(rng.randint(0, 20)), 1.0)
            for _ in range(60)]
    rows += [(int(rng.randint(40, 55)), int(rng.randint(40, 55)), 2.0)
             for _ in range(40)]
    ids = list(range(20)) + list(range(40, 55)) + list(range(100, 105))
    forest, labels, _ = _run(rows, ids)

    G = nx.Graph()
    G.add_nodes_from(ids)
    G.add_edges_from((a, b) for a, b, _ in rows if a != b)
    want = {frozenset(c) for c in nx.connected_components(G)}
    lab = labels.groupby("label")["v"].apply(
        lambda s: frozenset(int(x) for x in s))
    assert set(lab) == want
    # forest size = n - #components; per-component edges span exactly it
    assert len(forest) == len(ids) - len(want)


def test_mst_parallel_edges_keep_min_and_self_loops_drop():
    got, _, _ = _run([(1, 2, 5.0), (2, 1, 3.0), (1, 2, 9.0),
                      (3, 3, 0.1), (2, 3, 1.0)], [1, 2, 3])
    assert got == [(1, 2, 3.0), (2, 3, 1.0)]


def test_mst_empty_and_edgeless():
    got, labels, rounds = _run([], [4, 7, 9])
    assert got == [] and rounds == 0
    assert sorted(labels["v"]) == [4, 7, 9]
    assert (labels["v"] == labels["label"]).all()


def test_mst_two_vertex_mutual_pick():
    # the pure 2-cycle case: both components pick the same edge
    got, labels, rounds = _run([(10, 20, 1.5)], [10, 20])
    assert got == [(10, 20, 1.5)]
    assert rounds == 1
    assert set(labels["label"]) == {10}
