"""Per-community conductance (graph/community.py) vs NetworkX
nx.conductance and the sequential transcription."""

import numpy as np
import pyarrow as pa
import pytest


def _mk_edges(src, dst):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64), pa.int64()),
        "dst": pa.array(np.asarray(dst, np.int64), pa.int64())}))


def _mk_labels(label_of):
    import ray.data as rd
    ks = sorted(label_of)
    return rd.from_arrow(pa.table({
        "v": pa.array(np.asarray(ks, np.int64), pa.int64()),
        "label": pa.array(np.asarray([label_of[k] for k in ks], np.int64),
                          pa.int64())}))


def _rows(t: pa.Table):
    d = t.to_pydict()
    return list(zip(d["label"], d["cut_edges"], d["volume"],
                    [None if x is None else round(x, 6)
                     for x in d["conductance"]]))


def test_conductance_matches_networkx_and_reference():
    import networkx as nx
    from metis_ray.graph.community import conductance, conductance_reference
    rng = np.random.RandomState(11)
    n, m = 60, 400
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)          # multigraph with self-loops
    label_of = {v: int(rng.randint(0, 5)) for v in range(n)}
    got = _rows(conductance(_mk_edges(src, dst), _mk_labels(label_of)))
    want = conductance_reference(src, dst, label_of)
    assert got == want

    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from((int(a), int(b)) for a, b in zip(src, dst) if a != b)
    by_label = {}
    for v, lbl in label_of.items():
        by_label.setdefault(lbl, set()).add(v)
    for lbl, cut, vol, phi in got:
        s = by_label[lbl]
        t = set(range(n)) - s
        assert cut == nx.cut_size(g, s, t)
        assert vol == nx.volume(g, s)
        if phi is not None:
            assert phi == pytest.approx(nx.conductance(g, s, t), abs=1e-6)


def test_conductance_planted_communities():
    """Two 8-cliques joined by a single bridge: each community's
    conductance is 1 / (2*C(8,2) + 1) = 1/57; a random even split of the
    same graph scores far worse."""
    from metis_ray.graph.community import conductance
    src, dst = [], []
    for base in (0, 100):
        for i in range(8):
            for j in range(i + 1, 8):
                src.append(base + i)
                dst.append(base + j)
    src.append(0)
    dst.append(100)                      # the bridge
    labels = {v: 0 for v in range(8)} | {100 + v: 1 for v in range(8)}
    got = _rows(conductance(_mk_edges(src, dst), _mk_labels(labels)))
    assert got == [(0, 1, 57, round(1 / 57, 6)),
                   (1, 1, 57, round(1 / 57, 6))]


def test_conductance_edge_free_community_is_null():
    from metis_ray.graph.community import conductance
    # vertex 9 is isolated (volume 0) in its own community: NULL row;
    # the 1-2 edge community is the WHOLE graph (den = 2m - vol = 0): NULL
    got = _rows(conductance(_mk_edges([1], [2]),
                            _mk_labels({1: 7, 2: 7, 9: 8})))
    assert got == [(7, 0, 2, None), (8, 0, 0, None)]


def test_conductance_rejects_bad_partitions():
    import ray.data as rd
    from metis_ray.graph.community import conductance
    edges = _mk_edges([1, 2], [2, 3])
    dup = rd.from_arrow(pa.table({
        "v": pa.array([1, 1, 2, 3], pa.int64()),
        "label": pa.array([0, 1, 0, 0], pa.int64())}))
    with pytest.raises(ValueError, match="duplicate vertex"):
        conductance(edges, dup)
    missing = _mk_labels({1: 0, 2: 0})   # vertex 3 unlabeled
    with pytest.raises(ValueError, match="not a partition"):
        conductance(edges, missing)


def test_conductance_empty_inputs():
    import ray.data as rd
    from metis_ray.graph.community import conductance
    empty_lab = rd.from_arrow(pa.table({
        "v": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}))
    t = conductance(_mk_edges([], []), empty_lab)
    assert t.num_rows == 0
    # labels over an edgeless graph: every community volume 0 -> NULL
    t = conductance(_mk_edges([], []), _mk_labels({1: 0, 2: 1}))
    assert _rows(t) == [(0, 0, 0, None), (1, 0, 0, None)]
