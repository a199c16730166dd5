"""Betweenness centrality (graph/betweenness.py) vs NetworkX."""

import numpy as np
import pyarrow as pa
import pytest

nx = pytest.importorskip("networkx")


def _mk(src, dst, n):
    import ray.data as rd
    edges = rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64), pa.int64()),
        "dst": pa.array(np.asarray(dst, np.int64), pa.int64())}))
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.arange(n, dtype=np.int64), pa.int64())}))
    return edges, verts


def _got(ds):
    df = ds.to_pandas().sort_values("v")
    return df["betweenness"].to_numpy()


def test_betweenness_directed_exact():
    from metis_ray.graph.betweenness import betweenness_dataset
    rng = np.random.RandomState(6)
    n, m = 40, 180
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    edges, verts = _mk(src, dst, n)
    got_ds, epochs = betweenness_dataset(edges, verts)   # all sources
    got = _got(got_ds)
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = nx.betweenness_centrality(g, normalized=False)
    assert np.allclose(got, [want[v] for v in range(n)], atol=1e-8)
    assert epochs >= 2


def test_betweenness_undirected_exact():
    from metis_ray.graph.betweenness import betweenness_dataset
    rng = np.random.RandomState(13)
    n, m = 30, 90
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges, verts = _mk(src, dst, n)
    got = _got(betweenness_dataset(edges, verts, directed=False)[0])
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    want = nx.betweenness_centrality(g, normalized=False)
    assert np.allclose(got, [want[v] for v in range(n)], atol=1e-8)


def test_betweenness_source_subsets_sum_to_exact():
    """The k-source approximation is exact in expectation and EXACTLY
    decomposable: per-source dependency sums over a partition of the
    source set must add up to the all-sources value."""
    from metis_ray.graph.betweenness import betweenness_dataset
    rng = np.random.RandomState(21)
    n, m = 24, 100
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    edges, verts = _mk(src, dst, n)
    full = _got(betweenness_dataset(edges, verts)[0])
    h1 = _got(betweenness_dataset(edges, verts,
                                  sources=list(range(0, n, 2)))[0])
    h2 = _got(betweenness_dataset(edges, verts,
                                  sources=list(range(1, n, 2)))[0])
    assert np.allclose(full, h1 + h2, atol=1e-8)


def test_betweenness_path_graph():
    from metis_ray.graph.betweenness import betweenness_dataset
    # 0 -> 1 -> 2 -> 3: BC(1) = |{(0,2),(0,3)}| = 2, BC(2) = 2
    edges, verts = _mk([0, 1, 2], [1, 2, 3], 4)
    got = _got(betweenness_dataset(edges, verts)[0])
    assert got.tolist() == [0.0, 2.0, 2.0, 0.0]


def test_betweenness_unknown_source_raises():
    from metis_ray.graph.betweenness import betweenness_dataset
    edges, verts = _mk([0, 1], [1, 2], 3)
    with pytest.raises(ValueError):
        betweenness_dataset(edges, verts, sources=[99])
