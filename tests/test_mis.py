"""Maximal independent set (dataset_engine.mis_dataset) vs exact oracles.

With FIXED unique priorities the Luby local-minima fixpoint computes
exactly the sequential greedy MIS in priority order, so the oracle is
exact equality against a 10-line transcription — plus the two defining
graph invariants (independence, maximality) asserted directly.
"""

import hashlib

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


def _adj(src, dst, n):
    """Simple undirected adjacency, self-loops dropped (the documented
    mis_dataset graph view)."""
    adj = {v: set() for v in range(n)}
    for a, b in zip(src, dst):
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    return adj


def _prio(vid, seed):
    dig = np.fromiter(
        (int.from_bytes(hashlib.blake2b(
            b"%d:%d" % (seed, v), digest_size=8).digest(), "big")
         for v in vid), dtype=np.uint64, count=len(vid))
    prio = np.empty(len(vid), dtype=np.int64)
    prio[np.lexsort((vid, dig))] = np.arange(len(vid), dtype=np.int64)
    return prio


def _rand(n, m, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, n, m), rng.randint(0, n, m)


@pytest.mark.parametrize("seed,n,m", [(0, 60, 300), (1, 60, 300),
                                      (7, 200, 150), (3, 50, 1200)])
def test_mis_matches_sequential_greedy(ray_session, seed, n, m):
    """Exact equality vs the greedy transcription — sparse, dense, and
    mostly-isolated graphs, with duplicate edges and self-loops."""
    from metis_ray.graph.dataset_engine import mis_dataset, mis_reference

    src, dst = _rand(n, m, seed + 100)
    edges, verts = _mk(src, dst, n)
    got, epochs = mis_dataset(edges, verts, seed=seed)
    df = got.to_pandas().sort_values("v").reset_index(drop=True)

    vid = np.arange(n, dtype=np.int64)
    want = mis_reference(_adj(src, dst, n), vid, _prio(vid, seed))
    assert epochs >= 1
    assert df["v"].to_numpy().tolist() == vid.tolist()
    assert df["in_mis"].to_numpy().tolist() == want.tolist()


def test_mis_invariants(ray_session):
    """Independence: no edge inside the set. Maximality: every outside
    vertex has an in-set neighbor. Isolated + self-loop-only vertices are
    always selected."""
    from metis_ray.graph.dataset_engine import mis_dataset

    n, m = 120, 600
    src, dst = _rand(n, m, 42)
    # plant: vertex 100 isolated (never an endpoint), 101 self-loop only
    keep = (src < 100) & (dst < 100)
    src, dst = np.append(src[keep], 101), np.append(dst[keep], 101)
    edges, verts = _mk(src, dst, n)
    got = mis_dataset(edges, verts, seed=5)[0].to_pandas()
    sel = set(got[got["in_mis"]]["v"].tolist())
    adj = _adj(src, dst, n)
    for a in sel:
        assert not (adj[a] & sel), f"edge inside MIS at {a}"
    for v in range(n):
        if v not in sel:
            assert adj[v] & sel, f"non-member {v} has no MIS neighbor"
    assert 100 in sel and 101 in sel


def test_mis_deterministic_and_seed_sensitive(ray_session):
    from metis_ray.graph.dataset_engine import mis_dataset

    src, dst = _rand(80, 400, 9)
    edges, verts = _mk(src, dst, 80)
    a = mis_dataset(edges, verts, seed=2)[0].to_pandas().sort_values("v")
    b = mis_dataset(edges, verts, seed=2)[0].to_pandas().sort_values("v")
    assert a["in_mis"].tolist() == b["in_mis"].tolist()


def test_mis_empty_graph(ray_session):
    from metis_ray.graph.dataset_engine import mis_dataset

    edges, verts = _mk([], [], 0)
    got, epochs = mis_dataset(edges, verts)
    assert epochs == 0 and got.count() == 0
