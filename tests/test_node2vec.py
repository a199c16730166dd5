"""node2vec-biased walks (graph/node2vec.py) vs the sequential
transcription of the exact second-order recurrence, plus statistical
bias checks for the p/q semantics."""

import numpy as np
import pyarrow as pa
import pytest


def _mk_edges(src, dst):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64), pa.int64()),
        "dst": pa.array(np.asarray(dst, np.int64), pa.int64())}))


def _adj(src, dst, directed=True):
    adj = {}
    for a, b in zip(src, dst):
        adj.setdefault(int(a), set()).add(int(b))
        if not directed:
            adj.setdefault(int(b), set()).add(int(a))
    return adj


def _got_rows(ds):
    df = ds.to_pandas()
    return sorted(zip(df["walk_id"].astype(int), df["step"].astype(int),
                      df["v"].astype(int)))


def test_node2vec_matches_sequential_reference():
    from metis_ray.graph.node2vec import node2vec_reference, node2vec_walks
    rng = np.random.RandomState(19)
    n, m = 40, 300
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    edges = _mk_edges(src, dst)
    starts = [0, 3, 7, 11, 25, 39]
    for p, q in [(1.0, 1.0), (0.25, 4.0), (4.0, 0.25)]:
        got = _got_rows(node2vec_walks(edges, starts, length=8,
                                       p=p, q=q, seed=5))
        want = node2vec_reference(_adj(src, dst), starts, length=8,
                                  p=p, q=q, seed=5)
        assert got == want, (p, q)
    # every consecutive hop is a real directed edge
    e = set(zip(src.tolist(), dst.tolist()))
    byw = {}
    for w, s, v in got:
        byw.setdefault(w, []).append((s, v))
    for w, path in byw.items():
        path.sort()
        assert path[0] == (0, w)
        for (s0, a), (s1, b) in zip(path, path[1:]):
            assert s1 == s0 + 1 and (a, b) in e


def test_node2vec_undirected_reference():
    from metis_ray.graph.node2vec import node2vec_reference, node2vec_walks
    rng = np.random.RandomState(6)
    src = rng.randint(0, 25, 150)
    dst = rng.randint(0, 25, 150)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = _mk_edges(src, dst)
    got = _got_rows(node2vec_walks(edges, [0, 5, 9], length=6, seed=3,
                                   p=0.5, q=2.0, directed=False))
    want = node2vec_reference(_adj(src, dst, directed=False), [0, 5, 9],
                              length=6, p=0.5, q=2.0, seed=3)
    assert got == want


def test_node2vec_return_bias():
    """p << 1 makes the return edge overwhelmingly likely: on a cycle of
    bidirectional edges, step 2 should come back to the start almost
    always (alpha_return = 1/p = 1000 vs alpha_forward in {1, 1/q}).
    40 independent walkers (the hash mixes walk_id); each has exactly a
    2-way choice at step 2."""
    from metis_ray.graph.node2vec import node2vec_walks
    # star of independent 3-chains a <-> b <-> c: at b, choice = {back
    # to a, on to c}, with a NOT a neighbor of c (so alpha_c = 1/q = 1)
    trials = 40
    src, dst = [], []
    for t in range(trials):
        a, b, c = 10_000 + 3 * t, 10_001 + 3 * t, 10_002 + 3 * t
        src += [a, b, b, c]
        dst += [b, a, c, b]
    edges = _mk_edges(src, dst)
    starts = [10_000 + 3 * t for t in range(trials)]
    rows = _got_rows(node2vec_walks(edges, starts, length=2, seed=9,
                                    p=0.001, q=1.0))
    returned = sum(1 for (w, s, v) in rows if s == 2 and v == w)
    assert returned >= 37          # P(return) ≈ 1000/1001 per walker
    rows = _got_rows(node2vec_walks(edges, starts, length=2, seed=9,
                                    p=1000.0, q=1.0))
    returned = sum(1 for (w, s, v) in rows if s == 2 and v == w)
    assert returned <= 3           # P(return) ≈ 1/1001 per walker


def test_node2vec_local_vs_explore_bias():
    """q >> 1 keeps the walk inside the previous vertex's neighborhood
    (triangle-closing), q << 1 pushes it outward. Structure per walker:
    s -> {a, c}; a -> {c, d}; s -> c closes the triangle, so at a (prev =
    s) the candidates are c (local, alpha = 1) and d (outside, alpha =
    1/q). Step 1 from s is a fair coin between a and c — condition on
    the ~half of 60 walkers that went to a."""
    from metis_ray.graph.node2vec import node2vec_walks
    trials = 60
    src, dst = [], []
    for t in range(trials):
        s, a, c, d = (20_000 + 4 * t, 20_001 + 4 * t, 20_002 + 4 * t,
                      20_003 + 4 * t)
        src += [s, s, a, a]
        dst += [a, c, c, d]
    edges = _mk_edges(src, dst)
    starts = [20_000 + 4 * t for t in range(trials)]

    def split(rows):
        at_a = {w for (w, st, v) in rows if st == 1 and v == w + 1}
        end = {w: v for (w, st, v) in rows if st == 2 and w in at_a}
        return at_a, end

    rows = _got_rows(node2vec_walks(edges, starts, length=2, seed=13,
                                    p=1000.0, q=100.0))
    at_a, end = split(rows)
    assert len(at_a) >= 15                     # fair coin over 60 walkers
    local = sum(1 for w, v in end.items() if v == w + 2)   # c = s + 2
    assert local >= len(at_a) - 1              # alpha: c=1 vs d=0.01
    rows = _got_rows(node2vec_walks(edges, starts, length=2, seed=13,
                                    p=1000.0, q=0.01))
    at_a, end = split(rows)
    assert len(at_a) >= 15
    outward = sum(1 for w, v in end.items() if v == w + 3)  # d = s + 3
    assert outward >= len(at_a) - 1            # alpha: d=100 vs c=1


def test_node2vec_dead_end_stops_and_seed_determinism():
    from metis_ray.graph.node2vec import node2vec_walks
    edges = _mk_edges([1, 2], [2, 3])
    got = _got_rows(node2vec_walks(edges, [1, 3], length=10, seed=0,
                                   p=0.5, q=2.0))
    assert got == [(1, 0, 1), (1, 1, 2), (1, 2, 3), (3, 0, 3)]
    rng = np.random.RandomState(4)
    src = rng.randint(0, 30, 250)
    dst = rng.randint(0, 30, 250)
    edges = _mk_edges(src, dst)
    a = _got_rows(node2vec_walks(edges, [1, 2, 3], length=6, seed=1,
                                 p=0.25, q=2.0))
    b = _got_rows(node2vec_walks(edges, [1, 2, 3], length=6, seed=2,
                                 p=0.25, q=2.0))
    assert a != b
    a2 = _got_rows(node2vec_walks(edges, [1, 2, 3], length=6, seed=1,
                                  p=0.25, q=2.0))
    assert a == a2


def test_node2vec_rejects_bad_pq():
    from metis_ray.graph.node2vec import node2vec_walks
    edges = _mk_edges([1], [2])
    for p, q in [(0.0, 1.0), (1.0, -1.0), (float("inf"), 1.0),
                 (1.0, float("nan"))]:
        with pytest.raises(ValueError, match="positive and finite"):
            node2vec_walks(edges, [1], p=p, q=q)
