"""Deterministic random walks (graph/walks.py) vs the sequential
transcription of the exact recurrence."""

import numpy as np
import pyarrow as pa


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


def test_walks_match_sequential_reference():
    from metis_ray.graph.walks import random_walks, walks_reference
    rng = np.random.RandomState(17)
    n, m = 40, 300
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    edges = _mk_edges(src, dst)
    starts = [0, 3, 7, 11, 25, 39]
    got = _got_rows(random_walks(edges, starts, length=8, seed=5))
    want = walks_reference(_adj(src, dst), starts, length=8, seed=5)
    assert got == want
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


def test_walks_seed_changes_paths():
    from metis_ray.graph.walks import random_walks
    rng = np.random.RandomState(2)
    src = rng.randint(0, 30, 250)
    dst = rng.randint(0, 30, 250)
    edges = _mk_edges(src, dst)
    a = _got_rows(random_walks(edges, [1, 2, 3], length=6, seed=1))
    b = _got_rows(random_walks(edges, [1, 2, 3], length=6, seed=2))
    assert a != b                     # different seeds, different walks
    a2 = _got_rows(random_walks(edges, [1, 2, 3], length=6, seed=1))
    assert a == a2                    # same seed, bit-identical


def test_walks_dead_end_stops():
    from metis_ray.graph.walks import random_walks
    # 1 -> 2 -> 3, 3 has no out-edges; walk from 1 must stop at step 2
    edges = _mk_edges([1, 2], [2, 3])
    got = _got_rows(random_walks(edges, [1, 3], length=10, seed=0))
    assert got == [(1, 0, 1), (1, 1, 2), (1, 2, 3), (3, 0, 3)]


def test_weighted_walks_match_reference_and_bias():
    from metis_ray.graph.walks import random_walks, walks_reference
    import ray.data as rd
    rng = np.random.RandomState(31)
    n, m = 20, 120
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    wts = rng.randint(1, 9, m).astype(np.int64)
    # dedupe (src,dst) keeping the first weight, like an edge table
    seen, keep = set(), []
    for idx, (a, b) in enumerate(zip(src, dst)):
        if (int(a), int(b)) not in seen:
            seen.add((int(a), int(b)))
            keep.append(idx)
    src, dst, wts = src[keep], dst[keep], wts[keep]
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "multiplicity": pa.array(wts, pa.int64())}))
    weights = {(int(a), int(b)): float(w)
               for a, b, w in zip(src, dst, wts)}
    starts = [0, 4, 9, 13]
    got = _got_rows(random_walks(edges, starts, length=7, seed=11,
                                 weight_col="multiplicity"))
    want = walks_reference(_adj(src, dst), starts, length=7, seed=11,
                           weights=weights)
    assert got == want
    # statistical bias check: 40 independent walkers (the hash mixes the
    # walk id) each face a 2-neighbor choice weighted (1, 9); the heavy
    # neighbor must win ~90% of the time
    trials = 40
    hubs = np.arange(trials, dtype=np.int64)
    hub = rd.from_arrow(pa.table({
        "src": pa.array(np.repeat(hubs, 2), pa.int64()),
        "dst": pa.array(np.tile([1000, 2000], trials), pa.int64()),
        "multiplicity": pa.array(np.tile([1, 9], trials), pa.int64())}))
    rows = _got_rows(random_walks(hub, hubs.tolist(), length=1, seed=7,
                                  weight_col="multiplicity"))
    heavy = sum(1 for (_, st, v) in rows if st == 1 and v == 2000)
    assert heavy >= 30                      # E[heavy] = 36, σ ≈ 1.9


def test_weighted_walks_require_directed():
    from metis_ray.graph.walks import random_walks
    import pytest as _pytest
    edges = _mk_edges([1], [2])
    with _pytest.raises(ValueError):
        random_walks(edges, [1], directed=False, weight_col="w")


def test_walks_undirected_reference():
    from metis_ray.graph.walks import random_walks, walks_reference
    rng = np.random.RandomState(8)
    src = rng.randint(0, 25, 120)
    dst = rng.randint(0, 25, 120)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = _mk_edges(src, dst)
    got = _got_rows(random_walks(edges, [0, 5, 9], length=5, seed=3,
                                 directed=False))
    want = walks_reference(_adj(src, dst, directed=False), [0, 5, 9],
                           length=5, seed=3)
    assert got == want


def test_weighted_walks_duplicate_edges_sum():
    """Duplicate (src, dst) rows act additively: the race must see
    sum(w), not max(w) — a raw (non-pre-aggregated) edge list with rows
    (s,d,1) and (s,d,5) competes with weight 6."""
    import ray.data as rd
    from metis_ray.graph.walks import random_walks, walks_reference
    rng = np.random.RandomState(23)
    n, m = 15, 90
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    wts = rng.randint(1, 6, m).astype(np.int64)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "multiplicity": pa.array(wts, pa.int64())}))
    summed = {}
    for a, b, w in zip(src, dst, wts):
        summed[(int(a), int(b))] = summed.get((int(a), int(b)), 0.0) + float(w)
    starts = [0, 3, 8]
    got = _got_rows(random_walks(edges, starts, length=6, seed=4,
                                 weight_col="multiplicity"))
    want = walks_reference(_adj(src, dst), starts, length=6, seed=4,
                           weights=summed)
    assert got == want


def test_weighted_walks_reject_nonpositive():
    """A zero weight would make its edge silently unreachable (inf race
    key) and a negative one would always win — both must raise."""
    import ray.data as rd
    import pytest as _pytest
    from metis_ray.graph.walks import random_walks
    for bad in (0, -2):
        edges = rd.from_arrow(pa.table({
            "src": pa.array([1, 1], pa.int64()),
            "dst": pa.array([2, 3], pa.int64()),
            "w": pa.array([1, bad], pa.int64())}))
        with _pytest.raises(Exception, match="positive and finite"):
            random_walks(edges, [1], length=1, weight_col="w").materialize()
