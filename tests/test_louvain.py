"""Louvain phase-1 (graph/louvain.py): planted-partition recovery, exact
equality with the documented sequential transcription, and the isolated /
empty-graph degenerate cases."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _run(pairs_w: dict, n: int, **kw):
    from metis_ray.graph.louvain import louvain_dataset
    keys = sorted(pairs_w)
    edges = rd.from_arrow(pa.table({
        "src": pa.array([k[0] for k in keys], pa.int64()),
        "dst": pa.array([k[1] for k in keys], pa.int64()),
        "multiplicity": pa.array([pairs_w[k] for k in keys], pa.int64())}))
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.arange(n), pa.int64())}))
    out, rounds = louvain_dataset(edges, verts, **kw)
    return ({int(r.v): int(r.comm) for r in out.to_pandas().itertuples()},
            rounds)


def test_louvain_recovers_planted_cliques(ray_session):
    from metis_ray.graph.louvain import louvain_reference
    # two 6-cliques joined by one bridge, plus an isolated vertex
    pairs = {}
    for base in (0, 6):
        for i in range(base, base + 6):
            for j in range(i + 1, base + 6):
                pairs[(i, j)] = 1
    pairs[(5, 6)] = 1
    got, _ = _run(pairs, 13)
    want = louvain_reference(pairs, range(12))
    assert got == {**want, 12: 12}
    c0 = {got[v] for v in range(6)}
    c1 = {got[v] for v in range(6, 12)}
    assert len(c0) == 1 and len(c1) == 1 and c0 != c1
    assert got[12] == 12                       # isolated stays singleton


def test_louvain_matches_transcription_random(ray_session):
    from metis_ray.graph.louvain import louvain_reference
    rng = np.random.RandomState(37)
    n, m = 40, 120
    pw: dict = {}
    for a, b in zip(rng.randint(0, n, m), rng.randint(0, n, m)):
        if a != b:
            k = (min(int(a), int(b)), max(int(a), int(b)))
            pw[k] = pw.get(k, 0) + int(rng.randint(1, 4))
    got, _ = _run(pw, n)
    want = louvain_reference(pw, range(n))
    assert got == want


def test_louvain_empty_graph_all_singletons(ray_session):
    got, rounds = _run({}, 5)
    assert got == {v: v for v in range(5)}
    assert rounds == 0
