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


def test_louvain_two_level_merges_hierarchy(ray_session):
    """Hierarchical plant: 4 cliques of 5; cliques (0,1) and (2,3) are
    bridged by 5 weight-2 edges each, the two super-groups by one weak
    edge. Level 1 alone leaves 10 communities on this graph; level 2
    must collapse each bridged pair — final partition = exactly the two
    super-groups (verified against the transcription too)."""
    from metis_ray.graph.louvain import louvain_reference
    pairs = {}
    members = [list(range(b, b + 5)) for b in (0, 5, 10, 15)]
    for mem in members:
        for i in mem:
            for j in mem:
                if i < j:
                    pairs[(i, j)] = 1
    for a, b in ((0, 5), (1, 6), (2, 7), (3, 8), (4, 9)):
        pairs[(a, b)] = 2                          # bridge cliques 0-1
    for a, b in ((10, 15), (11, 16), (12, 17), (13, 18), (14, 19)):
        pairs[(a, b)] = 2                          # bridge cliques 2-3
    pairs[(4, 19)] = 1                             # weak super-group link
    assert len(set(louvain_reference(pairs, range(20),
                                     levels=1).values())) > 2
    got, _ = _run(pairs, 20, levels=2)
    want = louvain_reference(pairs, range(20), levels=2)
    assert got == want
    g01 = {got[v] for v in range(10)}
    g23 = {got[v] for v in range(10, 20)}
    assert len(g01) == 1 and len(g23) == 1 and g01 != g23


def test_louvain_two_level_matches_transcription_random(ray_session):
    from metis_ray.graph.louvain import louvain_reference
    rng = np.random.RandomState(43)
    n, m = 35, 100
    pw: dict = {}
    for a, b in zip(rng.randint(0, n, m), rng.randint(0, n, m)):
        if a != b:
            k = (min(int(a), int(b)), max(int(a), int(b)))
            pw[k] = pw.get(k, 0) + int(rng.randint(1, 4))
    got, _ = _run(pw, n, levels=2)
    want = louvain_reference(pw, range(n), levels=2)
    assert got == want


def test_louvain_improves_modularity_over_singletons():
    """Pure-reference check (no Ray): on a planted graph the Louvain
    partition's Newman modularity beats both the all-singleton baseline
    and a random-ish one-community partition."""
    from metis_ray.graph.louvain import louvain_reference
    rng = np.random.RandomState(47)
    pairs = {}
    for base in (0, 6, 12):
        for i in range(base, base + 6):
            for j in range(i + 1, base + 6):
                pairs[(i, j)] = 1
    pairs[(5, 6)] = 1
    pairs[(11, 12)] = 1
    comm = louvain_reference(pairs, range(18), levels=2)

    def q(part):
        m = len(pairs)
        sw = sum(1 for (a, b) in pairs if part[a] == part[b])
        deg: dict = {}
        for a, b in pairs:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        dc: dict = {}
        for v, d in deg.items():
            dc[part[v]] = dc.get(part[v], 0) + d
        return sw / m - sum(d * d for d in dc.values()) / (4.0 * m * m)

    q_louvain = q(comm)
    q_single = q({v: v for v in range(18)})
    q_one = q({v: 0 for v in range(18)})
    assert q_louvain > 0.5
    assert q_louvain > q_single and q_louvain > q_one
