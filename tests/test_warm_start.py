"""Warm-start PageRank across graph growth (runner.pagerank(warm_dir=)):
after new edges/vertices land, seeding from the previous run's per-pid
rank checkpoint must converge to the SAME fixpoint in FEWER supersteps
than the uniform cold start — the incremental-recompute story on top of
the existing checkpoint format (pid = v % P is growth-stable)."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from metis_ray.graph.partition import build_graph_dir
from metis_ray.graph.runner import GraphRunner

P = 4


def _dir(pairs, n, path):
    edges = rd.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64())}))
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.arange(n), pa.int64())}))
    return build_graph_dir(edges, verts, path, P, directed=True)


def _ranks(runner):
    t = runner.collect("rank").to_pandas().sort_values("v")
    return t["rank"].to_numpy(np.float64)


def test_warm_start_fewer_epochs_same_fixpoint(ray_session, tmp_path):
    rng = np.random.RandomState(71)
    n1, m1 = 60, 240
    pairs1 = sorted({(int(a), int(b)) for a, b in
                     zip(rng.randint(0, n1, m1), rng.randint(0, n1, m1))
                     if a != b})
    d1 = _dir(pairs1, n1, str(tmp_path) + "/g1")
    r1 = GraphRunner(d1)
    try:
        r1.pagerank(tol=1e-11)
        ray.get([s.save_checkpoint.remote(str(tmp_path) + "/warm", 0,
                                          "rank") for s in r1.shards])
    finally:
        r1.shutdown()

    # grow: 4 new vertices, a handful of new edges (same P)
    n2 = n1 + 4
    extra = [(n1, 0), (n1 + 1, 3), (5, n1 + 2), (n1 + 3, n1), (7, n1 + 1)]
    pairs2 = sorted(set(pairs1) | set(extra))
    d2 = _dir(pairs2, n2, str(tmp_path) + "/g2")

    r_cold = GraphRunner(d2)
    try:
        st_cold = r_cold.pagerank(tol=1e-11)
        ranks_cold = _ranks(r_cold)
    finally:
        r_cold.shutdown()

    r_warm = GraphRunner(d2)
    try:
        st_warm = r_warm.pagerank(tol=1e-11,
                                  warm_dir=str(tmp_path) + "/warm")
        ranks_warm = _ranks(r_warm)
    finally:
        r_warm.shutdown()

    assert np.allclose(ranks_warm, ranks_cold, atol=1e-8)
    assert st_warm.epochs < st_cold.epochs, (st_warm.epochs,
                                             st_cold.epochs)


def test_warm_start_empty_checkpoint_raises(ray_session, tmp_path):
    rng = np.random.RandomState(73)
    pairs = sorted({(int(a), int(b)) for a, b in
                    zip(rng.randint(0, 20, 60), rng.randint(0, 20, 60))
                    if a != b})
    d = _dir(pairs, 20, str(tmp_path) + "/g")
    r = GraphRunner(d)
    try:
        # missing part files leave the uniform init intact -> mass == 1,
        # run proceeds as a cold start (graceful degradation)
        st = r.pagerank(tol=1e-9, warm_dir=str(tmp_path) + "/nonexistent")
        assert st.epochs > 0
    finally:
        r.shutdown()
