"""Graph algorithms vs independent oracles (SURVEY.md section 5.2):

- PageRank vs networkx.pagerank, allclose 1e-6 (alpha 0.85, tol 1e-9)
- connected components vs networkx, EXACT (component id = min vertex id)
- label propagation vs a pure-python implementation of the documented
  deterministic semantics, EXACT at fixpoint
- triangle counts vs networkx.triangles, EXACT per vertex + global
- checkpoint / resume: interrupted run resumes to identical answers;
  re-run of a completed job leaves answers unchanged
"""

import os
from collections import Counter, defaultdict

import networkx as nx
import numpy as np
import pyarrow.parquet as pq
import pytest

import ray

from metis_ray.graph.partition import build_graph_dir
from metis_ray.graph.runner import GraphRunner
from metis_ray.graph.triangles import total_triangles, triangle_counts
from metis_ray.pipelines.linkgraph import graph_vertices, ingest

P = 4
ALPHA, TOL = 0.85, 1e-9


@pytest.fixture(scope="module")
def golden(tiny_corpus_dir):
    edges = pq.read_table(os.path.join(tiny_corpus_dir, "golden_edges_file.parquet"))
    pairs = list(zip(edges["src"].to_pylist(), edges["dst"].to_pylist()))
    man = os.path.join(tiny_corpus_dir, "manifest.json")
    import json
    with open(man) as fh:
        n_files = json.load(fh)["n_files"]
    # vertex set: every real file (from the engine's own files table — checked
    # against golden edges endpoints below)
    return pairs, n_files


@pytest.fixture(scope="module")
def ingested(tiny_corpus_dir):
    return ingest(tiny_corpus_dir)


@pytest.fixture(scope="module")
def vertex_ids(ingested):
    t = graph_vertices(ingested.files).to_pandas()
    return sorted(t["vertex_id"].tolist())


@pytest.fixture(scope="module")
def nxg(golden, vertex_ids):
    pairs, n_files = golden
    assert len(vertex_ids) == n_files
    g = nx.DiGraph()
    g.add_nodes_from(vertex_ids)
    g.add_edges_from(pairs)
    return g


@pytest.fixture(scope="module")
def dir_graph(ingested, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("graphdir"))
    return build_graph_dir(ingested.edges_file, graph_vertices(ingested.files),
                           wd, P, directed=True)


@pytest.fixture(scope="module")
def und_graph(ingested, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("graphund"))
    return build_graph_dir(ingested.edges_file, graph_vertices(ingested.files),
                           wd, P, directed=False)


def _as_dict(tbl, col):
    return dict(zip(tbl["v"].to_pylist(), tbl[col].to_pylist()))


def test_pagerank_matches_networkx(dir_graph, nxg):
    runner = GraphRunner(dir_graph)
    try:
        stats = runner.pagerank(alpha=ALPHA, tol=TOL, max_iter=500)
        assert stats.converged, stats
        got = _as_dict(runner.collect("rank"), "rank")
    finally:
        runner.shutdown()
    # scipy isn't installed here; _pagerank_python is networkx's own
    # pure-python power iteration with identical semantics
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python
    want = _pagerank_python(nxg, alpha=ALPHA, tol=TOL, max_iter=1000)
    assert set(got) == set(want)
    g = np.array([got[v] for v in sorted(got)])
    w = np.array([want[v] for v in sorted(got)])
    np.testing.assert_allclose(g, w, atol=1e-6, rtol=0)


def test_connected_components_exact(und_graph, nxg):
    runner = GraphRunner(und_graph)
    try:
        stats = runner.connected_components(max_iter=500)
        assert stats.converged
        got = _as_dict(runner.collect("label"), "label")
    finally:
        runner.shutdown()
    want = {}
    comps = list(nx.connected_components(nxg.to_undirected()))
    assert len(comps) >= 4  # >=3 isolated repos + main body
    for comp in comps:
        rep = min(comp)
        for v in comp:
            want[v] = rep
    assert got == want


def _lpa_oracle(pairs, vertices, max_iter=30):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {v: v for v in vertices}
    for _ in range(max_iter):
        new = {}
        for v in vertices:
            nb = adj[v]
            if not nb:
                new[v] = labels[v]
                continue
            cnt = Counter(labels[u] for u in nb)
            new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if new == labels:
            break
        labels = new
    return labels


def test_label_propagation_matches_oracle(und_graph, golden, vertex_ids):
    pairs, _ = golden
    runner = GraphRunner(und_graph)
    try:
        runner.label_propagation(max_iter=30)
        got = _as_dict(runner.collect("label"), "label")
    finally:
        runner.shutdown()
    want = _lpa_oracle(pairs, vertex_ids, max_iter=30)
    assert got == want


def test_triangles_match_networkx(ingested, nxg):
    per_vertex = triangle_counts(ingested.edges_file)
    tbl = per_vertex.to_pandas()
    got = dict(zip(tbl["v"], tbl["triangles"]))
    want = nx.triangles(nxg.to_undirected())
    for v, t in want.items():
        assert got.get(v, 0) == t, v
    assert total_triangles(triangle_counts(ingested.edges_file)) \
        == sum(want.values()) // 3


def test_checkpoint_resume_identical(dir_graph, tmp_path):
    ck = str(tmp_path / "ck")
    # uninterrupted reference run
    r1 = GraphRunner(dir_graph)
    try:
        r1.pagerank(alpha=ALPHA, tol=TOL, max_iter=500)
        full = _as_dict(r1.collect("rank"), "rank")
    finally:
        r1.shutdown()
    # interrupted: only 4 epochs, checkpoint every 2
    r2 = GraphRunner(dir_graph)
    try:
        s = r2.pagerank(alpha=ALPHA, tol=TOL, max_iter=4, ckpt_dir=ck,
                        checkpoint_every=2)
        assert not s.converged
        assert s.lineage, "lineage rows must be recorded"
        assert {row["pid"] for row in s.lineage} == set(range(P))
    finally:
        r2.shutdown()
    assert GraphRunner.resume_epoch(ck) == 4
    # resume to convergence
    r3 = GraphRunner(dir_graph)
    try:
        s3 = r3.pagerank(alpha=ALPHA, tol=TOL, max_iter=500, ckpt_dir=ck,
                         checkpoint_every=10, resume=True)
        assert s3.resumed_from == 4
        resumed = _as_dict(r3.collect("rank"), "rank")
    finally:
        r3.shutdown()
    g = np.array([resumed[v] for v in sorted(full)])
    w = np.array([full[v] for v in sorted(full)])
    np.testing.assert_allclose(g, w, atol=1e-7, rtol=0)
    # re-run of the completed job: answers unchanged (idempotent rerun)
    r4 = GraphRunner(dir_graph)
    try:
        s4 = r4.pagerank(alpha=ALPHA, tol=TOL, max_iter=500, ckpt_dir=ck,
                         checkpoint_every=10, resume=True)
        again = _as_dict(r4.collect("rank"), "rank")
        assert s4.resumed_from is not None
    finally:
        r4.shutdown()
    a = np.array([again[v] for v in sorted(full)])
    np.testing.assert_allclose(a, w, atol=1e-7, rtol=0)


def test_triangles_strategies_agree(ingested, nxg):
    want = nx.triangles(nxg.to_undirected())
    for strat in ("broadcast", "join"):
        pv = triangle_counts(ingested.edges_file,
                             strategy=strat).to_pandas()
        got = dict(zip(pv["v"], pv["triangles"]))
        for v, t in want.items():
            assert got.get(v, 0) == t, (strat, v)


def test_shard_death_recovery(dir_graph, tmp_path):
    """The reference's Restart=always contract (Metis/systemd/
    metis.service:8-9): a shard actor killed mid-run is revived by Ray
    (max_restarts), the runner reloads the newest complete checkpoint on
    every shard and the job completes with identical answers."""
    ck = str(tmp_path / "ck_fault")
    r1 = GraphRunner(dir_graph)
    try:
        r1.pagerank(alpha=ALPHA, tol=TOL, max_iter=500)
        want = _as_dict(r1.collect("rank"), "rank")
    finally:
        r1.shutdown()
    w = np.array([want[v] for v in sorted(want)])

    # with checkpoints: recovery resumes from the newest complete epoch
    r2 = GraphRunner(dir_graph)
    killed: list[int] = []

    def kill_once(epoch, delta, secs):
        if epoch == 3 and not killed:
            ray.kill(r2.shards[1], no_restart=False)
            killed.append(epoch)

    try:
        s = r2.pagerank(alpha=ALPHA, tol=TOL, max_iter=500, ckpt_dir=ck,
                        checkpoint_every=2, on_epoch=kill_once)
        assert killed, "kill hook never fired"
        assert s.recoveries >= 1
        assert s.converged
        got = _as_dict(r2.collect("rank"), "rank")
    finally:
        r2.shutdown()
    g = np.array([got[v] for v in sorted(want)])
    np.testing.assert_allclose(g, w, atol=1e-7, rtol=0)

    # without checkpoints: recovery re-initializes from epoch 0 and still
    # converges to the same fixpoint
    r3 = GraphRunner(dir_graph)
    killed3: list[int] = []

    def kill_once3(epoch, delta, secs):
        if epoch == 2 and not killed3:
            ray.kill(r3.shards[0], no_restart=False)
            killed3.append(epoch)

    try:
        s3 = r3.pagerank(alpha=ALPHA, tol=TOL, max_iter=500,
                         on_epoch=kill_once3)
        assert killed3 and s3.recoveries >= 1 and s3.converged
        got3 = _as_dict(r3.collect("rank"), "rank")
    finally:
        r3.shutdown()
    g3 = np.array([got3[v] for v in sorted(want)])
    np.testing.assert_allclose(g3, w, atol=1e-7, rtol=0)


def test_checkpoint_in_fixed_iteration_mode(dir_graph, tmp_path):
    """tol<=0 (async bench mode) must still honor ckpt_dir — it used to
    silently skip every checkpoint."""
    ck = str(tmp_path / "ck_async")
    r = GraphRunner(dir_graph)
    try:
        r.pagerank(alpha=0.85, tol=0.0, max_iter=4, ckpt_dir=ck,
                   checkpoint_every=2)
    finally:
        r.shutdown()
    assert GraphRunner.resume_epoch(ck) == 4


def test_layout_persisted_and_self_healing(dir_graph):
    """build_graph_dir persists the per-shard CSR layout; a pre-layout dir
    (layout/ removed) is migrated in place by the first shard start."""
    import shutil

    from metis_ray.graph.shard import load_layout

    for pid in range(P):
        assert load_layout(dir_graph, pid, P) is not None
    shutil.rmtree(os.path.join(dir_graph, "layout"))
    r = GraphRunner(dir_graph)
    try:
        r.pagerank(alpha=ALPHA, tol=TOL, max_iter=5)
    finally:
        r.shutdown()
    for pid in range(P):
        assert load_layout(dir_graph, pid, P) is not None


def test_ktruss_matches_networkx(ingested, nxg):
    """k_truss edge sets == NetworkX nx.k_truss on the undirected view,
    for every k from 2 up past the graph's trussness (empty result)."""
    from metis_ray.graph.triangles import k_truss

    und = nxg.to_undirected()
    und.remove_edges_from(nx.selfloop_edges(und))
    for k in (2, 3, 4, 5, 6):
        want = {(min(a, b), max(a, b))
                for a, b in nx.k_truss(und, k).edges()}
        got_df = k_truss(ingested.edges_file, k).to_pandas()
        got = (set(zip(got_df["src"], got_df["dst"]))
               if len(got_df) else set())
        assert got == want, f"k={k}: {len(got)} vs {len(want)} edges"


def test_ktruss_synthetic_peel():
    """Two K4s sharing a vertex plus a tail: 4-truss keeps both K4s and
    drops the tail; 5-truss is empty. Exercises a genuine multi-round
    peel (the tail edge's removal cannot change K4 support, but a
    wedge-only edge dies in round one and its wedges in round two)."""
    import pyarrow as pa
    import ray.data as rd
    from metis_ray.graph.triangles import edge_support, k_truss

    k4a = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    k4b = [(3, 4), (3, 5), (3, 6), (4, 5), (4, 6), (5, 6)]
    extra = [(6, 7), (7, 8), (8, 6),      # a triangle off vertex 6
             (8, 9)]                      # a pendant edge
    edges = k4a + k4b + extra
    ds = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in edges], pa.int64()),
        "dst": pa.array([b for _, b in edges], pa.int64())}))

    sup = edge_support(
        rd.from_arrow(pa.table({
            "src": pa.array([a for a, _ in edges], pa.int64()),
            "dst": pa.array([b for _, b in edges], pa.int64())}))
    ).to_pandas()
    smap = {(a, b): s for a, b, s in
            zip(sup["src"], sup["dst"], sup["support"])}
    assert smap[(0, 1)] == 2 and smap[(6, 7)] == 1
    assert (8, 9) not in smap                       # zero triangles

    t4 = {tuple(r) for r in k_truss(ds, 4).to_pandas().values}
    assert t4 == set(k4a) | set(k4b)
    t5 = k_truss(ds, 5).to_pandas()
    assert len(t5) == 0

    g = nx.Graph(edges)
    for k in (2, 3, 4):
        want = {(min(a, b), max(a, b)) for a, b in nx.k_truss(g, k).edges()}
        got = {tuple(r) for r in k_truss(ds, k).to_pandas().values}
        assert got == want, k


def test_golden_graph_algorithms_match_networkx():
    """The sequential kcore/scc golden generators (DuckDB-twin oracles for
    the driver gate) vs NetworkX on random multigraphs."""
    import networkx as nx
    import numpy as np

    from metis_ray.goldens import _core_numbers, _scc_labels

    rng = np.random.RandomState(0)
    for _ in range(10):
        n = rng.randint(2, 60)
        m = rng.randint(0, 4 * n)
        ids = np.sort(rng.choice(np.arange(1, 10_000), size=n,
                                 replace=False)).astype(np.int64)
        si, di = rng.randint(0, n, m), rng.randint(0, n, m)
        ns = si != di
        si, di = si[ns], di[ns]

        def adjacency(a, b):
            if len(a):
                pairs = np.unique(np.stack([a, b], axis=1), axis=0)
                a, b = pairs[:, 0], pairs[:, 1]
            starts = np.searchsorted(a, np.arange(n))
            ends = np.searchsorted(a, np.arange(n), side="right")
            return [b[s:t] for s, t in zip(starts, ends)]

        und = adjacency(np.concatenate([si, di]), np.concatenate([di, si]))
        cores = _core_numbers(n, und)
        G = nx.Graph()
        G.add_nodes_from(range(n))
        G.add_edges_from(zip(si.tolist(), di.tolist()))
        want = nx.core_number(G)
        assert all(cores[v] == want[v] for v in range(n))

        comp = _scc_labels(n, adjacency(si, di), ids)
        D = nx.DiGraph()
        D.add_nodes_from(range(n))
        D.add_edges_from(zip(si.tolist(), di.tolist()))
        for c in nx.strongly_connected_components(D):
            lab = min(ids[v] for v in c)
            assert all(comp[v] == lab for v in c)
