"""Incremental ingest idempotence + Dataset-engine PageRank parity."""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from metis_ray.graph.dataset_engine import (degree_histogram, hot_vertices,
                                            pagerank_dataset)
from metis_ray.pipelines.incremental import edges_so_far, ingest_increment
from metis_ray.pipelines.linkgraph import graph_vertices, ingest


def test_incremental_matches_batch(tiny_corpus_dir, tmp_path):
    # stage fragments one at a time into a fresh corpus dir
    src = os.path.join(tiny_corpus_dir, "corpus")
    frags = sorted(os.listdir(src))
    cd = str(tmp_path / "corpus_inc")
    os.makedirs(os.path.join(cd, "corpus"))
    state = str(tmp_path / "state")

    # first increment: first fragment only
    shutil.copy(os.path.join(src, frags[0]), os.path.join(cd, "corpus", frags[0]))
    info1 = ingest_increment(cd, state)
    assert info1["new_fragments"] == 1 and info1["new_edges"] > 0

    # no-op re-run (the "already imported => nothing to do" contract)
    info2 = ingest_increment(cd, state)
    assert info2 == {"new_fragments": 0, "new_edges": 0, "batch_dir": None}

    # remaining fragments arrive
    for f in frags[1:]:
        shutil.copy(os.path.join(src, f), os.path.join(cd, "corpus", f))
    info3 = ingest_increment(cd, state)
    assert info3["new_fragments"] == len(frags) - 1

    # union equals the one-shot batch ingest edge set
    inc = edges_so_far(state).to_pandas()
    batch = ingest(tiny_corpus_dir).edges_file.to_pandas()
    assert set(zip(inc["src"], inc["dst"])) == set(zip(batch["src"], batch["dst"]))


def test_incremental_join_strategy_matches_broadcast(tiny_corpus_dir, tmp_path):
    """resolve_strategy='join' through the incremental path (symbol table
    stays a Dataset, no driver build_symbol_table) lands the identical
    edge set + multiplicities as the default broadcast path."""
    src = os.path.join(tiny_corpus_dir, "corpus")
    frags = sorted(os.listdir(src))
    cd = str(tmp_path / "corpus_j")
    os.makedirs(os.path.join(cd, "corpus"))
    state_b = str(tmp_path / "state_b")
    state_j = str(tmp_path / "state_j")

    shutil.copy(os.path.join(src, frags[0]), os.path.join(cd, "corpus", frags[0]))
    ingest_increment(cd, state_b)
    ingest_increment(cd, state_j, resolve_strategy="join")
    for f in frags[1:]:
        shutil.copy(os.path.join(src, f), os.path.join(cd, "corpus", f))
    ingest_increment(cd, state_b)
    ingest_increment(cd, state_j, resolve_strategy="join")

    key = lambda df: {(int(s), int(d)): int(m) for s, d, m in
                      zip(df["src"], df["dst"], df["multiplicity"])}
    b = edges_so_far(state_b).to_pandas()
    j = edges_so_far(state_j).to_pandas()
    assert key(b) == key(j)
    # repo names attach identically through the join path
    assert (set(zip(b["src"], b["src_repo"], b["dst_repo"]))
            == set(zip(j["src"], j["src_repo"], j["dst_repo"])))


@pytest.fixture(scope="module")
def tiny_ingest(tiny_corpus_dir):
    return ingest(tiny_corpus_dir)


def test_dataset_engine_matches_networkx(tiny_ingest, tiny_corpus_dir):
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python
    import networkx as nx

    ranks, epochs = pagerank_dataset(
        tiny_ingest.edges_file, graph_vertices(tiny_ingest.files),
        alpha=0.85, tol=1e-9, max_iter=200)
    got = dict(zip(*[ranks.to_pandas()[c] for c in ("v", "rank")]))

    golden = pq.read_table(os.path.join(tiny_corpus_dir,
                                        "golden_edges_file.parquet"))
    g = nx.DiGraph()
    g.add_nodes_from(got.keys())
    g.add_edges_from(zip(golden["src"].to_pylist(), golden["dst"].to_pylist()))
    want = _pagerank_python(g, alpha=0.85, tol=1e-9, max_iter=1000)
    a = np.array([got[v] for v in sorted(got)])
    b = np.array([want[v] for v in sorted(got)])
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)


def test_dataset_engine_salted_equals_unsalted(tiny_ingest):
    verts = graph_vertices(tiny_ingest.files)
    hot = set(hot_vertices(tiny_ingest.edges_file, top_k=8))
    r1, _ = pagerank_dataset(tiny_ingest.edges_file, verts, max_iter=5, tol=0.0)
    r2, _ = pagerank_dataset(tiny_ingest.edges_file, verts, max_iter=5, tol=0.0,
                             hot_keys=hot, salt=4)
    a = r1.to_pandas().sort_values("v")["rank"].to_numpy()
    b = r2.to_pandas().sort_values("v")["rank"].to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-12, rtol=0)


def test_degree_histogram_reconciles(tiny_ingest):
    hist = degree_histogram(tiny_ingest.edges_file).to_pandas()
    edges = tiny_ingest.edges_file.to_pandas()
    import collections
    indeg = collections.Counter(edges["dst"])
    want = collections.Counter(indeg.values())
    got = dict(zip(hist["degree"], hist["n_vertices"]))
    assert got == dict(want)


def test_dataset_engine_components_exact(tiny_ingest, tiny_corpus_dir):
    import networkx as nx
    from metis_ray.graph.dataset_engine import components_dataset

    labels_ds, epochs = components_dataset(
        tiny_ingest.edges_file, graph_vertices(tiny_ingest.files))
    got = dict(zip(*[labels_ds.to_pandas()[c] for c in ("v", "label")]))

    golden = pq.read_table(os.path.join(tiny_corpus_dir,
                                        "golden_edges_file.parquet"))
    g = nx.Graph()
    g.add_nodes_from(got.keys())
    g.add_edges_from(zip(golden["src"].to_pylist(), golden["dst"].to_pylist()))
    want = {}
    for comp in nx.connected_components(g):
        rep = min(comp)
        for v in comp:
            want[v] = rep
    assert got == want


def test_fragment_immutability_raises(tiny_corpus_dir, tmp_path):
    """A size-changed fragment violates the exactly-once landing contract
    and must fail loudly, not double-count."""
    src = os.path.join(tiny_corpus_dir, "corpus")
    frag = sorted(os.listdir(src))[0]
    cd = str(tmp_path / "corpus_mut")
    os.makedirs(os.path.join(cd, "corpus"))
    state = str(tmp_path / "state_mut")
    shutil.copy(os.path.join(src, frag), os.path.join(cd, "corpus", frag))
    ingest_increment(cd, state)
    with open(os.path.join(cd, "corpus", frag), "ab") as fh:
        fh.write(b"x")   # grow the fragment after it was landed
    with pytest.raises(ValueError, match="immutable"):
        ingest_increment(cd, state)


def test_watch_lands_arriving_fragments(tiny_corpus_dir, tmp_path):
    """Watcher loop (reference sinotify analogue): fragments dropped into
    the dir are landed without re-invocation; sentinel stops the loop;
    re-running afterwards is a no-op."""
    import threading

    from metis_ray.pipelines.incremental import watch

    src = os.path.join(tiny_corpus_dir, "corpus")
    frags = sorted(os.listdir(src))
    cd = str(tmp_path / "corpus_watch")
    os.makedirs(os.path.join(cd, "corpus"))
    state = str(tmp_path / "state_watch")
    os.makedirs(state)

    seen = []
    stop = os.path.join(state, "exit.exit")

    def feeder():
        for f in frags:
            # write-temp + rename so the watcher never sees a half-copied
            # fragment (the immutability contract requires atomic arrival)
            tmp = os.path.join(cd, "corpus", f + ".part")
            shutil.copy(os.path.join(src, f), tmp)
            os.rename(tmp, os.path.join(cd, "corpus", f))
        # wait until the watcher has landed every fragment, then stop it
        deadline = 60
        import time
        while deadline and sum(i["new_fragments"] for i in seen) < len(frags):
            time.sleep(0.5)
            deadline -= 0.5
        open(stop, "w").close()

    t = threading.Thread(target=feeder)
    t.start()
    totals = watch(cd, state, interval=0.2, on_batch=seen.append,
                   max_loops=200)
    t.join()
    assert totals["fragments"] == len(frags)
    assert totals["edges"] > 0
    # idempotent afterwards
    info = ingest_increment(cd, state)
    assert info["new_fragments"] == 0


def test_watch_defers_growing_fragment(tiny_corpus_dir, tmp_path):
    """Non-atomic arrival: a fragment still being copied (seen at a partial
    size) is deferred by the size-stability gate, then landed once stable —
    the watcher must neither crash nor read it truncated."""
    import threading
    import time

    from metis_ray.pipelines.incremental import edges_so_far, watch

    src = os.path.join(tiny_corpus_dir, "corpus")
    frag = sorted(os.listdir(src))[0]
    data = open(os.path.join(src, frag), "rb").read()
    cd = str(tmp_path / "corpus_slow")
    os.makedirs(os.path.join(cd, "corpus"))
    state = str(tmp_path / "state_slow")
    os.makedirs(state)
    dst = os.path.join(cd, "corpus", frag)
    stop = os.path.join(state, "exit.exit")

    def feeder():
        # plain non-atomic write: half now, rest after a few polls
        with open(dst, "wb") as fh:
            fh.write(data[: len(data) // 2])
            fh.flush()
            time.sleep(0.5)
            fh.write(data[len(data) // 2:])
        # wait for the watcher to land it, then stop
        deadline = time.time() + 60
        while time.time() < deadline:
            man = os.path.join(state, "ingested.json")
            if os.path.exists(man) and frag in open(man).read():
                break
            time.sleep(0.2)
        open(stop, "w").close()

    t = threading.Thread(target=feeder)
    t.start()
    totals = watch(cd, state, interval=0.2, stop_file=stop)
    t.join()
    assert totals["fragments"] == 1
    assert edges_so_far(state).count() >= 0   # batch readable, not truncated


def test_incremental_graph_matches_batch(tiny_corpus_dir, tmp_path):
    """Graph built from incrementally-landed state == graph built by batch
    ingest: identical PageRank output (the full watch -> land -> analyze
    loop lands in the same store as batch, reference S3 contract). The
    corpus is extended with an ISOLATED file (no imports in or out) — a
    vertex that edge endpoints alone would miss, shifting every PageRank
    value via (1-alpha)/N."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from metis_ray.functions.hashing import hash64_one
    from metis_ray.graph.runner import GraphRunner
    from metis_ray.pipelines.incremental import build_incremental_graph
    from metis_ray.pipelines.linkgraph import build_linkgraph

    src = os.path.join(tiny_corpus_dir, "corpus")
    frags = sorted(os.listdir(src))
    # both corpora (batch + incremental) get the same extra fragment with
    # one isolated python file
    iso = pa.table({
        "repo": ["iso_repo"], "path": ["iso_mod.py"], "commit": ["c0"],
        "lang": ["python"], "content": pa.array(["x = 1\n"], pa.large_string()),
    })
    cd = str(tmp_path / "corpus_g")          # incremental staging copy
    cb = str(tmp_path / "corpus_gb")         # batch copy
    for d in (cd, cb):
        os.makedirs(os.path.join(d, "corpus"))
    for f in frags:
        shutil.copy(os.path.join(src, f), os.path.join(cb, "corpus", f))
    _pq.write_table(iso, os.path.join(cb, "corpus", "zz_iso.parquet"))

    state = str(tmp_path / "state_g")
    shutil.copy(os.path.join(src, frags[0]), os.path.join(cd, "corpus", frags[0]))
    ingest_increment(cd, state)              # increment 1
    for f in frags[1:]:
        shutil.copy(os.path.join(src, f), os.path.join(cd, "corpus", f))
    _pq.write_table(iso, os.path.join(cd, "corpus", "zz_iso.parquet"))
    ingest_increment(cd, state)              # increment 2 (incl. isolated)

    gi = build_incremental_graph(state, str(tmp_path / "wd_i"), P=2)
    gb = build_linkgraph(cb, str(tmp_path / "wd_b"), P=2)

    def ranks(gdir):
        r = GraphRunner(gdir)
        r.pagerank(alpha=0.85, tol=1e-10, max_iter=60)
        t = r.collect("rank").to_pandas().sort_values("v").reset_index(drop=True)
        return dict(zip(t["v"], np.round(t["rank"], 9)))

    ri, rb = ranks(gi), ranks(gb)
    assert hash64_one("iso_repo/iso_mod.py") in ri   # the isolated vertex
    assert ri == rb


def test_dataset_engine_coreness_matches_networkx(tiny_ingest, tiny_corpus_dir):
    """H-index-iteration core numbers == NetworkX core_number on the
    undirected simple projection (self-loops dropped, parallel edges
    collapsed, isolated vertices core 0)."""
    import networkx as nx
    from metis_ray.graph.dataset_engine import coreness_dataset

    core_ds, epochs = coreness_dataset(
        tiny_ingest.edges_file, graph_vertices(tiny_ingest.files))
    got = dict(zip(*[core_ds.to_pandas()[c] for c in ("v", "core")]))

    golden = pq.read_table(os.path.join(tiny_corpus_dir,
                                        "golden_edges_file.parquet"))
    g = nx.Graph()
    g.add_nodes_from(got.keys())
    g.add_edges_from((s, d) for s, d in zip(golden["src"].to_pylist(),
                                            golden["dst"].to_pylist())
                     if s != d)
    want = nx.core_number(g)
    assert got == want
    assert epochs >= 1


def test_coreness_random_graph():
    """Adversarial check on a random multigraph with self-loops and
    parallel edges: the engine's simple-graph projection must still match
    NetworkX exactly."""
    import networkx as nx
    import pyarrow as pa
    import ray.data as rd
    from metis_ray.graph.dataset_engine import coreness_dataset

    rng = np.random.RandomState(11)
    n = 60
    src = rng.randint(0, n, 400)
    dst = rng.randint(0, n, 400)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}))
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.arange(n), pa.int64())}))
    core_ds, _ = coreness_dataset(edges, verts)
    got = dict(zip(*[core_ds.to_pandas()[c] for c in ("v", "core")]))

    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from((int(s), int(d)) for s, d in zip(src, dst) if s != d)
    assert got == nx.core_number(g)


def test_dataset_engine_personalized_pagerank_matches_networkx(
        tiny_ingest, tiny_corpus_dir):
    """Seed-set personalized PageRank == NetworkX pagerank(personalization=)
    (teleport AND dangling mass redistributed by the seed distribution)."""
    from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python
    import networkx as nx

    verts = graph_vertices(tiny_ingest.files)
    vids = sorted(verts.to_pandas()["vertex_id"])
    seeds = {int(vids[0]): 3.0, int(vids[len(vids) // 2]): 1.0}

    ranks, _ = pagerank_dataset(tiny_ingest.edges_file, verts,
                                alpha=0.85, tol=1e-9, max_iter=200,
                                personalization=seeds)
    got = dict(zip(*[ranks.to_pandas()[c] for c in ("v", "rank")]))

    golden = pq.read_table(os.path.join(tiny_corpus_dir,
                                        "golden_edges_file.parquet"))
    g = nx.DiGraph()
    g.add_nodes_from(got.keys())
    g.add_edges_from(zip(golden["src"].to_pylist(), golden["dst"].to_pylist()))
    want = _pagerank_python(g, alpha=0.85, tol=1e-9, max_iter=1000,
                            personalization=seeds)
    a = np.array([got[v] for v in sorted(got)])
    b = np.array([want[v] for v in sorted(got)])
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)


def test_personalization_unknown_vertex_raises(tiny_ingest):
    verts = graph_vertices(tiny_ingest.files)
    with pytest.raises(ValueError, match="not a graph vertex"):
        pagerank_dataset(tiny_ingest.edges_file, verts, max_iter=1,
                         personalization={-12345: 1.0})


def test_bfs_distance_matches_networkx(tiny_ingest, tiny_corpus_dir):
    """Multi-source BFS hop distance == per-seed NetworkX shortest path
    union-min, directed and undirected, unreachable = -1."""
    import networkx as nx
    from metis_ray.graph.dataset_engine import bfs_distance_dataset

    verts = graph_vertices(tiny_ingest.files)
    vids = sorted(verts.to_pandas()["vertex_id"])
    seeds = [int(vids[0]), int(vids[-1])]

    golden = pq.read_table(os.path.join(tiny_corpus_dir,
                                        "golden_edges_file.parquet"))
    pairs = list(zip(golden["src"].to_pylist(), golden["dst"].to_pylist()))

    for directed in (True, False):
        ds, _ = bfs_distance_dataset(tiny_ingest.edges_file, verts, seeds,
                                     directed=directed)
        got = dict(zip(*[ds.to_pandas()[c] for c in ("v", "dist")]))
        g = nx.DiGraph() if directed else nx.Graph()
        g.add_nodes_from(vids)
        g.add_edges_from(pairs)
        want = {v: -1 for v in vids}
        for s in seeds:
            for v, d in nx.single_source_shortest_path_length(g, s).items():
                if want[v] < 0 or d < want[v]:
                    want[v] = d
        assert got == want


def test_dataset_engine_weighted_lpa_matches_sequential():
    """Weighted LPA == a sequential numpy transcription of the recurrence
    (votes = undirected edge weight summed over both directions; argmax by
    max weight then min label), on a planted graph where the weights CHANGE
    the outcome vs unweighted voting."""
    import pyarrow as pa
    import ray.data as rd
    from metis_ray.graph.dataset_engine import labelprop_dataset

    # vertex 2 has two light edges to the {0,1} side and one heavy edge to
    # vertex 3: unweighted it joins {0,1}; weighted it follows 3.
    src = np.array([0, 1, 2, 0, 4, 3], dtype=np.int64)
    dst = np.array([2, 2, 3, 1, 3, 4], dtype=np.int64)
    mult = np.array([1, 1, 5, 3, 1, 1], dtype=np.int64)
    n = 5
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst),
        "multiplicity": pa.array(mult)}))
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.arange(n, dtype=np.int64))}))

    def sequential(weighted: bool, max_iter: int = 30) -> np.ndarray:
        # undirected weighted adjacency (weight summed over both directions;
        # unweighted = one vote per distinct undirected edge)
        wmat = np.zeros((n, n))
        for s, d, m in zip(src, dst, mult):
            if s != d:
                wmat[s, d] += float(m)
                wmat[d, s] += float(m)
        if not weighted:
            wmat = (wmat > 0).astype(np.float64)
        lab = np.arange(n, dtype=np.int64)
        for _ in range(max_iter):
            new = lab.copy()
            for v in range(n):
                nb = np.nonzero(wmat[v])[0]
                if len(nb) == 0:
                    continue
                tot: dict[int, float] = {}
                for u in nb:
                    tot[lab[u]] = tot.get(lab[u], 0.0) + wmat[v, u]
                best = sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                new[v] = best[0]
            if (new == lab).all():
                break
            lab = new
        return lab

    for weighted in (False, True):
        out, _ = labelprop_dataset(
            edges, verts,
            weight_col="multiplicity" if weighted else None)
        got = out.to_pandas().sort_values("v")["label"].to_numpy()
        want = sequential(weighted)
        np.testing.assert_array_equal(got, want, err_msg=f"weighted={weighted}")
    # sanity: the planted weights actually change SOME vertex's label —
    # otherwise the weighted path isn't being exercised
    assert (sequential(True) != sequential(False)).any()


def test_dataset_engine_hits_matches_networkx(tiny_ingest, tiny_corpus_dir):
    """hits_dataset vs networkx's pure-python HITS (same per-round
    max-normalization + final sum-normalization): converged hub/authority
    vectors agree at 1e-6 on the tiny corpus graph."""
    import networkx as nx
    from networkx.algorithms.link_analysis.hits_alg import _hits_python

    from metis_ray.graph.dataset_engine import hits_dataset

    res, epochs = hits_dataset(
        tiny_ingest.edges_file, graph_vertices(tiny_ingest.files),
        max_iter=500, tol=1e-12)
    df = res.to_pandas().sort_values("v").reset_index(drop=True)

    golden = pq.read_table(os.path.join(tiny_corpus_dir,
                                        "golden_edges_file.parquet"))
    g = nx.DiGraph()
    g.add_nodes_from(df["v"].tolist())
    g.add_edges_from(zip(golden["src"].to_pylist(),
                         golden["dst"].to_pylist()))
    want_h, want_a = _hits_python(g, max_iter=2000, tol=1e-12)
    vs = df["v"].tolist()
    np.testing.assert_allclose(df["hub"].to_numpy(),
                               np.array([want_h[v] for v in vs]),
                               atol=1e-6, rtol=0)
    np.testing.assert_allclose(df["authority"].to_numpy(),
                               np.array([want_a[v] for v in vs]),
                               atol=1e-6, rtol=0)
    assert epochs > 1


def test_scc_matches_networkx_on_corpus(tiny_ingest, tiny_corpus_dir):
    """SCC over the real corpus link graph == NetworkX on the golden edge
    table (the corpus synthesizer plants genuine import cycles, so this
    exercises the FB-peel path, not just trim)."""
    import networkx as nx
    from metis_ray.graph.dataset_engine import scc_dataset

    comp_ds, _ = scc_dataset(tiny_ingest.edges_file,
                             graph_vertices(tiny_ingest.files))
    got = dict(zip(*[comp_ds.to_pandas()[c] for c in ("v", "scc")]))

    golden = pq.read_table(os.path.join(tiny_corpus_dir,
                                        "golden_edges_file.parquet"))
    g = nx.DiGraph()
    g.add_nodes_from(got.keys())
    g.add_edges_from(zip(golden["src"].to_pylist(),
                         golden["dst"].to_pylist()))
    want = {}
    nontrivial = 0
    for c in nx.strongly_connected_components(g):
        if len(c) > 1:
            nontrivial += 1
        m = min(c)
        for v in c:
            want[v] = m
    assert got == want
    assert nontrivial >= 1     # the fixture must actually contain a cycle
