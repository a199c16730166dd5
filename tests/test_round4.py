"""Round-4 additions: exact ANN tie handling, kmeans golden twin,
out-of-order retro-resolution, mid-copy robustness, vectorized rolling
fingerprint, zero-copy embedding batches, Dataset-engine LPA."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ANN exact tie handling (VERDICT r3 "Next" #3): many identical vectors must
# select the k smallest neighbor_ids, not argpartition's arbitrary members
# ---------------------------------------------------------------------------

def _tied_embeddings_dir(tmp_path, n=400, dim=8, seed=3):
    """All vectors identical => every score ties exactly; vec_ids shuffled
    so an arbitrary argpartition window is (with overwhelming probability)
    NOT the k smallest ids."""
    rng = np.random.RandomState(seed)
    ids = rng.permutation(n).astype(np.int64)
    vec = rng.rand(dim)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([vec.tolist()] * n,
                              pa.list_(pa.float64())),
    })
    d = str(tmp_path / "tied_sf")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "embeddings.parquet"),
                   row_group_size=64)
    return d


def test_ann_topk_exact_under_adversarial_ties(tmp_path):
    from metis_ray.pipelines.similarity import ann_topk

    d = _tied_embeddings_dir(tmp_path)
    k, nq = 10, 3
    got = ann_topk(d, k=k, n_queries=nq)
    for qid in got["query_id"].unique():
        neigh = got[got["query_id"] == qid].sort_values("rnk")[
            "neighbor_id"].tolist()
        assert neigh == list(range(k)), neigh   # smallest ids win every tie


def test_ann_ivf_exact_under_adversarial_ties(tmp_path):
    from metis_ray.pipelines.similarity import ann_ivf_topk

    d = _tied_embeddings_dir(tmp_path)
    k, nq = 10, 3
    got = ann_ivf_topk(d, k=k, n_queries=nq, n_centroids=4, nprobe=4)
    for qid in got["query_id"].unique():
        neigh = got[got["query_id"] == qid].sort_values("rnk")[
            "neighbor_id"].tolist()
        assert neigh == list(range(k)), neigh


# ---------------------------------------------------------------------------
# emb_kmeans golden twin (VERDICT r3 "Next" #4)
# ---------------------------------------------------------------------------

def test_kmeans_golden_matches_engine():
    from metis_ray.goldens import golden_dir_for_sf
    from metis_ray.pipelines.similarity import kmeans_clusters

    d = golden_dir_for_sf(SF)
    golden = pq.read_table(os.path.join(d, "golden_kmeans.parquet")).to_pandas()
    got = kmeans_clusters(SF).to_pandas()
    g = dict(zip(got["vec_id"], got["cluster"]))
    w = dict(zip(golden["vec_id"], golden["cluster"]))
    assert g == w


# ---------------------------------------------------------------------------
# Zero-copy embedding batches (VERDICT r3 "Next" #5)
# ---------------------------------------------------------------------------

def test_embedding_matrix_matches_vstack():
    from metis_ray.pipelines.similarity import _embedding_matrix

    rng = np.random.RandomState(11)
    rows = rng.rand(37, 6)

    for typ in (pa.list_(pa.float64()), pa.list_(pa.float32()),
                pa.list_(pa.float64(), 6)):      # 3rd = fixed_size_list
        arr = pa.array([r.tolist() for r in rows], typ)
        t = pa.table({"embedding": arr})
        want = np.vstack([np.asarray(v, np.float64)
                          for v in t["embedding"].to_pylist()])
        got = _embedding_matrix(t["embedding"])
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)
        # sliced table (non-zero offset) must still map the right rows
        sl = t.slice(5, 20)
        got_sl = _embedding_matrix(sl["embedding"])
        np.testing.assert_allclose(got_sl, want[5:25], rtol=0, atol=1e-7)
        # chunked column
        ch = pa.chunked_array([arr.slice(0, 10), arr.slice(10)])
        got_ch = _embedding_matrix(ch)
        np.testing.assert_allclose(got_ch, want, rtol=0, atol=1e-7)


def test_embedding_matrix_ragged_fallback():
    from metis_ray.pipelines.similarity import _embedding_matrix

    arr = pa.array([[1.0, 2.0], [3.0], [4.0, 5.0, 6.0]],
                   pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="ragged"):
        _embedding_matrix(arr)


# ---------------------------------------------------------------------------
# Vectorized rolling fingerprint (VERDICT r3 "Next" #7)
# ---------------------------------------------------------------------------

def test_rolling_fingerprints_batch_matches_scalar():
    from metis_ray.functions.hashing import (ngram_fingerprint,
                                             ngram_fingerprints)

    rng = np.random.RandomState(5)
    texts = [
        "", "abc", "exactly8", "a bit longer than eight chars",
        "x" * 500,
        "".join(chr(rng.randint(32, 127)) for _ in range(200)),
        "unicode éà中文 mixed in a longer document body",
    ]
    got = ngram_fingerprints(texts)
    want = [ngram_fingerprint(t) for t in texts]
    assert list(got) == want


# ---------------------------------------------------------------------------
# Out-of-order arrival retro-resolution (ADVICE r3 low #2)
# ---------------------------------------------------------------------------

def _frag(repo, path, content):
    return pa.table({
        "repo": [repo], "path": [path], "commit": ["c0"],
        "lang": ["python"],
        "content": pa.array([content], pa.large_string()),
    })


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_out_of_order_arrival_retroresolves(tmp_path, strategy):
    """An import landed in increment N whose target module arrives in
    increment N+1 must appear in edges_so_far after N+1 (retro-resolution
    against the refreshed symbol table)."""
    from metis_ray.functions.hashing import hash64_one
    from metis_ray.pipelines.incremental import edges_so_far, ingest_increment

    cd = str(tmp_path / f"corpus_ooo_{strategy}")
    os.makedirs(os.path.join(cd, "corpus"))
    state = str(tmp_path / f"state_ooo_{strategy}")

    # increment 1: the IMPORTER arrives first; its target doesn't exist yet
    pq.write_table(_frag("r1", "imp.py", "import r1.tgt\n"),
                   os.path.join(cd, "corpus", "b_importer.parquet"))
    info1 = ingest_increment(cd, state, resolve_strategy=strategy)
    assert info1["new_fragments"] == 1
    assert info1["new_edges"] == 0          # nothing resolvable yet

    # increment 2: the TARGET arrives
    pq.write_table(_frag("r1", "tgt.py", "x = 1\n"),
                   os.path.join(cd, "corpus", "a_target.parquet"))
    info2 = ingest_increment(cd, state, resolve_strategy=strategy)
    assert info2["new_fragments"] == 1

    edges = edges_so_far(state).to_pandas()
    pairs = set(zip(edges["src"], edges["dst"]))
    assert (hash64_one("r1/imp.py"), hash64_one("r1/tgt.py")) in pairs

    # idempotent: re-running must not re-land the retro edge
    info3 = ingest_increment(cd, state, resolve_strategy=strategy)
    assert info3["new_fragments"] == 0
    edges2 = edges_so_far(state).to_pandas()
    key = lambda df: {(int(s), int(d)): int(m) for s, d, m in
                      zip(df["src"], df["dst"], df["multiplicity"])}
    assert key(edges2) == key(edges)


def test_incremental_graph_matches_batch_out_of_order(tmp_path):
    """The build_incremental_graph identity claim under OUT-OF-ORDER
    arrival: importer before target, graph equals the batch build."""
    from metis_ray.graph.runner import GraphRunner
    from metis_ray.pipelines.incremental import (build_incremental_graph,
                                                 ingest_increment)
    from metis_ray.pipelines.linkgraph import build_linkgraph

    cd = str(tmp_path / "corpus_oog")
    cb = str(tmp_path / "corpus_oogb")
    for d in (cd, cb):
        os.makedirs(os.path.join(d, "corpus"))
    fr_imp = _frag("r1", "imp.py", "import r1.tgt\nimport r1.tgt\n")
    fr_tgt = _frag("r1", "tgt.py", "import r1.imp\n")
    pq.write_table(fr_imp, os.path.join(cb, "corpus", "b.parquet"))
    pq.write_table(fr_tgt, os.path.join(cb, "corpus", "a.parquet"))

    state = str(tmp_path / "state_oog")
    pq.write_table(fr_imp, os.path.join(cd, "corpus", "b.parquet"))
    ingest_increment(cd, state)
    pq.write_table(fr_tgt, os.path.join(cd, "corpus", "a.parquet"))
    ingest_increment(cd, state)

    gi = build_incremental_graph(state, str(tmp_path / "wd_i"), P=2)
    gb = build_linkgraph(cb, str(tmp_path / "wd_b"), P=2)

    def ranks(gdir):
        r = GraphRunner(gdir)
        try:
            r.pagerank(alpha=0.85, tol=1e-10, max_iter=60)
            t = (r.collect("rank").to_pandas()
                 .sort_values("v").reset_index(drop=True))
            return dict(zip(t["v"], np.round(t["rank"], 9)))
        finally:
            r.shutdown()

    assert ranks(gi) == ranks(gb)


# ---------------------------------------------------------------------------
# Mid-copy foreign fragment must not crash the increment (ADVICE r3 medium)
# ---------------------------------------------------------------------------

def test_midcopy_fragment_does_not_crash_increment(tmp_path):
    """One stable complete fragment lands while ANOTHER file in the corpus
    dir is still being copied (truncated): the symbol table build must not
    read the truncated file (explicit file list, not the whole dir)."""
    from metis_ray.pipelines.incremental import ingest_increment

    cd = str(tmp_path / "corpus_mc")
    os.makedirs(os.path.join(cd, "corpus"))
    state = str(tmp_path / "state_mc")

    ready = os.path.join(cd, "corpus", "a_ready.parquet")
    pq.write_table(_frag("r1", "imp.py", "import r1.tgt\n"), ready)
    # a second fragment mid-copy: truncated, no PAR1 footer
    whole = str(tmp_path / "whole.parquet")
    pq.write_table(_frag("r1", "tgt.py", "x = 1\n"), whole)
    data = open(whole, "rb").read()
    with open(os.path.join(cd, "corpus", "b_midcopy.parquet"), "wb") as fh:
        fh.write(data[: len(data) // 2])

    pending = {"a_ready.parquet": os.path.getsize(ready),
               "b_midcopy.parquet": len(data) // 2}
    info = ingest_increment(cd, state, pending_sizes=pending)
    assert info["new_fragments"] == 1       # the ready one landed
    assert info["new_edges"] >= 0           # and nothing crashed


# ---------------------------------------------------------------------------
# Dataset-engine LPA (VERDICT r3 "Next" #8)
# ---------------------------------------------------------------------------

def test_dataset_engine_weighted_pagerank_matches_networkx(tiny_corpus_dir):
    """pagerank_dataset(weight_col='multiplicity') == NetworkX weighted
    PageRank — makes the certified multiplicity column load-bearing
    (VERDICT r3 'Next' #9)."""
    import networkx as nx
    from networkx.algorithms.link_analysis.pagerank_alg import \
        _pagerank_python   # scipy isn't in this container

    from metis_ray.graph.dataset_engine import pagerank_dataset
    from metis_ray.pipelines.linkgraph import graph_vertices, ingest

    res = ingest(tiny_corpus_dir)
    ranks, _ = pagerank_dataset(res.edges_file, graph_vertices(res.files),
                                alpha=0.85, tol=1e-9, max_iter=200,
                                weight_col="multiplicity")
    got = dict(zip(*[ranks.to_pandas()[c] for c in ("v", "rank")]))

    golden = pq.read_table(os.path.join(tiny_corpus_dir,
                                        "golden_edges_file.parquet"))
    g = nx.DiGraph()
    g.add_nodes_from(got.keys())
    for s, d, m in zip(golden["src"].to_pylist(), golden["dst"].to_pylist(),
                       golden["multiplicity"].to_pylist()):
        g.add_edge(s, d, weight=float(m))
    want = _pagerank_python(g, alpha=0.85, tol=1e-11, max_iter=1000,
                            weight="weight")
    a = np.array([got[v] for v in sorted(got)])
    b = np.array([want[v] for v in sorted(got)])
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)


def test_dataset_engine_lpa_matches_golden(tiny_corpus_dir):
    from metis_ray.graph.dataset_engine import labelprop_dataset
    from metis_ray.pipelines.linkgraph import graph_vertices, ingest

    res = ingest(tiny_corpus_dir)
    labels_ds, _ = labelprop_dataset(res.edges_file,
                                     graph_vertices(res.files), max_iter=30)
    got = dict(zip(*[labels_ds.to_pandas()[c] for c in ("v", "label")]))
    golden = pq.read_table(os.path.join(tiny_corpus_dir,
                                        "golden_labels.parquet"))
    want = dict(zip(golden["v"].to_pylist(), golden["label"].to_pylist()))
    assert got == want


def test_adamic_adar_matches_networkx():
    """Hub-capped Adamic-Adar on a random multigraph (self-loops, parallel
    edges) == NetworkX adamic_adar_index over all non-edges with score > 0,
    including the common-neighbor counts and the exclusion of adjacent
    pairs. k is set past the number of scored pairs so the full prediction
    set is compared, not just a prefix."""
    import networkx as nx
    import ray.data as rd
    from metis_ray.graph.linkpred import adamic_adar

    rng = np.random.RandomState(7)
    n = 50
    src = rng.randint(0, n, 220)
    dst = rng.randint(0, n, 220)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}))

    got = adamic_adar(edges, k=100_000).to_pandas()
    got_scores = {(a, b): s for a, b, s in
                  zip(got["a"], got["b"], got["adamic_adar"])}
    got_cn = {(a, b): c for a, b, c in
              zip(got["a"], got["b"], got["common_neighbors"])}

    g = nx.Graph()
    g.add_edges_from((int(s), int(d)) for s, d in zip(src, dst) if s != d)
    want_scores, want_cn = {}, {}
    for u, v, p in nx.adamic_adar_index(g):
        if p > 0:
            a, b = (u, v) if u < v else (v, u)
            want_scores[(a, b)] = round(p, 6)
            want_cn[(a, b)] = len(list(nx.common_neighbors(g, u, v)))

    assert got_cn == want_cn
    assert set(got_scores) == set(want_scores)
    for k_ in want_scores:
        assert abs(got_scores[k_] - want_scores[k_]) <= 1e-6


def test_adamic_adar_hub_cap_counted():
    """A star hub past the cap emits no wedges but IS counted; the
    remaining wedge centers still score."""
    import ray.data as rd
    from metis_ray.graph.linkpred import adamic_adar

    hub_edges = [(0, i) for i in range(1, 12)]           # deg(0) = 11 > cap
    tri = [(100, 101), (100, 102)]                       # center 100, deg 2
    src, dst = zip(*(hub_edges + tri))
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}))

    stats = {}
    got = adamic_adar(edges, k=1000, max_hub_degree=10,
                      stats=stats).to_pandas()
    assert stats["dropped_hubs"] == 1
    pairs = set(zip(got["a"], got["b"]))
    assert pairs == {(101, 102)}                         # hub wedges gone
    assert got["common_neighbors"].iloc[0] == 1


def test_jaccard_neighbors_matches_networkx():
    """Neighborhood Jaccard on a random multigraph == NetworkX
    jaccard_coefficient over all non-edges with score > 0."""
    import networkx as nx
    import ray.data as rd
    from metis_ray.graph.linkpred import jaccard_neighbors

    rng = np.random.RandomState(13)
    n = 50
    src = rng.randint(0, n, 220)
    dst = rng.randint(0, n, 220)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}))

    got = jaccard_neighbors(edges, k=100_000).to_pandas()
    got_scores = {(a, b): s for a, b, s in
                  zip(got["a"], got["b"], got["jaccard"])}

    g = nx.Graph()
    g.add_edges_from((int(s), int(d)) for s, d in zip(src, dst) if s != d)
    want = {}
    for u, v, p in nx.jaccard_coefficient(g):
        if p > 0:
            a, b = (u, v) if u < v else (v, u)
            want[(a, b)] = round(p, 6)

    assert set(got_scores) == set(want)
    for k_ in want:
        assert abs(got_scores[k_] - want[k_]) <= 1e-6


def _nx_scc_labels(src, dst, n):
    import networkx as nx
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from((int(s), int(d)) for s, d in zip(src, dst))
    want = {}
    for comp in nx.strongly_connected_components(g):
        m = min(comp)
        for v in comp:
            want[v] = m
    return want


def test_scc_matches_networkx_random():
    """Trim + FB-min-label SCC == NetworkX on a random directed multigraph
    with self-loops and parallel edges (cycles + DAG tails mixed)."""
    import ray.data as rd
    from metis_ray.graph.dataset_engine import scc_dataset

    rng = np.random.RandomState(23)
    n = 60
    src = rng.randint(0, n, 260)
    dst = rng.randint(0, n, 260)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}))
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(np.arange(n), pa.int64())}))

    got_ds, epochs = scc_dataset(edges, verts)
    got = dict(zip(*[got_ds.to_pandas()[c] for c in ("v", "scc")]))
    assert got == _nx_scc_labels(src, dst, n)
    assert epochs >= 1


def test_scc_structured():
    """Hand-built case: two disjoint cycles bridged one-way, a pure DAG
    chain hanging off, an isolated vertex, and a self-loop singleton —
    the bridge must NOT merge the cycles, trim must peel the chain."""
    import ray.data as rd
    from metis_ray.graph.dataset_engine import scc_dataset

    edges_list = ([(10, 11), (11, 12), (12, 10),       # cycle A
                   (20, 21), (21, 20),                 # cycle B
                   (12, 20),                           # one-way bridge
                   (20, 30), (30, 31), (31, 32),       # DAG tail
                   (40, 40)])                          # self-loop singleton
    src, dst = zip(*edges_list)
    n_ids = [10, 11, 12, 20, 21, 30, 31, 32, 40, 50]   # 50 isolated
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}))
    verts = rd.from_arrow(pa.table({
        "vertex_id": pa.array(n_ids, pa.int64())}))

    got_ds, _ = scc_dataset(edges, verts)
    got = dict(zip(*[got_ds.to_pandas()[c] for c in ("v", "scc")]))
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
                   30: 30, 31: 31, 32: 32, 40: 40, 50: 50}
