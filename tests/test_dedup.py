"""Dedup pipelines vs brute-force oracles on planted duplicates (FIXTURES
F5-style constructed inputs: known answers by construction)."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from metis_ray.functions.text import jaccard, word_shingles
from metis_ray.pipelines import dedup


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """An sf-dir-shaped directory whose documents table has planted exact
    and near duplicates, and whose embeddings table has planted
    near-identical vectors."""
    d = tmp_path_factory.mktemp("planted")
    base = ("the quick brown fox jumps over the lazy dog while the band "
            "plays on and the crowd cheers loudly for more music tonight")
    alt = base.replace("lazy", "sleepy")          # near-dup of base
    rng = np.random.RandomState(7)
    texts = [base, base, alt]                      # 0,1 exact; 2 near
    for i in range(30):
        words = rng.choice(
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau".split(), size=40)
        texts.append(" ".join(words))
    doc_ids = list(range(len(texts)))
    pq.write_table(pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(d / "documents.parquet"))

    dim = 16
    vecs = rng.normal(size=(20, dim)).astype(np.float32)
    vecs[1] = vecs[0] + rng.normal(scale=0.01, size=dim).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 20, pa.int32()),
    }), str(d / "embeddings.parquet"))
    return str(d), texts, vecs


def test_exact_dedup_planted(planted_dir):
    d, texts, _ = planted_dir
    out = dedup.exact_dedup(d).to_pandas()
    assert len(out) == len(texts) - 1            # docs 0 and 1 collapse
    dup = out[out["n_dups"] > 1]
    assert len(dup) == 1
    assert dup.iloc[0]["keep_id"] == 0
    assert dup.iloc[0]["n_dups"] == 2


def _brute_jaccard_pairs(texts, k, threshold):
    sh = [set(word_shingles(t, k)) for t in texts]
    out = set()
    for a, b in itertools.combinations(range(len(texts)), 2):
        if jaccard(sh[a], sh[b]) >= threshold:
            out.add((a, b))
    return out


def test_minhash_finds_planted_neardups(planted_dir):
    d, texts, _ = planted_dir
    got = dedup.minhash_dedup(d, threshold=0.5).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    want = _brute_jaccard_pairs(texts, 3, 0.5)
    # verification is exact-Jaccard, so no false positives:
    assert got_pairs <= want
    # the planted pairs must be found (high-similarity pairs survive LSH):
    assert (0, 1) in got_pairs and (0, 2) in got_pairs and (1, 2) in got_pairs


def test_simhash_finds_exact_and_near(planted_dir):
    d, texts, _ = planted_dir
    got = dedup.simhash_dedup(d, max_hamming=3).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    assert (0, 1) in pairs                        # identical docs: hamming 0
    assert (got["hamming"] <= 3).all()


def test_ngram_jaccard_planted(planted_dir):
    d, texts, _ = planted_dir
    got = dedup.ngram_jaccard_dedup(d, threshold=0.8).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    assert (0, 1) in pairs
    assert (0, 2) in pairs                        # one-word edit: char-8-gram
    assert (got["jaccard"] >= 0.8).all()          # jaccard stays high


def test_embedding_neardup_planted(planted_dir):
    d, _, vecs = planted_dir
    got = dedup.embedding_neardup(d, threshold=0.95).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    assert (0, 1) in pairs
    # oracle: all brute-force pairs >= 0.95 that share an LSH bucket; verify
    # no false positives at least
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ vn.T
    for a, b in pairs:
        assert sims[a, b] >= 0.95 - 1e-9


def test_fuzzy_dedup_planted(planted_dir):
    """End-to-end fuzzy dedup vs a brute-force transitive-closure oracle:
    clusters = connected components of the exact-Jaccard>=0.6 pair graph,
    component id = min doc_id, keep = canonical survivor."""
    d, texts, _ = planted_dir
    got = dedup.fuzzy_dedup(d).to_pandas().sort_values("doc_id")

    want_pairs = _brute_jaccard_pairs(texts, 3, 0.6)
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in want_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_comp = [find(i) for i in range(len(texts))]

    assert list(got["doc_id"]) == list(range(len(texts)))
    assert list(got["component"]) == want_comp
    assert list(got["keep"]) == [c == i for i, c in enumerate(want_comp)]
    # the planted cluster {0,1,2} collapses to one survivor
    surv = got[got["keep"]]
    assert len(surv) == len(texts) - 2


def test_fuzzy_dedup_join_path_matches_broadcast(planted_dir):
    """broadcast_limit=0 forces the hash-join label attach; it must equal
    the broadcast path row-for-row."""
    d, _, _ = planted_dir
    want = dedup.fuzzy_dedup(d).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    got = dedup.fuzzy_dedup(d, broadcast_limit=0).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_fuzzy_dedup_cc_engines_agree(planted_dir):
    """cc_engine='shard' (candidate subgraph through the CSR shard engine:
    temp graph dir + actor min-label supersteps) must label identically to
    the Dataset-engine CC — both converge to min vertex id per component."""
    d, _, _ = planted_dir
    want = dedup.fuzzy_dedup(d, cc_engine="dataset").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    got = dedup.fuzzy_dedup(d, cc_engine="shard").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_fuzzy_dedup_join_path_pathological(tmp_path):
    """A 50%-near-dup corpus (every even doc has an odd near-twin) through
    the join path: components/survivors vs the by-construction answer."""
    n_pairs = 25
    texts = []
    base_words = ("the quick brown fox jumps over the lazy dog and then "
                  "runs far away into the deep dark forest tonight while "
                  "stars shine bright above the quiet sleeping town").split()
    for i in range(n_pairs):
        rot = base_words[i % 5:] + base_words[:i % 5] + [f"tag{i}"] * 3
        texts.append(" ".join(rot))                    # doc 2i
        texts.append(" ".join(rot[:-1] + [f"tag{i}x"]))  # doc 2i+1 near-twin
    d = tmp_path / "half_dup"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(d / "documents.parquet"))

    got = dedup.fuzzy_dedup(str(d), broadcast_limit=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # oracle: brute-force transitive closure of exact-Jaccard>=0.6 pairs
    want_pairs = _brute_jaccard_pairs(texts, 3, 0.6)
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in want_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_comp = [find(i) for i in range(len(texts))]

    assert list(got["doc_id"]) == list(range(len(texts)))
    assert list(got["component"]) == want_comp
    assert list(got["keep"]) == [c == i for i, c in enumerate(want_comp)]
    # each planted twin pair landed in the same cluster (rotated texts may
    # also merge ACROSS pairs — the oracle, not the construction, is truth)
    assert all(want_comp[2 * i + 1] == want_comp[2 * i]
               for i in range(n_pairs))
    # and the corpus is genuinely dup-heavy: at most half survives
    assert got["keep"].sum() <= len(texts) // 2


def test_join_compaction_probe():
    """The version gate behind _nonempty_blocks: on this Ray (<=2.49.x the
    zero-row-block join raises ArrowInvalid) the probe must report that
    compaction is needed; env overrides short-circuit it. When a Ray
    upgrade makes this assert fail, the compaction barrier auto-retires —
    delete this test and _nonempty_blocks' slow path together."""
    import os

    dedup._JOIN_COMPACT_NEEDED = None          # force a fresh probe
    try:
        assert dedup._join_compaction_needed() is True
        os.environ["METIS_RAY_JOIN_COMPACT"] = "never"
        assert dedup._join_compaction_needed() is False
        os.environ["METIS_RAY_JOIN_COMPACT"] = "always"
        assert dedup._join_compaction_needed() is True
    finally:
        os.environ.pop("METIS_RAY_JOIN_COMPACT", None)


def test_fingerprint_table_matches_singles(planted_dir):
    from metis_ray.pipelines import textstats
    d, _, _ = planted_dir
    both = textstats.fingerprint_table(d).to_pandas().sort_values("doc_id")
    md5 = textstats.fingerprints(d).to_pandas().sort_values("doc_id")
    roll = textstats.rolling_fingerprints(d).to_pandas().sort_values("doc_id")
    assert list(both["md5"]) == list(md5["md5"])
    assert list(both["rolling_min"]) == list(roll["rolling_min"])


def test_decontaminate_matches_bruteforce():
    """Engine (hash-partitioned joins over int64 gram hashes) vs a pure
    Python brute force over the raw gram STRINGS — same benchmark
    membership predicate, same n — exact flag equality for every doc."""
    import hashlib

    import pandas as pd

    from metis_ray.pipelines.dedup import decontaminate

    sf, n, pfx = "/root/testdata/sf0.001", 8, "10"
    got = (decontaminate(sf, n=n, bench_prefix_lt=pfx).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    def is_bench(i):
        return hashlib.md5(str(i).encode()).hexdigest()[:2] < pfx
    def grams(t):
        w = t.lower().split()
        return {" ".join(w[j:j + n]) for j in range(len(w) - n + 1)}
    bench_grams = set()
    for _, r in docs.iterrows():
        if is_bench(r.doc_id):
            bench_grams |= grams(r.text)
    want = {}
    for _, r in docs.iterrows():
        b = is_bench(r.doc_id)
        want[r.doc_id] = (b, bool(not b and (grams(r.text) & bench_grams)))

    assert len(got) == len(docs)
    for _, r in got.iterrows():
        wb, wc = want[r.doc_id]
        assert bool(r.is_benchmark) == wb, r.doc_id
        assert bool(r.contaminated) == wc, r.doc_id
    # the benchmark sample is non-trivial and something actually leaks
    assert got["is_benchmark"].sum() > 0
    assert got["contaminated"].sum() > 0


def test_substring_dedup_matches_bruteforce():
    """Winnowing candidates + verbatim verification vs brute-force ALL-PAIRS
    common-32-byte-substring ground truth (inverted window index).  The
    winnowing guarantee is deterministic, so with zero dropped buckets the
    pair sets must be EXACTLY equal — recall and precision both 1."""
    from collections import defaultdict

    import pandas as pd

    from metis_ray.pipelines.dedup import substring_dedup

    sf, L = "/root/testdata/sf0.001", 32
    stats = {}
    got = substring_dedup(sf, min_len=L, stats=stats).to_pandas()
    assert stats["dropped_buckets"] == 0
    pairs_got = {(int(a), int(b)) for a, b in zip(got["a"], got["b"])}

    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    inv = defaultdict(set)
    for r in docs.itertuples():
        d = r.text.encode("utf-8", "ignore")
        for i in range(len(d) - L + 1):
            inv[d[i:i + L]].add(int(r.doc_id))
    want = set()
    for v in inv.values():
        if len(v) > 1:
            v = sorted(v)
            for i in range(len(v)):
                for j in range(i + 1, len(v)):
                    want.add((v[i], v[j]))
    assert pairs_got == want
    assert len(want) > 0                       # the oracle is non-trivial
    assert (got["shared_windows"] >= 1).all()


def test_semantic_dedup_planted(planted_dir):
    """SemDeDup: the planted near-identical vector pair (0, 1) lands in the
    same k-means cluster and is emitted; every emitted pair matches the
    brute-force ALL-PAIRS cosine oracle restricted to shared clusters
    (exact set equality — cluster co-membership is deterministic, the
    kmeans golden asserts assignment margins)."""
    d, _, vecs = planted_dir
    stats: dict = {}
    got = dedup.semantic_dedup(d, k=4, threshold=0.9,
                               stats=stats).to_pandas()
    assert stats["dropped_buckets"] == 0
    pairs = set(zip(got["a"].astype(int), got["b"].astype(int)))
    assert (0, 1) in pairs

    from metis_ray.pipelines.similarity import kmeans_clusters
    assign = (kmeans_clusters(d, k=4).to_pandas()
              .set_index("vec_id")["cluster"])
    v = vecs.astype(np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = vn @ vn.T
    want = {(a, b) for a in range(len(v)) for b in range(a + 1, len(v))
            if assign[a] == assign[b] and sims[a, b] >= 0.9}
    assert pairs == want
