"""Count-Min sketch (functions/sketch.py): the published guarantees —
never undercounts, overcount bounded by (e/width)*total with probability
1-e^-depth, and EXACT linearity under merge (the property the distributed
tree-merge in textstats.term_counts_cms relies on)."""

import numpy as np
import pytest

from metis_ray.functions.sketch import (CM_DEPTH, cms_add, cms_merge,
                                        cms_new, cms_query)


def _zipf_stream(n=20_000, vocab=2_000, seed=3):
    rng = np.random.RandomState(seed)
    ranks = rng.zipf(1.3, n)
    ranks = ranks[ranks <= vocab]
    return np.array([f"term_{r}" for r in ranks], dtype=object)


def _exact(items):
    u, c = np.unique(items, return_counts=True)
    return u, c.astype(np.int64)


def test_cms_never_undercounts_and_eps_bound():
    items = _zipf_stream()
    u, c = _exact(items)
    width = 4096
    sk = cms_add(cms_new(width), u, c)
    est = cms_query(sk, u)
    assert (est >= c).all()                      # one-sided by construction
    # Markov bound per row: expected overcount <= total/width; the min of
    # CM_DEPTH independent rows beats e/width*total w.p. 1 - e^-depth.
    # With 20k items over 4096 counters the bound is loose; assert it
    # strictly for EVERY query (not just in expectation).
    total = int(c.sum())
    assert (est - c <= np.e * total / width).all()


def test_cms_exact_linearity_under_merge():
    items = _zipf_stream(seed=7)
    u, c = _exact(items)
    width = 1024
    whole = cms_add(cms_new(width), u, c)
    # split the exact counts three ways, sketch each part, fold in an
    # arbitrary tree shape: CMS is linear, so equality is EXACT
    parts = []
    for i in range(3):
        sel = np.arange(len(u)) % 3 == i
        parts.append(cms_add(cms_new(width), u[sel], c[sel]))
    folded = cms_merge(cms_merge(parts[0], parts[2]), parts[1])
    assert (folded == whole).all()


def test_cms_small_vocab_is_exact():
    """The registered docs_term_counts_cms twin is exact because the
    synthetic vocabulary can't collide in all CM_DEPTH rows at
    width=8192 — replicate that regime and assert exactness."""
    vocab = np.array([f"w{i}" for i in range(64)], dtype=object)
    rng = np.random.RandomState(11)
    counts = rng.randint(1, 1000, len(vocab)).astype(np.int64)
    sk = cms_add(cms_new(8192), vocab, counts)
    assert (cms_query(sk, vocab) == counts).all()


def test_cms_pipeline_matches_exact_counts(ray_session):
    from metis_ray.pipelines.textstats import term_counts_cms

    sf = "/root/testdata/sf0.001"
    got = term_counts_cms(sf)
    import pyarrow.parquet as pq
    texts = pq.read_table(f"{sf}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    words: list = []
    for t in texts:
        words.extend(t.lower().split())
    u, c = _exact(np.asarray(words, dtype=object))
    exact = dict(zip(u.tolist(), c.tolist()))
    for r in got.itertuples():
        assert r.approx_count >= exact.get(r.term, 0)
    # collision-free regime (the twin's precondition): exact equality
    for r in got.itertuples():
        assert r.approx_count == exact.get(r.term, 0), r.term
