"""Persisted partition-by-centroid IVF layout (pipelines/ivf_index.py)."""

import os

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_indexed_ivf_equals_onthefly(tmp_path):
    """Same quantizer params => the indexed query (reading only the probed
    list directories) returns IDENTICAL results to the full-scan variant."""
    from metis_ray.pipelines.ivf_index import ann_ivf_indexed_topk
    from metis_ray.pipelines.similarity import ann_ivf_topk

    idx_dir = str(tmp_path / "ivf_idx")
    got = ann_ivf_indexed_topk(SF, idx_dir, k=10, n_queries=5, nprobe=4)
    want = ann_ivf_topk(SF, k=10, n_queries=5, nprobe=4)
    key = lambda df: [tuple(r) for r in
                      df.sort_values(["query_id", "rnk"]).to_numpy()]
    assert key(got) == key(want)


def test_index_layout_and_idempotence(tmp_path):
    """One directory per list; every vector in exactly one list; a second
    build with unchanged inputs reuses the manifest (no rewrite)."""
    from metis_ray.pipelines.ivf_index import build_ivf_index

    idx_dir = str(tmp_path / "ivf_idx2")
    out = build_ivf_index(SF, idx_dir, n_centroids=8)
    vdir = os.path.join(out, "vectors")
    lists = sorted(d for d in os.listdir(vdir) if d.startswith("list_id="))
    assert 1 <= len(lists) <= 8
    n_rows = sum(
        pq.read_table(os.path.join(vdir, d)).num_rows for d in lists)
    n_src = pq.read_metadata(os.path.join(SF, "embeddings.parquet")).num_rows
    assert n_rows == n_src                      # partition, not sample

    mtime = os.path.getmtime(os.path.join(out, "manifest.json"))
    out2 = build_ivf_index(SF, idx_dir, n_centroids=8)
    assert out2 == out
    assert os.path.getmtime(os.path.join(out, "manifest.json")) == mtime


def test_indexed_ivf_nprobe_all_is_exact(tmp_path):
    """nprobe = n_centroids => reads every list => must equal exact
    brute-force top-k."""
    from metis_ray.pipelines.ivf_index import ann_ivf_indexed_topk
    from metis_ray.pipelines.similarity import ann_topk

    idx_dir = str(tmp_path / "ivf_idx3")
    got = ann_ivf_indexed_topk(SF, idx_dir, k=10, n_queries=5,
                               n_centroids=8, nprobe=8)
    want = ann_topk(SF, k=10, n_queries=5)
    key = lambda df: [tuple(r) for r in
                      df.sort_values(["query_id", "rnk"]).to_numpy()]
    assert key(got) == key(want)
