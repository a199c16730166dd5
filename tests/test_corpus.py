"""Corpus generator invariants: determinism, shape, golden-edge sanity."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from metis_ray.corpus import SCALES, generate, materialize_scale


def test_deterministic():
    a = generate(SCALES["tiny"])
    b = generate(SCALES["tiny"])
    assert a.corpus.equals(b.corpus)
    assert a.edges_file.equals(b.edges_file)


def test_shapes_and_golden():
    g = generate(SCALES["tiny"])
    spec = SCALES["tiny"]
    assert g.corpus.num_rows == spec.n_files + spec.malformed_rows
    assert g.corpus.column_names == ["repo", "path", "commit", "lang", "content"]
    assert g.modules.num_rows == spec.n_files
    # edges: no self loops, all vertices drawn from the file id space
    src = g.edges_file["src"].to_numpy()
    dst = g.edges_file["dst"].to_numpy()
    assert (src != dst).all()
    # repo edges cross repos only
    sr = g.edges_repo["src_repo"].to_pylist()
    dr = g.edges_repo["dst_repo"].to_pylist()
    assert all(a != b for a, b in zip(sr, dr))
    # isolated repos appear in no cross-repo edge
    iso = {f"org{i % spec.n_orgs}/repo{i}"
           for i in range(spec.n_repos - spec.n_isolated_repos, spec.n_repos)}
    assert not (set(sr) | set(dr)) & iso


def test_materialize_idempotent(tmp_path):
    root = str(tmp_path)
    d1 = materialize_scale("tiny", root=root)
    m1 = os.path.getmtime(os.path.join(d1, "manifest.json"))
    d2 = materialize_scale("tiny", root=root)
    assert d1 == d2
    assert os.path.getmtime(os.path.join(d2, "manifest.json")) == m1
    t = pq.read_table(os.path.join(d1, "corpus"))
    assert t.num_rows == SCALES["tiny"].n_files + SCALES["tiny"].malformed_rows
