"""Ingest pipeline vs golden edges (set equality) + sha256 invariant +
quarantine counting — the F3/F6/F5 oracles from FIXTURES.md."""

import hashlib

import numpy as np
import pyarrow.parquet as pq
import pytest

from metis_ray.corpus import SCALES, generate
from metis_ray.pipelines.linkgraph import ingest


@pytest.fixture(scope="module")
def result(tiny_corpus_dir):
    return ingest(tiny_corpus_dir, collect_stats=True)


def _edge_set(tbl):
    return set(zip(tbl["src"].to_numpy(zero_copy_only=False),
                   tbl["dst"].to_numpy(zero_copy_only=False)))


def test_edges_match_golden(tiny_corpus_dir, result):
    import os
    golden = pq.read_table(os.path.join(tiny_corpus_dir, "golden_edges_file.parquet"))
    got = result.edges_file.to_pandas()
    got_set = set(zip(got["src"].astype("int64"), got["dst"].astype("int64")))
    gold_set = _edge_set(golden)
    missing = gold_set - got_set
    extra = got_set - gold_set
    assert not missing and not extra, (len(missing), len(extra))


def test_repo_edges_match_golden(tiny_corpus_dir, result):
    import os
    golden = pq.read_table(os.path.join(tiny_corpus_dir, "golden_edges_repo.parquet"))
    got = result.edges_repo.to_pandas()
    got_set = set(zip(got["src"].astype("int64"), got["dst"].astype("int64")))
    assert got_set == _edge_set(golden)


def test_sha256_invariant(result):
    """Every ingested row's sha256 equals an independent driver-side hash of
    the source content (the reference's lossless filecmp check, strengthened
    to per-row: tests/test_gst_ok.py:94-95)."""
    files = result.files.to_pandas()
    g = generate(SCALES["tiny"])
    src = {(r, p): c for r, p, c in zip(g.corpus["repo"].to_pylist(),
                                        g.corpus["path"].to_pylist(),
                                        g.corpus["content"].to_pylist())}
    assert len(files) == len(src)
    for r, p, h in zip(files["repo"], files["path"], files["sha256"]):
        assert h == hashlib.sha256(src[(r, p)].encode()).hexdigest()


def test_quarantine_counts(result):
    spec = SCALES["tiny"]
    assert result.stats["rows"] == spec.n_files + spec.malformed_rows
    # empty-content and binary-garbage and unknown-lang rows all quarantined
    assert result.stats["quarantined"] == spec.malformed_rows
    assert result.stats["resolved"] > 0
    assert result.stats["unresolved_or_self"] > 0  # ghost imports exist


def test_multiplicity_matches_golden(tiny_corpus_dir, result):
    """multiplicity = exact duplicate-import count, parallelism-independent
    (golden counts come straight from the generator's pre-dedup pair list)."""
    import os
    golden = pq.read_table(os.path.join(tiny_corpus_dir,
                                        "golden_edges_file.parquet"))
    gold = {(s, d): m for s, d, m in zip(
        golden["src"].to_numpy(zero_copy_only=False),
        golden["dst"].to_numpy(zero_copy_only=False),
        golden["multiplicity"].to_numpy(zero_copy_only=False))}
    got = result.edges_file.to_pandas()
    assert (got["multiplicity"] >= 1).all()
    for s, d, m in zip(got["src"].astype("int64"), got["dst"].astype("int64"),
                       got["multiplicity"]):
        assert gold[(s, d)] == m, (s, d, gold[(s, d)], m)


def test_repo_multiplicity_matches_golden(tiny_corpus_dir, result):
    import os
    golden = pq.read_table(os.path.join(tiny_corpus_dir,
                                        "golden_edges_repo.parquet"))
    gold = {(s, d): m for s, d, m in zip(
        golden["src"].to_numpy(zero_copy_only=False),
        golden["dst"].to_numpy(zero_copy_only=False),
        golden["multiplicity"].to_numpy(zero_copy_only=False))}
    got = result.edges_repo.to_pandas()
    for s, d, m in zip(got["src"].astype("int64"), got["dst"].astype("int64"),
                       got["multiplicity"]):
        assert gold[(s, d)] == m, (s, d, gold[(s, d)], m)


def test_join_strategy_matches_broadcast(tiny_corpus_dir, result):
    """The shuffle-join resolve path (symbol tables too big to broadcast)
    produces the identical deduped edge set + multiplicities."""
    from metis_ray.pipelines.linkgraph import ingest as _ingest
    jres = _ingest(tiny_corpus_dir, resolve_strategy="join")
    a = result.edges_file.to_pandas()
    b = jres.edges_file.to_pandas()
    key = lambda df: {(int(s), int(d)): int(m) for s, d, m in
                      zip(df["src"], df["dst"], df["multiplicity"])}
    assert key(a) == key(b)


def test_dense_id_scheme_matches_hash(tiny_corpus_dir, result):
    """id_scheme='dense' (rank of 128-bit digest — the collision-free path
    past the 63-bit birthday bound) produces ids that are exactly
    [0, n_files), a deterministic pure function of the file set, and an
    edge table isomorphic to the hash-id ingest under the key mapping."""
    from metis_ray.functions.hashing import hash64_one
    from metis_ray.pipelines.linkgraph import ingest as _ingest

    dres = _ingest(tiny_corpus_dir, id_scheme="dense")
    dense = dres.dense_ids.to_pandas()
    ids = np.sort(dense["dense_id"].to_numpy())
    assert (ids == np.arange(len(dense))).all()     # dense, unique, 0-based

    # edge sets isomorphic under key -> id mappings (incl. multiplicity)
    to_hash = {int(i): hash64_one(k)
               for k, i in zip(dense["key"], dense["dense_id"])}
    d = dres.edges_file.to_pandas()
    dmap = {(to_hash[int(s)], to_hash[int(t)]): int(m)
            for s, t, m in zip(d["src"], d["dst"], d["multiplicity"])}
    h = result.edges_file.to_pandas()
    hmap = {(int(s), int(t)): int(m)
            for s, t, m in zip(h["src"], h["dst"], h["multiplicity"])}
    assert dmap == hmap
    # repo re-attach went through the dense symbol join identically
    assert (set(zip(d["src_repo"], d["dst_repo"]))
            == set(zip(h["src_repo"], h["dst_repo"])))

    # files table carries dense vertex ids consistent with the hash table
    df = dres.files.to_pandas()
    hf = result.files.to_pandas()
    assert ({to_hash[int(v)] for v in df["vertex_id"]}
            == {int(v) for v in hf["vertex_id"]})

    # assignment is reproducible: a second independent run (fresh DAG,
    # possibly different block layout) lands the identical key -> id map
    dres2 = _ingest(tiny_corpus_dir, id_scheme="dense")
    dense2 = dres2.dense_ids.to_pandas()
    assert (dict(zip(dense["key"], dense["dense_id"]))
            == dict(zip(dense2["key"], dense2["dense_id"])))


def test_vertex_id_collision_guard():
    """A 63-bit id collision (one dst claimed by two modules) fails the
    symbol-table build loudly; build_symbol_table runs this check on every
    ingest."""
    import pyarrow as pa

    from metis_ray.stages.resolve import VertexIdCollision, check_id_collisions

    bad = pa.table({"module": ["a.x", "b.y"], "dst": [7, 7],
                    "dst_repo": ["r1", "r2"]})
    with pytest.raises(VertexIdCollision):
        check_id_collisions(bad)
    ok = pa.table({"module": ["a.x", "b.y"], "dst": [7, 8],
                   "dst_repo": ["r1", "r2"]})
    check_id_collisions(ok)   # no raise
    # same module key twice with the SAME id (ext-variant collapse) is fine
    dup = pa.table({"module": ["a.x", "a.x"], "dst": [7, 7],
                    "dst_repo": ["r1", "r1"]})
    check_id_collisions(dup)


def test_backup_lossless_roundtrip(tiny_corpus_dir, tmp_path):
    """The raw backup lands every row verbatim (the reference's /backup
    'no information lost' contract): content round-trips byte-identical and
    a re-run is a no-op."""
    import os

    import ray.data as rd
    from metis_ray.pipelines.linkgraph import backup_corpus

    out = str(tmp_path / "backup")
    info = backup_corpus(tiny_corpus_dir, out)
    src = pq.read_table(os.path.join(tiny_corpus_dir, "corpus",
                                     sorted(os.listdir(
                                         os.path.join(tiny_corpus_dir, "corpus")))[0]))
    assert info["rows"] == sum(
        pq.read_metadata(os.path.join(tiny_corpus_dir, "corpus", f)).num_rows
        for f in os.listdir(os.path.join(tiny_corpus_dir, "corpus")))
    back = rd.read_parquet(out).to_pandas().set_index(["repo", "path"])
    for r, p, c in zip(src["repo"].to_pylist(), src["path"].to_pylist(),
                       src["content"].to_pylist()):
        row = back.loc[(r, p)]
        assert row["content"] == c
        assert row["sha256"] == hashlib.sha256(c.encode()).hexdigest()
    # idempotent re-run short-circuits on the manifest
    assert backup_corpus(tiny_corpus_dir, out) == info


def test_join_ingest_driver_clean(tiny_corpus_dir, result, monkeypatch):
    """ingest(resolve_strategy='join') must never build the driver-side
    symbol table (the whole point of the join strategy) and must match the
    broadcast path bit-for-bit, repo names included."""
    import metis_ray.pipelines.linkgraph as lg

    def boom(*a, **k):
        raise AssertionError("build_symbol_table called under strategy='join'")

    monkeypatch.setattr(lg, "build_symbol_table", boom)
    jres = lg.ingest(tiny_corpus_dir, resolve_strategy="join")
    assert jres.symbols_ref is None
    a = result.edges_file.to_pandas()
    b = jres.edges_file.to_pandas()
    key = lambda df: {(int(s), int(d)): (sr, dr, int(m)) for s, d, sr, dr, m in
                      zip(df["src"], df["dst"], df["src_repo"],
                          df["dst_repo"], df["multiplicity"])}
    assert key(a) == key(b)
    # repo rollup flows through the joined edges too
    ra = result.edges_repo.to_pandas()
    rb = jres.edges_repo.to_pandas()
    assert key(ra) == key(rb)


def test_join_ingest_collision_guard(tiny_corpus_dir):
    """The distributed collision check matches the broadcast check's
    predicate: duplicate (module, dst) PAIRS are tolerated, one dst claimed
    by two distinct modules raises."""
    import ray.data as rd

    from metis_ray.stages.resolve import (VertexIdCollision,
                                          check_id_collisions_ds)
    import pyarrow as pa

    bad = rd.from_arrow(pa.table(
        {"module": ["a.x", "b.y"], "dst": [7, 7], "dst_repo": ["r1", "r2"]}))
    with pytest.raises(VertexIdCollision):
        check_id_collisions_ds(bad)
    dup = rd.from_arrow(pa.table(
        {"module": ["a.x", "a.x"], "dst": [7, 7], "dst_repo": ["r1", "r1"]}))
    check_id_collisions_ds(dup)   # no raise
