"""Product quantization (similarity.ann_pq_topk): recall against the
exact brute-force result, batch-invariance of the ADC math (the property
that makes the sequential golden an exact twin), and the codebook
trainer's determinism."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _recall(exact, approx) -> float:
    ex = exact.groupby("query_id")["neighbor_id"].apply(set)
    gq = approx.groupby("query_id")["neighbor_id"].apply(set)
    hit = sum(len(ex[q] & gq.get(q, set())) for q in ex.index)
    return hit / sum(len(v) for v in ex.values)


def test_pq_recall_beats_floor(ray_session):
    from metis_ray.pipelines.similarity import ann_pq_topk, ann_topk

    rec = _recall(ann_topk(SF), ann_pq_topk(SF))
    # measured 0.74 at sf0.001 with the default PQ8x8 codebooks; random
    # selection would score k/n = 10/500 = 0.02
    assert rec >= 0.6, rec


def test_pq_more_codewords_never_hurts_much(ray_session):
    """Coarser codebooks must not beat finer ones by a margin — the
    monotonicity sanity check on the quantizer (small inversions are
    legitimate sampling noise; a large one means a broken trainer)."""
    from metis_ray.pipelines.similarity import ann_pq_topk, ann_topk

    exact = ann_topk(SF)
    r16 = _recall(exact, ann_pq_topk(SF, ksub=16))
    r256 = _recall(exact, ann_pq_topk(SF, ksub=256))
    assert r256 >= r16 - 0.05, (r16, r256)


def test_pq_matches_sequential_golden(ray_session):
    """Engine result row-for-row equal to the independent sequential
    transcription — the batch-invariance contract the DuckDB twin
    relies on."""
    from metis_ray.goldens import _ann_pq_golden
    from metis_ray.pipelines.similarity import ann_pq_topk

    eng = ann_pq_topk(SF).sort_values(["query_id", "rnk"]
                                      ).reset_index(drop=True)
    et = pq.read_table(f"{SF}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    ids = et["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.vstack([np.asarray(v, np.float64)
                     for v in et["embedding"].to_pylist()])
    gold = (_ann_pq_golden(SF, ids, mat).to_pandas()
            .sort_values(["query_id", "rnk"]).reset_index(drop=True))
    assert (eng["neighbor_id"].to_numpy()
            == gold["neighbor_id"].to_numpy()).all()


def test_pq_encode_is_batch_invariant():
    from metis_ray.pipelines.similarity import _kmeans_l2, _pq_encode

    rng = np.random.RandomState(5)
    mat = rng.normal(size=(200, 32))
    books = np.stack([_kmeans_l2(mat[:100, j * 8:(j + 1) * 8], 16, 5, j)
                      for j in range(4)])
    whole = _pq_encode(mat, books)
    parts = np.vstack([_pq_encode(mat[:37], books),
                       _pq_encode(mat[37:141], books),
                       _pq_encode(mat[141:], books)])
    assert (whole == parts).all()


def test_pq_rejects_indivisible_dim(ray_session, tmp_path):
    import pyarrow as pa

    from metis_ray.pipelines.similarity import train_pq_codebooks
    t = pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                  "embedding": pa.array([[0.1] * 9, [0.2] * 9],
                                        pa.list_(pa.float32()))})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, str(sf / "embeddings.parquet"))
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(str(sf), 4, 4, 2, 10, 0)


def test_ivfpq_recall_and_pruning(ray_session):
    """IVFADC recall floor vs exact, upper-bounded by the pure-PQ recall
    (pruning can only remove candidates), and nprobe=all == pure PQ
    exactly (the pruning-off identity)."""
    from metis_ray.pipelines.similarity import (ann_ivfpq_topk,
                                                ann_pq_topk, ann_topk)

    exact = ann_topk(SF)
    pq_only = ann_pq_topk(SF)
    ivfpq = ann_ivfpq_topk(SF)
    r_pq = _recall(exact, pq_only)
    r_ivfpq = _recall(exact, ivfpq)
    assert r_ivfpq >= 0.4, r_ivfpq                 # measured 0.6+ here
    assert r_ivfpq <= r_pq + 1e-9, (r_ivfpq, r_pq)
    allprobe = ann_ivfpq_topk(SF, nprobe=16)       # = every list
    a = allprobe.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    b = pq_only.sort_values(["query_id", "rnk"]).reset_index(drop=True)
    assert (a["neighbor_id"].to_numpy() == b["neighbor_id"].to_numpy()).all()


def test_ivfpq_indexed_equals_on_the_fly(ray_session):
    """The persisted-index IVFADC must return exactly the on-the-fly
    result (write-time codes == batch-recomputed codes: _pq_encode is
    batch-invariant), which transitively ties it to the sequential
    golden."""
    from metis_ray.pipelines.ivf_index import ann_ivfpq_indexed_topk
    from metis_ray.pipelines.similarity import ann_ivfpq_topk

    a = (ann_ivfpq_indexed_topk(SF)
         .sort_values(["query_id", "rnk"]).reset_index(drop=True))
    b = (ann_ivfpq_topk(SF)
         .sort_values(["query_id", "rnk"]).reset_index(drop=True))
    assert (a["neighbor_id"].to_numpy() == b["neighbor_id"].to_numpy()).all()


def test_ivfpq_index_code_column_is_small(ray_session):
    """The ADC read path's bytes claim, measured: the code column's
    total compressed size across the index part files must be far below
    the embedding column's (raw ratio 32x at PQ8x8 over 64-d float32;
    assert a conservative 5x through parquet encoding)."""
    import glob
    import os

    import pyarrow.parquet as pqt

    from metis_ray.pipelines.ivf_index import build_ivf_index
    idx = build_ivf_index(SF)
    code_b = emb_b = 0
    for f in glob.glob(os.path.join(idx, "vectors", "*", "*.parquet")):
        meta = pqt.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                path = col.path_in_schema
                if path.startswith("code"):
                    code_b += col.total_compressed_size
                elif path.startswith("embedding"):
                    emb_b += col.total_compressed_size
    assert code_b > 0 and emb_b > 0
    assert emb_b / code_b > 5, (emb_b, code_b)
