"""IVF-flat with a PERSISTED partition-by-centroid layout — the true-scale
ANN path.

``ann_ivf_topk`` (pipelines/similarity.py) exercises the IVF math but scans
the whole table per query batch, assigning rows to lists on the fly. At
10^12 rows the assignment is precomputed: this module writes the vector
table hive-partitioned by coarse-quantizer list id (one parquet directory
per list), so a query READS only its ``nprobe`` lists off storage —
``read_parquet`` path pruning, the "prune at the read" scale rule — and
re-ranks those exactly. nprobe/n_centroids of the bytes leave disk; nothing
else is touched.

Layout (idempotent by manifest: embeddings mtime + quantizer params):

    <index_dir>/
      centroids.npz          # the trained coarse quantizer (float64 (k,d))
      manifest.json
      vectors/list_id=<c>/*.parquet

The quantizer is the same deterministic Lloyd trainer ``ann_ivf_topk`` uses
(same sample, same seed), so with equal parameters the indexed query returns
IDENTICAL results to the on-the-fly variant — tested.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from metis_ray.pipelines.similarity import (_embedding_matrix, _exact_topk_rows,
                                            _kmeans_lloyd, _normalize,
                                            _query_matrix)
from metis_ray.sources.parquet import read_table

INDEX_ROOT = os.environ.get("METIS_RAY_IVF_DIR", "/tmp/metis_ray_ivf")


def _train_quantizer(sf_dir: str, n_centroids: int, iters: int,
                     sample_size: int, seed: int) -> np.ndarray:
    """The identical deterministic trainer ann_ivf_topk uses: first
    ``sample_size`` rows by file order, normalized, Lloyd iterations."""
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    sample_tbl = next(pf.iter_batches(batch_size=sample_size,
                                      columns=["embedding"]))
    sample = _normalize(_embedding_matrix(sample_tbl["embedding"]))
    return _kmeans_lloyd(sample, n_centroids, iters, seed)


def build_ivf_index(sf_dir: str, index_dir: str | None = None, *,
                    n_centroids: int = 16, iters: int = 8,
                    sample_size: int = 2048, seed: int = 42) -> str:
    """Train the coarse quantizer, then ONE streaming pass assigns every
    vector and writes the table hive-partitioned by list id. Idempotent:
    an index whose manifest matches (source mtime + params) is reused."""
    if index_dir is None:
        name = os.path.basename(os.path.normpath(sf_dir))
        index_dir = os.path.join(
            INDEX_ROOT, f"{name}_c{n_centroids}_i{iters}_s{seed}")
    man_path = os.path.join(index_dir, "manifest.json")
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    sig = {"src": emb_path, "mtime": os.path.getmtime(emb_path),
           "n_centroids": n_centroids, "iters": iters,
           "sample_size": sample_size, "seed": seed}
    if os.path.exists(man_path):
        with open(man_path) as fh:
            if json.load(fh) == sig:
                return index_dir

    cents = _train_quantizer(sf_dir, n_centroids, iters, sample_size, seed)
    tmp = index_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    np.savez(os.path.join(tmp, "centroids.npz"), centroids=cents)

    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        mat = _normalize(_embedding_matrix(batch["embedding"]))
        lists = np.argmax(mat @ cc.T, axis=1).astype(np.int64)
        return batch.append_column("list_id", pa.array(lists, pa.int64()))

    (read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
     .map_batches(assign, batch_format="pyarrow")
     .write_parquet(os.path.join(tmp, "vectors"),
                    partition_cols=["list_id"]))

    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump(sig, fh)
    if os.path.exists(index_dir):
        shutil.rmtree(index_dir)
    os.replace(tmp, index_dir)
    return index_dir


def ann_ivf_indexed_topk(sf_dir: str, index_dir: str | None = None, *,
                         k: int = 10, n_queries: int = 5, nprobe: int = 4,
                         n_centroids: int = 16, iters: int = 8,
                         sample_size: int = 2048,
                         seed: int = 42) -> pd.DataFrame:
    """IVF top-k over the persisted layout: only the union of the queries'
    ``nprobe`` probe lists is READ (directory-level pruning); candidates are
    re-ranked exactly with the same threshold-exact tie handling as
    ``ann_topk``. Same output schema (query_id, neighbor_id, rnk); equal to
    ``ann_ivf_topk`` with the same quantizer parameters — tested."""
    idx = build_ivf_index(sf_dir, index_dir, n_centroids=n_centroids,
                          iters=iters, sample_size=sample_size, seed=seed)
    cents = np.load(os.path.join(idx, "centroids.npz"))["centroids"]

    qids, qm = _query_matrix(sf_dir, n_queries)
    qn = _normalize(qm)
    qprobe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]   # (Q, nprobe)

    # READ PRUNING: list the union of probe directories; everything else
    # stays on storage
    needed = sorted({int(c) for row in qprobe for c in row})
    dirs = [os.path.join(idx, "vectors", f"list_id={c}") for c in needed]
    paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not paths:
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "rnk": []})
    # hive partition value comes back as a column via dataset partitioning;
    # read the files directly and re-derive list_id per batch is avoidable —
    # the probe filter below recomputes membership from the directory split,
    # so the column isn't needed.
    qref = ray.put((qids, qn, qprobe))
    emb = rd.read_parquet(paths, columns=["vec_id", "embedding"])

    # per-batch assignment against the (tiny) centroid matrix recovers each
    # row's list id — cheaper than shipping the hive column through and
    # identical by construction (same centroids that wrote the layout)
    cref = ray.put(cents)

    def topk(batch: pa.Table) -> pa.Table:
        ids_q, qmat, probe = ray.get(qref)
        cc = ray.get(cref)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mat = _normalize(_embedding_matrix(batch["embedding"]))
        assign = np.argmax(mat @ cc.T, axis=1)
        o_q, o_n, o_s = [], [], []
        for qi in range(qmat.shape[0]):
            cand = np.flatnonzero(np.isin(assign, probe[qi]))
            if len(cand) == 0:
                continue
            row = mat[cand] @ qmat[qi]
            pre = _exact_topk_rows(row, vids[cand], k)
            o_q.extend([int(ids_q[qi])] * len(pre))
            o_n.extend(int(v) for v in vids[cand[pre]])
            o_s.extend(float(row[j]) for j in pre)
        return pa.table({"query_id": pa.array(o_q, pa.int64()),
                         "neighbor_id": pa.array(o_n, pa.int64()),
                         "score": pa.array(o_s, pa.float64())})

    partials = emb.map_batches(topk, batch_format="pyarrow").to_pandas()
    if len(partials) == 0:
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "rnk": []})
    partials.sort_values(["query_id", "score", "neighbor_id"],
                         ascending=[True, False, True], inplace=True)
    out = partials.groupby("query_id", sort=True).head(k).copy()
    out["rnk"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "neighbor_id", "rnk"]].reset_index(drop=True)
