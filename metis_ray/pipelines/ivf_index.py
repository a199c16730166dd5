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

The quantizer is the SHARED deterministic trainer
(``similarity.train_coarse_quantizer`` — one implementation, two consumers),
so with equal parameters the indexed query returns the same results as the
on-the-fly variant (tested). Readers filter on the WRITE-TIME list
assignment persisted in the part files (``list_id_d``), never a recomputed
argmax, so the index is self-consistent even for near-tie vectors whose
assignment a differently-shaped GEMM could round the other way.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from metis_ray.pipelines.similarity import (_embedding_matrix,
                                            _exact_topk_rows, _normalize,
                                            _query_matrix,
                                            train_coarse_quantizer)
from metis_ray.sources.parquet import read_table

INDEX_ROOT = os.environ.get("METIS_RAY_IVF_DIR", "/tmp/metis_ray_ivf")


def build_ivf_index(sf_dir: str, index_dir: str | None = None, *,
                    n_centroids: int = 16, iters: int = 8,
                    sample_size: int = 2048, seed: int = 42) -> str:
    """Train the coarse quantizer, then ONE streaming pass assigns every
    vector and writes the table hive-partitioned by list id. Idempotent:
    an index whose manifest matches (source mtime + params) is reused."""
    if index_dir is None:
        name = os.path.basename(os.path.normpath(sf_dir))
        index_dir = os.path.join(
            INDEX_ROOT,
            f"{name}_c{n_centroids}_i{iters}_s{seed}_ss{sample_size}")
    man_path = os.path.join(index_dir, "manifest.json")
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    sig = {"src": emb_path, "mtime": os.path.getmtime(emb_path),
           "n_centroids": n_centroids, "iters": iters,
           "sample_size": sample_size, "seed": seed,
           "fmt": 2}   # bump when the layout schema changes (2: list_id_d)
    if os.path.exists(man_path):
        with open(man_path) as fh:
            if json.load(fh) == sig:
                return index_dir

    cents = train_coarse_quantizer(sf_dir, n_centroids, iters,
                                   sample_size, seed)
    tmp = index_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    np.savez(os.path.join(tmp, "centroids.npz"), centroids=cents)

    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cref)
        mat = _normalize(_embedding_matrix(batch["embedding"]))
        lists = pa.array(np.argmax(mat @ cc.T, axis=1).astype(np.int64),
                         pa.int64())
        # list_id twice: the partition column (consumed by the hive write)
        # AND a regular data column (`list_id_d`) that survives inside the
        # part files — readers filter on the WRITE-TIME assignment, never a
        # recomputed argmax (BLAS rounding can differ across batch shapes,
        # so recomputation could silently flip a near-tie row's list)
        return (batch.append_column("list_id", lists)
                .append_column("list_id_d", lists))

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
    qref = ray.put((qids, qn, qprobe))
    # `list_id_d` is the WRITE-TIME assignment persisted inside the part
    # files: the per-query probe filter uses it directly, so a row read off
    # a probed directory can never be silently dropped by a recomputed
    # argmax rounding differently than the one that placed it there
    emb = rd.read_parquet(paths, columns=["vec_id", "embedding", "list_id_d"])

    def topk(batch: pa.Table) -> pa.Table:
        ids_q, qmat, probe = ray.get(qref)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mat = _normalize(_embedding_matrix(batch["embedding"]))
        assign = batch["list_id_d"].to_numpy(zero_copy_only=False)
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
