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
                                            _pq_encode, _query_matrix,
                                            train_coarse_quantizer,
                                            train_pq_codebooks)
from metis_ray.sources.parquet import read_table

INDEX_ROOT = os.environ.get("METIS_RAY_IVF_DIR", "/tmp/metis_ray_ivf")


def build_ivf_index(sf_dir: str, index_dir: str | None = None, *,
                    n_centroids: int = 16, iters: int = 8,
                    sample_size: int = 2048, seed: int = 42,
                    m: int = 8, ksub: int = 256,
                    pq_iters: int = 10) -> str:
    """Train the coarse quantizer AND the PQ codebooks, then ONE
    streaming pass assigns every vector, encodes its m-byte PQ code, and
    writes the table hive-partitioned by list id — each part file holds
    the exact vector (rerank path) AND the code (ADC path, 32x smaller
    reads). Idempotent: an index whose manifest matches (source mtime +
    params) is reused."""
    if index_dir is None:
        name = os.path.basename(os.path.normpath(sf_dir))
        index_dir = os.path.join(
            INDEX_ROOT,
            f"{name}_c{n_centroids}_i{iters}_s{seed}_ss{sample_size}"
            f"_pq{m}x{ksub}i{pq_iters}")
    man_path = os.path.join(index_dir, "manifest.json")
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    sig = {"src": emb_path, "mtime": os.path.getmtime(emb_path),
           "n_centroids": n_centroids, "iters": iters,
           "sample_size": sample_size, "seed": seed,
           "m": m, "ksub": ksub, "pq_iters": pq_iters,
           "fmt": 3}   # bump when the layout schema changes (3: code col)
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
    books = train_pq_codebooks(sf_dir, m, ksub, pq_iters, sample_size,
                               seed)
    np.savez(os.path.join(tmp, "codebooks.npz"), codebooks=books)

    cref = ray.put((cents, books))

    def assign(batch: pa.Table) -> pa.Table:
        cc, bks = ray.get(cref)
        mat = _normalize(_embedding_matrix(batch["embedding"]))
        lists = pa.array(np.argmax(mat @ cc.T, axis=1).astype(np.int64),
                         pa.int64())
        codes = _pq_encode(mat, bks).astype(np.uint8)
        code_col = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), pa.uint8()), bks.shape[0])
        # list_id twice: the partition column (consumed by the hive write)
        # AND a regular data column (`list_id_d`) that survives inside the
        # part files — readers filter on the WRITE-TIME assignment, never a
        # recomputed argmax (BLAS rounding can differ across batch shapes,
        # so recomputation could silently flip a near-tie row's list).
        # `code` is the WRITE-TIME PQ encoding for the same reason.
        return (batch.append_column("list_id", lists)
                .append_column("list_id_d", lists)
                .append_column("code", code_col))

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


def ann_ivfpq_indexed_topk(sf_dir: str, index_dir: str | None = None, *,
                           k: int = 10, n_queries: int = 5,
                           nprobe: int = 4, n_centroids: int = 16,
                           iters: int = 8, sample_size: int = 2048,
                           seed: int = 42, m: int = 8, ksub: int = 256,
                           pq_iters: int = 10) -> pd.DataFrame:
    """IVFADC over the PERSISTED layout — the full 10^12-vector serving
    path: directory pruning reads only the probed lists off storage, and
    within them only (vec_id, code, list_id_d) — the m-byte codes, not
    the vectors, so the scan moves ~32x fewer bytes than the exact
    rerank. ADC scoring against the write-time codes; equal to the
    on-the-fly ``similarity.ann_ivfpq_topk`` with the same parameters
    (tested), which ties it to the sequential IVFADC golden."""
    idx = build_ivf_index(sf_dir, index_dir, n_centroids=n_centroids,
                          iters=iters, sample_size=sample_size, seed=seed,
                          m=m, ksub=ksub, pq_iters=pq_iters)
    cents = np.load(os.path.join(idx, "centroids.npz"))["centroids"]
    books = np.load(os.path.join(idx, "codebooks.npz"))["codebooks"]
    dsub = books.shape[2]

    qids, qm = _query_matrix(sf_dir, n_queries)
    qn = _normalize(qm)
    qprobe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]

    needed = sorted({int(c) for row in qprobe for c in row})
    dirs = [os.path.join(idx, "vectors", f"list_id={c}") for c in needed]
    paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not paths:
        return pd.DataFrame({"query_id": [], "neighbor_id": [], "rnk": []})
    qref = ray.put((qids, qn, qprobe, books))
    emb = rd.read_parquet(paths, columns=["vec_id", "code", "list_id_d"])

    def topk(batch: pa.Table) -> pa.Table:
        ids_q, qmat, probe, bks = ray.get(qref)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        code_col = batch["code"]
        if isinstance(code_col, pa.ChunkedArray):
            code_col = code_col.combine_chunks()
        codes = (code_col.flatten().to_numpy(zero_copy_only=False)
                 .astype(np.int64).reshape(len(vids), -1))
        assign = batch["list_id_d"].to_numpy(zero_copy_only=False)
        o_q, o_n, o_s = [], [], []
        for qi in range(qmat.shape[0]):
            cand = np.flatnonzero(np.isin(assign, probe[qi]))
            if len(cand) == 0:
                continue
            lut = np.stack([
                bks[j] @ qmat[qi, j * dsub:(j + 1) * dsub]
                for j in range(bks.shape[0])])
            scores = np.zeros(len(cand), np.float64)
            for j in range(bks.shape[0]):
                scores += lut[j, codes[cand, j]]
            pre = _exact_topk_rows(scores, vids[cand], k)
            o_q.extend([int(ids_q[qi])] * len(pre))
            o_n.extend(int(v) for v in vids[cand[pre]])
            o_s.extend(float(scores[j]) for j in pre)
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
