"""Deduplication suite over the ``documents`` table.

Reference analogue: exact dedup of imports by name with a scaffolded
content-hash compare (``Metis/tools/HDF5Helper.py:53-69``).  Here dedup is a
first-class operator family for training-data curation:

* exact:        sha256(text) -> hash-partition groupby -> keep min doc_id
* minhash-LSH:  word-shingles -> 64-perm MinHash -> banded LSH buckets ->
                candidate pairs -> exact-Jaccard verification
* simhash:      64-bit SimHash -> 16-bit chunk buckets (Hamming<=3 within
                any identical chunk by pigeonhole over 4 chunks) -> verify
* ngram-jaccard: character-n-gram shingles through the same LSH harness
* embedding:    random-hyperplane LSH over the embedding column -> exact
                cosine verification

Scale shape: candidate generation is shuffle-only (`groupby` on bucket keys,
fed by per-batch signature computation in actor pools); verification fetches
only the candidate documents (a small side) and broadcasts them — never the
corpus.  Each stage streams; nothing materializes the full table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from metis_ray.functions.hashing import hash64, minhash_signature, sha256_hex
from metis_ray.functions.text import jaccard, simhash64, word_shingles
from metis_ray.sources.parquet import read_table


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str) -> rd.Dataset:
    """(h, keep_id, n_dups): one row per distinct text; keep_id = min doc_id.
    SQL-oracle: GROUP BY sha256(text)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        return pa.table({
            "h": pa.array(sha256_hex(batch["text"].to_pylist()), pa.string()),
            "doc_id": batch["doc_id"],
        })

    return (docs.map_batches(add_hash, batch_format="pyarrow")
            .groupby("h")
            .aggregate(Min("doc_id", alias_name="keep_id"),
                       Count(alias_name="n_dups")))


# ---------------------------------------------------------------------------
# LSH candidate harness (shared by minhash / simhash / ngram / embedding)
# ---------------------------------------------------------------------------

def _pairs_from_buckets(buckets: rd.Dataset, id_col: str = "doc_id",
                        max_bucket: int = 200) -> rd.Dataset:
    """bucket rows (bkey, id) -> distinct candidate pairs (a < b).

    Buckets larger than ``max_bucket`` are dropped AND counted in a warning
    column upstream of verification (degenerate buckets — e.g. empty docs —
    would emit O(n^2) pairs; the cap is the skew guard). Emitted pairs are
    deduped by a groupby."""

    def to_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group[id_col].to_numpy(zero_copy_only=False))
        if len(ids) < 2 or len(ids) > max_bucket:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pa.table({"a": pa.array(ids[ii], pa.int64()),
                         "b": pa.array(ids[jj], pa.int64())})

    pairs = buckets.groupby("bkey").map_groups(to_pairs, batch_format="pyarrow")
    return (pairs.groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"]))


class _ShingleSigs:
    """Actor-pool stage: text -> banded MinHash bucket rows."""

    def __init__(self, mode: str, num_perm: int, bands: int, k: int) -> None:
        assert num_perm % bands == 0
        self.mode = mode          # 'word' or 'char'
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = k

    def _shingles(self, text: str) -> list[str]:
        if self.mode == "word":
            return word_shingles(text, self.k)
        t = text.lower()
        if len(t) < self.k:
            return [t] if t else []
        return [t[i:i + self.k] for i in range(len(t) - self.k + 1)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        o_key: list[int] = []
        o_id: list[int] = []
        for did, text in zip(ids, texts):
            sig = minhash_signature(self._shingles(text), self.num_perm)
            for b in range(self.bands):
                band = sig[b * self.rows:(b + 1) * self.rows]
                bkey = hash64([f"{b}:" + band.tobytes().hex()])[0]
                o_key.append(int(bkey))
                o_id.append(int(did))
        return pa.table({"bkey": pa.array(o_key, pa.int64()),
                         "doc_id": pa.array(o_id, pa.int64())})


def _verify_jaccard(pairs: rd.Dataset, sf_dir: str, mode: str, k: int,
                    threshold: float) -> rd.Dataset:
    """Exact-Jaccard verification: fetch only candidate docs, broadcast their
    shingle sets, score pairs in map_batches."""
    pairs_tbl = pairs.materialize()
    cand = pairs_tbl.to_pandas()
    if len(cand) == 0:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    need = set(cand["a"]) | set(cand["b"])
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def pick(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["doc_id"], value_set=pa.array(sorted(need), pa.int64()))
        return batch.filter(m)

    small = docs.map_batches(pick, batch_format="pyarrow").to_pandas()
    sh = {}
    for did, text in zip(small["doc_id"], small["text"]):
        if mode == "word":
            sh[did] = set(word_shingles(text, k))
        else:
            t = text.lower()
            sh[did] = set(t[i:i + k] for i in range(max(1, len(t) - k + 1)))
    ref = ray.put(sh)

    def score(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        j = np.array([jaccard(s[x], s[y]) for x, y in zip(a, b)])
        t = pa.table({"a": batch["a"], "b": batch["b"],
                      "jaccard": pa.array(np.round(j, 6), pa.float64())})
        return t.filter(pc.greater_equal(t["jaccard"], pa.scalar(threshold)))

    return pairs_tbl.map_batches(score, batch_format="pyarrow")


def minhash_dedup(sf_dir: str, *, num_perm: int = 64, bands: int = 16,
                  shingle_k: int = 3, threshold: float = 0.6,
                  concurrency: int = 2) -> rd.Dataset:
    """Near-duplicate pairs by word-shingle MinHash-LSH: (a, b, jaccard)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    buckets = docs.map_batches(
        _ShingleSigs, fn_constructor_args=("word", num_perm, bands, shingle_k),
        batch_format="pyarrow", concurrency=concurrency)
    pairs = _pairs_from_buckets(buckets)
    return _verify_jaccard(pairs, sf_dir, "word", shingle_k, threshold)


def ngram_jaccard_dedup(sf_dir: str, *, num_perm: int = 64, bands: int = 16,
                        ngram_k: int = 8, threshold: float = 0.8,
                        concurrency: int = 2) -> rd.Dataset:
    """Near-duplicate pairs by character-n-gram Jaccard through the same
    MinHash-LSH harness."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    buckets = docs.map_batches(
        _ShingleSigs, fn_constructor_args=("char", num_perm, bands, ngram_k),
        batch_format="pyarrow", concurrency=concurrency)
    pairs = _pairs_from_buckets(buckets)
    return _verify_jaccard(pairs, sf_dir, "char", ngram_k, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class _SimhashChunks:
    """text -> (chunk bucket rows, signature). 4 chunks of 16 bits: any two
    docs with Hamming distance <= 3 share at least one chunk (pigeonhole)."""

    N_CHUNKS = 4

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        o_key, o_id, o_sig = [], [], []
        for did, text in zip(ids, texts):
            sig = simhash64(text.lower().split())
            for c in range(self.N_CHUNKS):
                chunk = (sig >> (16 * c)) & 0xFFFF
                o_key.append((c << 16) | chunk)
                o_id.append(int(did))
                o_sig.append(sig)
        return pa.table({"bkey": pa.array(o_key, pa.int64()),
                         "doc_id": pa.array(o_id, pa.int64()),
                         "sig": pa.array(o_sig, pa.int64())})


def simhash_dedup(sf_dir: str, *, max_hamming: int = 3,
                  concurrency: int = 2) -> rd.Dataset:
    """Near-duplicate pairs by SimHash: (a, b, hamming <= max_hamming)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    rows = docs.map_batches(_SimhashChunks, batch_format="pyarrow",
                            concurrency=concurrency)
    sigs_tbl = rows.materialize()
    pairs = _pairs_from_buckets(sigs_tbl)
    # signature lookup (small: one int per doc) broadcast for verification
    sp = sigs_tbl.to_pandas().drop_duplicates("doc_id")
    ref = ray.put(dict(zip(sp["doc_id"], sp["sig"])))

    def verify(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        ham = np.array([bin(s[x] ^ s[y]).count("1") for x, y in zip(a, b)],
                       dtype=np.int64)
        t = pa.table({"a": batch["a"], "b": batch["b"],
                      "hamming": pa.array(ham, pa.int64())})
        return t.filter(pc.less_equal(t["hamming"], pa.scalar(max_hamming)))

    return pairs.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup(sf_dir: str, *, n_planes: int = 12, seed: int = 42,
                      threshold: float = 0.95) -> rd.Dataset:
    """Near-duplicate vector pairs: random-hyperplane LSH buckets -> exact
    cosine verification. (a, b, cosine)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = emb.take_batch(1, batch_format="pandas")
    dim = len(first["embedding"][0])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes)).astype(np.float64)
    pref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mat = np.vstack([np.asarray(v, np.float64)
                         for v in batch["embedding"].to_pylist()])
        bits = (mat @ pl) > 0
        keys = bits @ (1 << np.arange(pl.shape[1], dtype=np.int64))
        return pa.table({"bkey": pa.array(keys.astype(np.int64), pa.int64()),
                         "doc_id": pa.array(ids, pa.int64())})

    pairs = _pairs_from_buckets(
        emb.map_batches(bucketize, batch_format="pyarrow")).materialize()
    cand = pairs.to_pandas()
    if len(cand) == 0:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))
    need = sorted(set(cand["a"]) | set(cand["b"]))

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["vec_id"],
                                     value_set=pa.array(need, pa.int64())))

    small = emb.map_batches(pick, batch_format="pyarrow").to_pandas()
    vecs = {i: np.asarray(v, np.float64)
            for i, v in zip(small["vec_id"], small["embedding"])}
    for v in vecs.values():
        n = np.linalg.norm(v)
        if n:
            v /= n
    vref = ray.put(vecs)

    def verify(batch: pa.Table) -> pa.Table:
        vv = ray.get(vref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        cos = np.array([float(vv[x] @ vv[y]) for x, y in zip(a, b)])
        t = pa.table({"a": batch["a"], "b": batch["b"],
                      "cosine": pa.array(np.round(cos, 6), pa.float64())})
        return t.filter(pc.greater_equal(t["cosine"], pa.scalar(threshold)))

    return pairs.map_batches(verify, batch_format="pyarrow")
