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
fed by per-batch signature computation in actor pools); verification is
DISTRIBUTED — the candidate-pair table joins the payload table twice
(hash-partitioned ``Dataset.join`` on ``a`` then ``b``) and every batch
scores its own pairs.  Nothing funnels through the driver: no candidate
list, no broadcast shingle/vector dict, no full signature table.  Oversized
LSH buckets are dropped AND counted (sentinel rows -> ``stats``), never
silently truncated.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from metis_ray.functions.hashing import band_keys, minhash_signatures, sha256_hex
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

    Buckets larger than ``max_bucket`` are dropped (degenerate buckets —
    e.g. empty docs — would emit O(n^2) pairs; the cap is the skew guard)
    and each one emits a SENTINEL row (a=-1, b=bkey) so the drop is
    countable downstream (``_split_pairs``) instead of silent. Emitted
    pairs are deduped by a groupby."""

    def to_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group[id_col].to_numpy(zero_copy_only=False))
        if len(ids) > max_bucket:
            bkey = group["bkey"][0].as_py()
            return pa.table({"a": pa.array([-1], pa.int64()),
                             "b": pa.array([bkey], pa.int64())})
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pa.table({"a": pa.array(ids[ii], pa.int64()),
                         "b": pa.array(ids[jj], pa.int64())})

    pairs = buckets.groupby("bkey").map_groups(to_pairs, batch_format="pyarrow")
    return (pairs.groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"]))


def _split_pairs(pairs: rd.Dataset, stats: dict | None) -> rd.Dataset:
    """Filter out dropped-bucket sentinels; when ``stats`` is given, count
    them there (one extra pass over the materialized pair table — small by
    construction: bucket sizes are capped)."""
    if stats is not None:
        pairs = pairs.materialize()
        stats["dropped_buckets"] = pairs.map_batches(
            lambda t: t.filter(pc.less(t["a"], pa.scalar(0))),
            batch_format="pyarrow").count()
    return pairs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["a"], pa.scalar(0))),
        batch_format="pyarrow")


def _join_parts() -> int:
    """Join aggregator actors must fit the cluster (pending aggregators
    deadlock, not queue)."""
    return max(2, min(8, int(ray.cluster_resources().get("CPU", 8)) - 2))


def _sig_stage(docs: rd.Dataset, cls, args: tuple, concurrency: int) -> rd.Dataset:
    """Signature stage: actor pool on real clusters, stateless tasks on
    tiny ones — a pool's reserved CPUs plus the downstream joins' aggregator
    actors would starve each other below ~8 CPUs (reserve-deadlock, not
    slowness)."""
    if int(ray.cluster_resources().get("CPU", 8)) < 8:
        return docs.map_batches(cls(*args), batch_format="pyarrow")
    return docs.map_batches(cls, fn_constructor_args=args,
                            batch_format="pyarrow", concurrency=concurrency)


@ray.remote(num_cpus=0)
def _block_rows(tbl: pa.Table) -> int:
    return tbl.num_rows


_JOIN_COMPACT_NEEDED: bool | None = None


def _join_compaction_needed() -> bool:
    """One-time runtime probe, version-gating the pre-join compaction: does
    this Ray's ``Dataset.join`` survive zero-row blocks? Broken through at
    least Ray 2.49.x — the per-partition block builder comes up schema-less
    and the Acero join raises ``ArrowInvalid: No match for FieldRef`` (on
    either side; needs an upstream ray-project issue, filed from a
    network-enabled machine). A future fixed Ray flips this to False and
    the compaction's materialize barrier disappears without a code change.
    Override: ``METIS_RAY_JOIN_COMPACT=always|never``."""
    global _JOIN_COMPACT_NEEDED
    import os
    env = os.environ.get("METIS_RAY_JOIN_COMPACT", "auto").lower()
    if env in ("1", "always"):
        return True
    if env in ("0", "never"):
        return False
    if _JOIN_COMPACT_NEEDED is None:
        try:
            # zero-row blocks on BOTH sides: the failure fires on either
            # (left observed round 2, right observed round 4 — see the
            # compaction call sites marked "right side")
            left = rd.from_arrow([
                pa.table({"k": pa.array([], pa.int64())}),     # empty block
                pa.table({"k": pa.array([1], pa.int64())})])
            right = rd.from_arrow([
                pa.table({"k": pa.array([], pa.int64()),
                          "x": pa.array([], pa.int64())}),     # empty block
                pa.table({"k": pa.array([1], pa.int64()),
                          "x": pa.array([2], pa.int64())})])
            left.join(right, join_type="inner", num_partitions=2,
                      on=("k",)).count()
            _JOIN_COMPACT_NEEDED = False
        except Exception:                                      # noqa: BLE001
            _JOIN_COMPACT_NEEDED = True
    return _JOIN_COMPACT_NEEDED


def _nonempty_blocks(ds: rd.Dataset) -> tuple[rd.Dataset | None, int]:
    """(dataset with only nonempty blocks | None-if-empty, total rows).

    Ray's join operator breaks on zero-row blocks (the partition builder
    comes up schema-less and the per-partition Acero join raises
    "no match for FieldRef"), and ``map_batches`` does not rewrite empty
    blocks — so joins are fed through this compaction. Blocks stay in the
    object store; only per-block row counts (ints) come to the driver.
    On a Ray whose join handles empty blocks (``_join_compaction_needed``
    probe) the re-blocking is skipped — callers keep the exact same
    None-if-empty / row-count contract, minus the materialize barrier."""
    if not _join_compaction_needed():
        # materialize ONCE so the count and the caller's join share the
        # same executed blocks — a bare ds.count() would run the upstream
        # pipeline and discard it, doubling the expensive stages
        mds = ds.materialize()
        n = mds.count()
        return (mds, n) if n else (None, 0)
    refs = ds.materialize().to_arrow_refs()
    sizes = ray.get([_block_rows.remote(r) for r in refs])
    keep = [r for r, n in zip(refs, sizes) if n > 0]
    if not keep:
        return None, 0
    return rd.from_arrow_refs(keep), sum(sizes)


def _join_pair_payload(pairs: rd.Dataset, source: rd.Dataset, id_col: str,
                       payload_col: str) -> rd.Dataset | None:
    """(a, b) x (id, payload) -> (a, b, <payload>_a, <payload>_b) via two
    hash-partitioned ``Dataset.join``s — the distributed verification shape:
    the pair table never leaves the object store and each join ships only
    the payloads of ids that actually appear in pairs on that side.
    Returns None when there are no candidate pairs (callers emit their typed
    empty result). Partition count scales with the candidate count so thin
    pair tables don't scatter into empty join partitions."""
    pairs, n_rows = _nonempty_blocks(pairs)
    if pairs is None:
        return None
    src = source.select_columns([id_col, payload_col])
    left = src.rename_columns({id_col: "a", payload_col: payload_col + "_a"})
    right = src.rename_columns({id_col: "b", payload_col: payload_col + "_b"})
    n = max(1, min(_join_parts(), n_rows // 50_000 + 1))
    j = pairs.join(left, join_type="inner", num_partitions=n, on=("a",))
    j, n_rows = _nonempty_blocks(j)   # joins can emit empty partitions too
    if j is None:
        return None
    return j.join(right, join_type="inner", num_partitions=n, on=("b",))


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
        # batched signature matrix + vectorized band keys: one hash64 pass
        # over the batch's shingles, reduceat segment-mins, numpy-folded
        # bucket keys — no per-doc/per-band Python hashing
        sigs = minhash_signatures([self._shingles(t) for t in texts],
                                  self.num_perm)
        keys = band_keys(sigs, self.bands)
        return pa.table({
            "bkey": pa.array(keys.ravel(), pa.int64()),
            "doc_id": pa.array(np.repeat(ids.astype(np.int64), self.bands),
                               pa.int64()),
        })


def _shingle_set(mode: str, text: str, k: int) -> set:
    """Exact shingle-set semantics shared by signature generation and
    verification (and transcribed in the DuckDB oracle): word mode = k-word
    shingles; char mode = lowercased k-grams, the whole (short) string when
    len < k, empty set for empty text."""
    if mode == "word":
        return set(word_shingles(text, k))
    t = text.lower()
    if not t:
        return set()
    if len(t) < k:
        return {t}
    return {t[i:i + k] for i in range(len(t) - k + 1)}


def _verify_jaccard(pairs: rd.Dataset, sf_dir: str, mode: str, k: int,
                    threshold: float) -> rd.Dataset:
    """Exact-Jaccard verification, fully distributed: the pair table joins
    ``documents`` on each side and every batch scores its own pairs (shingle
    sets memoized per batch per doc)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    joined = _join_pair_payload(pairs, docs, "doc_id", "text")
    if joined is None:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))

    def score(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        memo: dict[int, set] = {}

        def sh(did: int, text: str) -> set:
            s = memo.get(did)
            if s is None:
                s = memo[did] = _shingle_set(mode, text, k)
            return s

        j = np.array([jaccard(sh(int(x), tx), sh(int(y), ty))
                      for x, y, tx, ty in zip(a, b, ta, tb)])
        # threshold on the RAW score, round only the emitted column — the
        # DuckDB twins filter on the unrounded value (WHERE-on-raw /
        # round-in-SELECT); thresholding post-round would pass pairs up to
        # 5e-7 below the cut
        keep = j >= threshold
        return pa.table({
            "a": batch["a"].filter(pa.array(keep)),
            "b": batch["b"].filter(pa.array(keep)),
            "jaccard": pa.array(np.round(j[keep], 6), pa.float64())})

    return joined.map_batches(score, batch_format="pyarrow")


def minhash_dedup(sf_dir: str, *, num_perm: int = 64, bands: int = 16,
                  shingle_k: int = 3, threshold: float = 0.6,
                  concurrency: int = 2, stats: dict | None = None) -> rd.Dataset:
    """Near-duplicate pairs by word-shingle MinHash-LSH: (a, b, jaccard)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    buckets = _sig_stage(docs, _ShingleSigs,
                         ("word", num_perm, bands, shingle_k), concurrency)
    pairs = _split_pairs(_pairs_from_buckets(buckets), stats)
    return _verify_jaccard(pairs, sf_dir, "word", shingle_k, threshold)


def ngram_jaccard_dedup(sf_dir: str, *, num_perm: int = 64, bands: int = 16,
                        ngram_k: int = 8, threshold: float = 0.8,
                        concurrency: int = 2, stats: dict | None = None) -> rd.Dataset:
    """Near-duplicate pairs by character-n-gram Jaccard through the same
    MinHash-LSH harness."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    buckets = _sig_stage(docs, _ShingleSigs,
                         ("char", num_perm, bands, ngram_k), concurrency)
    pairs = _split_pairs(_pairs_from_buckets(buckets), stats)
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


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy>=2 kernel when present)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x.astype(np.uint64)).astype(np.int64)
    v = np.ascontiguousarray(x.astype(np.uint64)).view(np.uint8)
    return np.unpackbits(v.reshape(len(x), 8), axis=1).sum(axis=1).astype(np.int64)


def simhash_dedup(sf_dir: str, *, max_hamming: int = 3,
                  concurrency: int = 2, stats: dict | None = None) -> rd.Dataset:
    """Near-duplicate pairs by SimHash: (a, b, hamming <= max_hamming).
    Verification joins the per-doc signature table (one int64 per doc,
    distilled from the chunk rows by a groupby) onto each pair side — no
    driver-side signature dict."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    rows = _sig_stage(docs, _SimhashChunks, (), concurrency).materialize()
    pairs = _split_pairs(_pairs_from_buckets(rows), stats)
    # one row per doc; sig is identical across a doc's chunk rows
    sigs = rows.groupby("doc_id").aggregate(Min("sig", alias_name="sig"))
    joined = _join_pair_payload(pairs, sigs, "doc_id", "sig")
    if joined is None:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64())}))

    def verify(batch: pa.Table) -> pa.Table:
        sa = batch["sig_a"].to_numpy(zero_copy_only=False)
        sb = batch["sig_b"].to_numpy(zero_copy_only=False)
        ham = _popcount64(np.bitwise_xor(sa.astype(np.uint64),
                                         sb.astype(np.uint64)))
        t = pa.table({"a": batch["a"], "b": batch["b"],
                      "hamming": pa.array(ham, pa.int64())})
        return t.filter(pc.less_equal(t["hamming"], pa.scalar(max_hamming)))

    return joined.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup(sf_dir: str, *, n_planes: int = 12, seed: int = 42,
                      threshold: float = 0.95,
                      stats: dict | None = None) -> rd.Dataset:
    """Near-duplicate vector pairs: random-hyperplane LSH buckets -> exact
    cosine verification. (a, b, cosine). Verification joins the vector table
    onto each pair side (vectors serialized to binary — list columns don't
    flow through hash joins); each batch computes a row-wise dot product of
    its normalized pair vectors."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = emb.take_batch(1, batch_format="pandas")
    dim = len(first["embedding"][0])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes)).astype(np.float64)
    pref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        from metis_ray.pipelines.similarity import _embedding_matrix
        pl = ray.get(pref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mat = _embedding_matrix(batch["embedding"])
        bits = (mat @ pl) > 0
        keys = bits @ (1 << np.arange(pl.shape[1], dtype=np.int64))
        return pa.table({"bkey": pa.array(keys.astype(np.int64), pa.int64()),
                         "doc_id": pa.array(ids, pa.int64())})

    pairs = _split_pairs(_pairs_from_buckets(
        emb.map_batches(bucketize, batch_format="pyarrow")), stats)
    return _cosine_verify_pairs(emb, pairs, threshold)


def _cosine_verify_pairs(emb: rd.Dataset, pairs: rd.Dataset,
                         threshold: float) -> rd.Dataset:
    """Exact cosine verification shared by the embedding near-dup
    candidate generators (LSH buckets / k-means clusters): join the vector
    table onto each pair side (vectors serialized to binary — list columns
    don't flow through hash joins), row-wise dot product per batch,
    threshold on the RAW cosine, round only the emitted column."""

    def to_binary(batch: pa.Table) -> pa.Table:
        from metis_ray.pipelines.similarity import _embedding_matrix
        mat = np.ascontiguousarray(_embedding_matrix(batch["embedding"]))
        vb = [mat[i].tobytes() for i in range(mat.shape[0])]
        return pa.table({"vec_id": batch["vec_id"],
                         "vb": pa.array(vb, pa.large_binary())})

    vecs = emb.map_batches(to_binary, batch_format="pyarrow")
    joined = _join_pair_payload(pairs, vecs, "vec_id", "vb")
    if joined is None:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        va = np.vstack([np.frombuffer(b, np.float64)
                        for b in batch["vb_a"].to_pylist()])
        vb = np.vstack([np.frombuffer(b, np.float64)
                        for b in batch["vb_b"].to_pylist()])
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        cos = np.einsum("ij,ij->i", va, vb) / (na * nb)
        keep = cos >= threshold
        return pa.table({
            "a": batch["a"].filter(pa.array(keep)),
            "b": batch["b"].filter(pa.array(keep)),
            "cosine": pa.array(np.round(cos[keep], 6), pa.float64())})

    return joined.map_batches(verify, batch_format="pyarrow")


def semantic_dedup(sf_dir: str, *, k: int = 8, iters: int = 5,
                   threshold: float = 0.95, max_bucket: int = 4000,
                   stats: dict | None = None) -> rd.Dataset:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", arXiv:2303.09540):
    semantic near-duplicate pairs (a, b, cosine) via spherical k-means
    clustering + exact within-cluster cosine — the cluster IS the
    candidate bucket, so paraphrase pairs a random-hyperplane LSH can
    split still meet, and the pairwise work drops from O(n^2) to
    O(n^2/k) exactly as in the paper.

    Scale shape: the cluster assignment is the streaming k-means pass
    (``similarity.kmeans_clusters`` — only k centroids ever visit the
    driver), candidates reuse the capped bucket machinery (drops counted
    via ``stats``), verification the shared hash-partitioned pair join.
    At 100 TB, k scales with n (SemDeDup uses k ~ sqrt(n)) so the
    per-cluster bucket stays bounded; ``max_bucket`` is the loud guard.
    Oracle: brute-force within-cluster pairs over the sequential k-means
    golden (assignment margins asserted at generation)."""
    from metis_ray.pipelines.similarity import kmeans_clusters

    assign = kmeans_clusters(sf_dir, k=k, iters=iters)
    buckets = assign.map_batches(
        lambda t: pa.table({"bkey": t["cluster"], "doc_id": t["vec_id"]}),
        batch_format="pyarrow")
    pairs = _split_pairs(
        _pairs_from_buckets(buckets, max_bucket=max_bucket), stats)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return _cosine_verify_pairs(emb, pairs, threshold)


# ---------------------------------------------------------------------------
# end-to-end fuzzy dedup (pairs -> clusters -> canonical keep)
# ---------------------------------------------------------------------------

def _components_shard(edges: rd.Dataset, verts: rd.Dataset) -> rd.Dataset:
    """Connected components of the candidate subgraph through the CSR shard
    engine: persist a temporary hash-partitioned graph dir, run the actor
    min-label supersteps (per-vertex state stays sharded; the driver sees
    only change counts), stream the (v, label) result to per-shard parquet,
    and hand back the label table as a materialized Dataset. Identical
    labels to ``components_dataset`` (both converge to min vertex id per
    component — test_fuzzy_dedup_cc_engines_agree)."""
    import os
    import shutil
    import tempfile

    from metis_ray.graph.partition import build_graph_dir
    from metis_ray.graph.runner import GraphRunner

    tmp = tempfile.mkdtemp(prefix="metis_fuzzycc_")
    try:
        P = max(2, min(int(ray.cluster_resources().get("CPU", 8)), 32))
        gdir = build_graph_dir(edges, verts, os.path.join(tmp, "graph"), P,
                               directed=False, partition="hash")
        runner = GraphRunner(gdir)
        try:
            runner.connected_components()
            out = os.path.join(tmp, "labels")
            runner.write_result(out, "label")
        finally:
            runner.shutdown()
        comp = rd.read_parquet(os.path.join(out, "epoch=0"))
        # pull the blocks into the object store before the tmp dir vanishes
        comp_ne, _ = _nonempty_blocks(comp)
        assert comp_ne is not None   # verts is nonempty here by contract
        return comp_ne
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def fuzzy_dedup(sf_dir: str, *, threshold: float = 0.6,
                stats: dict | None = None,
                broadcast_limit: int = 2_000_000,
                cc_engine: str = "auto",
                shard_cc_threshold: int = 5_000_000) -> rd.Dataset:
    """End-to-end near-duplicate REMOVAL: MinHash-LSH candidate pairs ->
    exact-Jaccard verification -> connected components over the verified
    pair graph -> one canonical survivor (min doc_id) per cluster.

    Returns (doc_id, component, keep) for EVERY document: ``component`` is
    the min doc_id of the doc's near-dup cluster (its own id when it has no
    near-dups) and ``keep`` marks the cluster's canonical survivor — the
    keep=true rows are the deduplicated corpus.

    Scale shape: the transitive-closure step runs ONLY on the candidate
    subgraph (vertices = docs that appear in a verified pair — proportional
    to near-dup volume, not corpus size), via the Dataset superstep CC
    (per-batch min combiner -> groupby(dst).min shuffle). The label attach
    is sized to the dup volume: a cluster-sized component map (at most
    ``broadcast_limit`` rows) is broadcast once (``ray.put``) and every
    corpus batch labels itself with a vectorized searchsorted — the full
    corpus is never shuffled; past the limit (a crawl-scale corpus can be
    30-50% near-dups, so the map can outgrow one node) the attach switches
    to the ``decontaminate`` join shape — an inner join labels the dup
    endpoints, a left_anti join passes the rest through — so the ATTACH
    never funnels through the driver. The CC step scales the same way:
    ``cc_engine='auto'`` runs the Dataset-engine formulation (which holds
    the candidate subgraph's (v, label) vector driver-resident between
    supersteps — fine while dup endpoints fit one node's heap) up to
    ``shard_cc_threshold`` candidate vertices, and past that routes the
    subgraph through the CSR shard engine (``_components_shard``: temp
    graph dir + actor supersteps + per-shard parquet labels — per-vertex
    state never on the driver); ``'dataset'``/``'shard'`` force a side.
    Reference analogue: the import-name
    collapse in Metis/tools/HDF5Helper.py:53-69 generalized to transitive
    near-duplicate clusters."""
    from metis_ray.graph.dataset_engine import components_dataset

    if cc_engine not in ("auto", "dataset", "shard"):
        # a typo here would silently fall through to the driver-resident
        # dataset CC — the exact scale path the caller was opting out of
        raise ValueError(f"cc_engine must be 'auto', 'dataset' or 'shard', "
                         f"got {cc_engine!r}")
    pairs = minhash_dedup(sf_dir, threshold=threshold, stats=stats)
    pairs_ne, n_pairs = _nonempty_blocks(
        pairs.map_batches(lambda t: t.select(["a", "b"]),
                          batch_format="pyarrow"))
    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    if pairs_ne is None:
        return docs.map_batches(
            lambda t: pa.table({
                "doc_id": t["doc_id"],
                "component": t["doc_id"],
                "keep": pa.array(np.ones(t.num_rows, dtype=bool))}),
            batch_format="pyarrow")

    # candidate subgraph: vertices = distinct pair endpoints (small)
    def endpoints(t: pa.Table) -> pa.Table:
        ids = np.concatenate([t["a"].to_numpy(zero_copy_only=False),
                              t["b"].to_numpy(zero_copy_only=False)])
        return pa.table({"vertex_id": pa.array(np.unique(ids), pa.int64())})

    verts = (pairs_ne.map_batches(endpoints, batch_format="pyarrow")
             .groupby("vertex_id").aggregate(Count(alias_name="_c"))
             .select_columns(["vertex_id"]))
    verts, n_verts = _nonempty_blocks(verts)   # one execution, both engines
    assert verts is not None   # pairs_ne nonempty => endpoints nonempty
    edges = pairs_ne.map_batches(
        lambda t: t.rename_columns(["src", "dst"]), batch_format="pyarrow")
    if cc_engine == "shard" or (cc_engine == "auto"
                                and n_verts > shard_cc_threshold):
        comp = _components_shard(edges, verts)
    else:
        comp, _ = components_dataset(edges, verts)
    comp_ne, n_comp = _nonempty_blocks(comp)   # executed ONCE; both label
    # paths below reuse these blocks (the original `comp` handle is lazy)
    if comp_ne is None:   # no components => every doc is its own survivor
        return docs.map_batches(
            lambda t: pa.table({
                "doc_id": t["doc_id"],
                "component": t["doc_id"],
                "keep": pa.array(np.ones(t.num_rows, dtype=bool))}),
            batch_format="pyarrow")

    if n_comp > broadcast_limit:
        # dup volume too large to broadcast: attach labels by hash join
        # (the decontaminate shape — inner for dup endpoints, left_anti
        # for the untouched remainder)
        nparts = _join_parts()
        cmap = comp_ne.map_batches(
            lambda t: t.select(["v", "label"])
                       .rename_columns(["doc_id", "component"]),
            batch_format="pyarrow")
        cmap, _ = _nonempty_blocks(cmap)
        docs_ne, _ = _nonempty_blocks(docs)

        def mark_dup(t: pa.Table) -> pa.Table:
            comp_col = pc.fill_null(t["component"], 0)  # never null: inner
            return pa.table({
                "doc_id": t["doc_id"],
                "component": comp_col,
                "keep": pc.equal(comp_col, t["doc_id"])})

        def mark_solo(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": t["doc_id"],
                "component": t["doc_id"],
                "keep": pa.array(np.ones(t.num_rows, dtype=bool))})

        dup = (docs_ne.join(cmap, join_type="inner",
                            num_partitions=nparts, on=("doc_id",))
               .map_batches(mark_dup, batch_format="pyarrow"))
        solo = (docs_ne.join(cmap, join_type="left_anti",
                             num_partitions=nparts, on=("doc_id",))
                .map_batches(mark_solo, batch_format="pyarrow"))
        return dup.union(solo)

    # cluster-sized component map -> broadcast; corpus labels itself
    cdf = comp_ne.to_pandas()
    cv = cdf["v"].to_numpy()
    order = np.argsort(cv)
    ref = ray.put((cv[order], cdf["label"].to_numpy()[order]))

    def label(t: pa.Table) -> pa.Table:
        v, lab = ray.get(ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(v, ids)
        pos_c = np.minimum(pos, len(v) - 1)
        hit = v[pos_c] == ids
        component = np.where(hit, lab[pos_c], ids)
        return pa.table({
            "doc_id": t["doc_id"],
            "component": pa.array(component, pa.int64()),
            "keep": pa.array(component == ids)})

    return docs.map_batches(label, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(sf_dir: str, *, n: int = 8,
                  bench_prefix_lt: str = "10") -> rd.Dataset:
    """(doc_id, is_benchmark, contaminated): flag training documents that
    share any word ``n``-gram with a held-out benchmark set — the
    decontamination pass every public LLM-data pipeline runs so eval
    questions don't leak into training data.

    The benchmark set is a deterministic hash sample of the corpus itself
    (``md5(str(doc_id))`` hex prefix < ``bench_prefix_lt``, the same
    coordination-free membership predicate as ``sample_docs``), so the
    pipeline is self-contained and reproducible at any parallelism.

    Scale shape: n-grams are hashed to int64 the moment they're made (only
    8-byte keys shuffle, never gram strings); the benchmark-gram side is
    DISTINCTed by a hash-partitioned groupby, candidate membership is a
    hash-partitioned inner join (never a broadcast set — the benchmark gram
    table can outgrow one node), and the per-doc verdict folds through one
    more groupby. The clean remainder is attached by a ``left_anti`` join,
    so no side ever visits the driver."""
    import hashlib

    from metis_ray.functions.hashing import hash64

    def is_bench_doc(doc_id) -> bool:
        # THE benchmark-membership predicate — single definition so the
        # gram rows and the verdict rows can never desynchronize
        return (hashlib.md5(str(doc_id).encode()).hexdigest()[:2]
                < bench_prefix_lt)

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def grams(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        out_ids: list[int] = []
        gs: list[str] = []
        bench: list[bool] = []
        for i, t in zip(ids, batch["text"].to_pylist()):
            w = t.lower().split()
            uniq = {" ".join(w[j:j + n]) for j in range(len(w) - n + 1)}
            is_b = is_bench_doc(i)
            out_ids.extend([i] * len(uniq))
            bench.extend([is_b] * len(uniq))
            gs.extend(uniq)
        return pa.table({
            "doc_id": pa.array(out_ids, pa.int64()),
            "gram": pa.array(hash64(gs), pa.int64()),
            "is_bench": pa.array(bench, pa.bool_())})

    g = docs.map_batches(grams, batch_format="pyarrow").materialize()
    nparts = _join_parts()

    bench_grams, n_bg = _nonempty_blocks(
        g.map_batches(lambda t: t.filter(t["is_bench"]).select(["gram"]),
                      batch_format="pyarrow")
         .groupby("gram").aggregate(Count())
         .select_columns(["gram"]))
    train_grams, n_tg = _nonempty_blocks(
        g.map_batches(
            lambda t: t.filter(pc.invert(t["is_bench"]))
                       .select(["doc_id", "gram"]),
            batch_format="pyarrow"))

    # every doc's verdict row (benchmark docs are never 'contaminated' —
    # they ARE the benchmark)
    def doc_flags(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "is_benchmark": pa.array([is_bench_doc(i) for i in ids],
                                     pa.bool_())})

    all_docs = docs.select_columns(["doc_id"]).map_batches(
        doc_flags, batch_format="pyarrow")

    if bench_grams is None or train_grams is None:
        return all_docs.map_batches(
            lambda t: t.append_column(
                "contaminated",
                pa.array([False] * t.num_rows, pa.bool_())),
            batch_format="pyarrow")

    hits = (train_grams.join(bench_grams, join_type="inner",
                             num_partitions=nparts, on=("gram",))
            .groupby("doc_id").aggregate(Count())
            .select_columns(["doc_id"]))
    hits_ne, n_hits = _nonempty_blocks(hits)

    def flag(value: bool):
        def stage(t: pa.Table) -> pa.Table:
            return t.append_column(
                "contaminated",
                pa.array([value] * t.num_rows, pa.bool_()))
        return stage

    all_ne, _ = _nonempty_blocks(all_docs)
    if hits_ne is None:
        return all_ne.map_batches(flag(False), batch_format="pyarrow")
    dirty = (hits_ne.join(all_ne, join_type="inner",
                          num_partitions=nparts, on=("doc_id",))
             .map_batches(flag(True), batch_format="pyarrow"))
    clean = (all_ne.join(hits_ne, join_type="left_anti",
                         num_partitions=nparts, on=("doc_id",))
             .map_batches(flag(False), batch_format="pyarrow"))
    return dirty.union(clean)


# ---------------------------------------------------------------------------
# exact-substring dedup (winnowing)
# ---------------------------------------------------------------------------

class _WinnowFps:
    """Per-doc winnowed fingerprints (Schleimer et al. winnowing, the
    public local-fingerprinting algorithm behind MOSS): rolling k-byte
    window hashes, then the min of every w consecutive hashes.  DETERMINISTIC
    guarantee (not probabilistic): two docs sharing a verbatim byte
    substring of length >= t = k + w - 1 share at least one selected
    fingerprint VALUE — the shared run covers a full w-window of identical
    hash values, whose min is selected on both sides."""

    def __init__(self, k: int, w: int):
        self.k, self.w = k, w

    def __call__(self, batch: pa.Table) -> pa.Table:
        from metis_ray.functions.hashing import window_hashes

        ids: list[int] = []
        fps: list[np.ndarray] = []
        for i, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            h = window_hashes(t, self.k)
            if len(h) == 0:
                continue
            if len(h) <= self.w:
                sel = np.array([h.min()], np.uint64)
            else:
                sel = np.unique(np.lib.stride_tricks
                                .sliding_window_view(h, self.w)
                                .min(axis=1))
            ids.extend([i] * len(sel))
            fps.append(sel)
        fp = (np.concatenate(fps) if fps else np.empty(0, np.uint64))
        return pa.table({
            "bkey": pa.array(fp.astype(np.int64), pa.int64()),
            "doc_id": pa.array(ids, pa.int64())})


def substring_dedup(sf_dir: str, *, min_len: int = 32, winnow_w: int = 8,
                    concurrency: int = 2,
                    stats: dict | None = None) -> rd.Dataset:
    """(a, b, shared_windows): document pairs sharing a VERBATIM byte
    substring of length >= ``min_len`` — the exact-substring dedup of
    Lee et al., "Deduplicating Training Data Makes Language Models Better"
    (arXiv:2107.06499), re-expressed for Ray Data.  Candidate recall is
    DETERMINISTIC (winnowing guarantee with k = min_len - winnow_w + 1,
    so t = k + w - 1 = min_len), and verification is exact: candidate
    pairs join their texts (hash-partitioned, distributed) and each batch
    intersects full ``min_len``-window hash sets, then confirms a hit
    verbatim byte-for-byte (rolling-hash collisions cannot emit a false
    pair).  ``shared_windows`` counts the distinct shared window hashes —
    a proxy for overlap extent.  Oversized fingerprint buckets are dropped
    AND counted via ``stats`` like every LSH family here."""
    from metis_ray.functions.hashing import window_hashes

    k = min_len - winnow_w + 1
    if k < 4:
        raise ValueError("min_len must be >= winnow_w + 3")
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    buckets = _sig_stage(docs, _WinnowFps, (k, winnow_w), concurrency)
    pairs = _split_pairs(_pairs_from_buckets(buckets), stats)

    joined = _join_pair_payload(pairs, docs, "doc_id", "text")
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "shared_windows": pa.array([], pa.int64())})
    if joined is None:
        return rd.from_arrow(empty)

    def verify(batch: pa.Table) -> pa.Table:
        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        keep = np.zeros(len(ta), bool)
        nshared = np.zeros(len(ta), np.int64)
        memo: dict[int, np.ndarray] = {}

        def wh(did: int, text: str) -> np.ndarray:
            h = memo.get(did)
            if h is None:
                h = memo[did] = window_hashes(text, min_len)
            return h

        a_ids = batch["a"].to_numpy(zero_copy_only=False)
        b_ids = batch["b"].to_numpy(zero_copy_only=False)
        for r, (x, y, sa, sb) in enumerate(zip(a_ids, b_ids, ta, tb)):
            ha, hb = wh(int(x), sa), wh(int(y), sb)
            common = np.intersect1d(ha, hb)
            if len(common) == 0:
                continue
            da = sa.encode("utf-8", "ignore")
            db = sb.encode("utf-8", "ignore")
            n_ok = 0
            for h in common:
                pa_pos = np.nonzero(ha == h)[0]
                pb_pos = np.nonzero(hb == h)[0]
                if any(da[i:i + min_len] == db[j:j + min_len]
                       for i in pa_pos for j in pb_pos):
                    n_ok += 1
            if n_ok:
                keep[r] = True
                nshared[r] = n_ok
        m = pa.array(keep)
        return pa.table({
            "a": batch["a"].filter(m),
            "b": batch["b"].filter(m),
            "shared_windows": pa.array(nshared[keep], pa.int64())})

    return joined.map_batches(verify, batch_format="pyarrow")
