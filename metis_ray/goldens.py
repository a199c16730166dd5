"""Golden-parquet oracles for the deterministic documents-derived pipelines.

The graph family's oracles are emitted by the corpus GENERATOR
(``metis_ray/corpus.py``); the pipelines here run over the driver's
``documents.parquet`` instead, so their goldens are computed on demand —
straight-line Python/numpy over the parquet file, no Ray, no shared engine
code paths beyond the published kernel definitions — and cached under
``/tmp``.  The driver's DuckDB twins then ``read_parquet`` the goldens
(the components/labelprop pattern from round 2, VERDICT.md "Next round" #4):

* ``golden_simhash_pairs``    — brute-force ALL-PAIRS Hamming over the
  64-bit SimHash signatures: a hash match certifies the LSH chunk-bucket
  candidate generation missed nothing (recall 1.0) AND the distributed
  verification scored every pair.
* ``golden_multimodal_features`` — blake2b-16 digest (hex) + the meta
  arithmetic of the deterministic fake decode.
* ``golden_multimodal_resize``   — the nearest-neighbor byte resample
  transcribed in numpy (hex payload).

Reference analogue: golden-by-construction fixtures, Metis/tests/
test_gst_ok.py:94-95 (lossless compare against independently derived
expectations).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# bump when any golden kernel below changes
_GOLDEN_VERSION = 9

GOLDEN_ROOT = os.environ.get("METIS_RAY_GOLDEN_DIR", "/tmp/metis_ray_goldens")


def _simhash_pairs(doc_ids: np.ndarray, texts: list[str],
                   max_hamming: int = 3) -> pa.Table:
    """All pairs (a < b) with Hamming(simhash64) <= max_hamming, by brute
    force over every pair — independent of any bucketing/LSH shortcut."""
    from metis_ray.functions.text import simhash64

    sigs = np.array([simhash64(t.lower().split()) for t in texts],
                    dtype=np.uint64)
    n = len(sigs)
    # row-block loop: the dense n x n xor matrix is O(n^2) bytes (and the
    # numpy<2 unpackbits fallback 8x that) — 20+ GB when METIS_RAY_ORACLE_SF
    # points at a larger scale. Blocks keep it O(block * n) with the same
    # brute-force guarantee.
    blk = max(1, min(n, (1 << 24) // max(n, 1)))   # ~128 MB of uint64 per block
    o_a, o_b, o_h = [], [], []
    for lo in range(0, n, blk):
        hi = min(lo + blk, n)
        x = sigs[lo:hi, None] ^ sigs[None, :]
        if hasattr(np, "bitwise_count"):
            ham = np.bitwise_count(x).astype(np.int64)
        else:
            ham = np.unpackbits(
                x.view(np.uint8).reshape(hi - lo, n, 8),
                axis=2).sum(axis=2).astype(np.int64)
        ii, jj = np.nonzero(ham <= max_hamming)
        keep = (ii + lo) < jj                      # strict upper triangle
        ii, jj = ii[keep], jj[keep]
        a, b = doc_ids[ii + lo], doc_ids[jj]
        swap = a > b
        o_a.append(np.where(swap, b, a))
        o_b.append(np.where(swap, a, b))
        o_h.append(ham[ii, jj])
    cat = (lambda parts: np.concatenate(parts) if parts
           else np.empty(0, np.int64))
    return pa.table({"a": pa.array(cat(o_a), pa.int64()),
                     "b": pa.array(cat(o_b), pa.int64()),
                     "hamming": pa.array(cat(o_h), pa.int64())})


def _multimodal_features(doc_ids: np.ndarray, texts: list[str]) -> pa.Table:
    """The deterministic fake decode, straight-line: payload = utf-8 text,
    feature = blake2b-16 digest (hex), meta = the documented size arithmetic
    (pipelines/multimodal.synthesize_binary_table)."""
    payloads = [t.encode() for t in texts]
    return pa.table({
        "asset_id": pa.array(doc_ids, pa.int64()),
        "width": pa.array([(len(p) % 64) + 1 for p in payloads], pa.int64()),
        "height": pa.array([(len(p) % 48) + 1 for p in payloads], pa.int64()),
        "format": pa.array(["fake/raw"] * len(payloads), pa.string()),
        "feature_hex": pa.array(
            [hashlib.blake2b(p, digest_size=16).hexdigest() for p in payloads],
            pa.string()),
    })


def _multimodal_resize(doc_ids: np.ndarray, texts: list[str],
                       width: int = 16, height: int = 12) -> pa.Table:
    """Nearest-neighbor byte resample, transcribed in numpy: tile the
    payload bytes into an (h0, w0) grid, sample rows/cols by integer index
    arithmetic, emit the (height, width) result as hex."""
    out_hex = []
    ids = []
    for did, t in zip(doc_ids, texts):
        p = t.encode()
        w0, h0 = (len(p) % 64) + 1, (len(p) % 48) + 1
        reps = (w0 * h0) // max(1, len(p)) + 1
        img = np.frombuffer((p * reps)[:w0 * h0], np.uint8).reshape(h0, w0)
        yi = np.arange(height) * h0 // height
        xi = np.arange(width) * w0 // width
        out_hex.append(img[np.ix_(yi, xi)].tobytes().hex())
        ids.append(int(did))
    return pa.table({
        "asset_id": pa.array(ids, pa.int64()),
        "width": pa.array([width] * len(ids), pa.int64()),
        "height": pa.array([height] * len(ids), pa.int64()),
        "format": pa.array(["fake/resized"] * len(ids), pa.string()),
        "payload_hex": pa.array(out_hex, pa.string()),
    })


def _kmeans_golden(vec_ids: np.ndarray, mat: np.ndarray,
                   k: int = 8, iters: int = 5) -> pa.Table:
    """Single-process transcription of pipelines/similarity.kmeans_clusters
    (same min-k init, same spherical update, same iteration count). The
    distributed engine merges per-batch partial sums in nondeterministic
    order, so float64 centroids can differ from this transcription by
    ~1e-16; the golden is only valid while every assignment decision has a
    margin far above that — asserted loudly per round, so a near-tie at a
    larger METIS_RAY_ORACLE_SF fails generation instead of silently
    mismatching the engine."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    m = mat / norms

    def assign_with_margin(sims: np.ndarray) -> np.ndarray:
        if sims.shape[1] > 1:
            top2 = np.partition(sims, sims.shape[1] - 2, axis=1)[:, -2:]
            margin = float(np.min(top2[:, 1] - top2[:, 0]))
            if margin < 1e-9:
                raise ValueError(
                    f"kmeans assignment margin {margin:.3e} < 1e-9: the "
                    "sequential golden is not assignment-stable vs the "
                    "distributed sum order at this scale")
        return np.argmax(sims, axis=1)

    order = np.argsort(vec_ids)
    cents = m[order[:k]].copy()
    for _ in range(iters):
        assign = assign_with_margin(m @ cents.T)
        nxt = cents.copy()
        for c in range(len(cents)):
            sel = m[assign == c]
            if len(sel):
                v = sel.sum(axis=0)
                nxt[c] = v / np.linalg.norm(v)
        cents = nxt
    assign = assign_with_margin(m @ cents.T)
    return pa.table({"vec_id": pa.array(vec_ids, pa.int64()),
                     "cluster": pa.array(assign.astype(np.int64), pa.int64())})


def _tfidf_golden(doc_ids: np.ndarray, texts: list[str],
                  top: int = 3) -> pa.Table:
    """Sequential transcription of textstats.tfidf_top_terms: tf = in-doc
    count over lower().split() tokens, idf = ln(N/df), ties term-asc,
    tfidf rounded to 9 dp (the engine's emitted rounding)."""
    from collections import Counter

    n = len(doc_ids)
    df_counter: Counter = Counter()
    per_doc = {}
    for did, text in zip(doc_ids.tolist(), texts):
        cnt = Counter(text.lower().split())
        per_doc[did] = cnt
        df_counter.update(cnt.keys())
    out_d, out_t, out_s, out_r = [], [], [], []
    for did, cnt in per_doc.items():
        if not cnt:
            continue
        scored = sorted(((-tf * np.log(float(n) / df_counter[t]), t)
                         for t, tf in cnt.items()))
        for rnk, (neg, t) in enumerate(scored[:top], 1):
            out_d.append(did)
            out_t.append(t)
            out_s.append(round(-neg, 9))
            out_r.append(rnk)
    return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                     "term": pa.array(out_t, pa.string()),
                     "tfidf": pa.array(out_s, pa.float64()),
                     "rnk": pa.array(out_r, pa.int64())})


def _decontaminate_golden(doc_ids: np.ndarray, texts: list[str], *,
                          n: int = 8, bench_prefix_lt: str = "10") -> pa.Table:
    """Brute force over the raw word n-gram STRINGS (the engine shuffles
    int64 gram hashes) — same deterministic md5 benchmark membership."""
    def is_bench(i: int) -> bool:
        return hashlib.md5(str(i).encode()).hexdigest()[:2] < bench_prefix_lt

    def grams(t: str) -> set:
        w = t.lower().split()
        return {" ".join(w[j:j + n]) for j in range(len(w) - n + 1)}

    bench_grams: set = set()
    per = {}
    for did, text in zip(doc_ids.tolist(), texts):
        g = grams(text)
        per[did] = g
        if is_bench(did):
            bench_grams |= g
    dids = sorted(per)
    bench = [is_bench(d) for d in dids]
    cont = [bool(not b and (per[d] & bench_grams))
            for d, b in zip(dids, bench)]
    return pa.table({"doc_id": pa.array(dids, pa.int64()),
                     "is_benchmark": pa.array(bench, pa.bool_()),
                     "contaminated": pa.array(cont, pa.bool_())})


def _substring_pairs_golden(doc_ids: np.ndarray, texts: list[str],
                            min_len: int = 32) -> pa.Table:
    """ALL-PAIRS exact-substring ground truth: candidate pairs from an
    inverted window-hash index (functions.hashing.window_hashes is the
    property-tested scalar spec, like simhash64 above), each confirmed
    verbatim byte-for-byte; shared_windows counts the distinct shared
    window hashes with a verbatim match — the engine's exact emitted
    definition, independent of its winnowing candidate generation (whose
    recall guarantee the registered query enforces via the zero-dropped-
    bucket guard)."""
    from collections import defaultdict

    from metis_ray.functions.hashing import window_hashes

    wh = {int(d): window_hashes(t, min_len)
          for d, t in zip(doc_ids.tolist(), texts)}
    raw = {int(d): t.encode("utf-8", "ignore")
           for d, t in zip(doc_ids.tolist(), texts)}
    inv = defaultdict(set)
    for d, hs in wh.items():
        for h in np.unique(hs):
            inv[int(h)].add(d)
    cand = set()
    for v in inv.values():
        if len(v) > 1:
            vs = sorted(v)
            for i in range(len(vs)):
                for j in range(i + 1, len(vs)):
                    cand.add((vs[i], vs[j]))
    out_a, out_b, out_n = [], [], []
    for a, b in sorted(cand):
        ha, hb = wh[a], wh[b]
        common = np.intersect1d(ha, hb)
        da, db = raw[a], raw[b]
        n_ok = 0
        for h in common:
            pa_pos = np.nonzero(ha == h)[0]
            pb_pos = np.nonzero(hb == h)[0]
            if any(da[i:i + min_len] == db[j:j + min_len]
                   for i in pa_pos for j in pb_pos):
                n_ok += 1
        if n_ok:
            out_a.append(a)
            out_b.append(b)
            out_n.append(n_ok)
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64()),
                     "shared_windows": pa.array(out_n, pa.int64())})


def _hll_users_golden(sf_dir: str) -> pa.Table:
    """Order-free transcription of events_approx_users: the HLL register
    array (functions/sketch.py, the published mergeable kernel) is a max-
    merge — a pure function of each event type's DISTINCT user set — so
    one sequential pass per type is bit-identical to any distributed merge
    tree over any batch partitioning."""
    from metis_ray.functions.sketch import hll_add_values, hll_estimate, \
        hll_new

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["event_type", "user_id"])
    et = np.asarray(t["event_type"].to_pylist(), dtype=object)
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    types, ests = [], []
    for ty in sorted(set(et.tolist())):
        reg = hll_add_values(hll_new(), uid[et == ty])
        types.append(ty)
        ests.append(int(round(hll_estimate(reg))))
    return pa.table({"event_type": pa.array(types, pa.string()),
                     "approx_users": pa.array(ests, pa.int64())})


def _semantic_pairs_golden(vec_ids: np.ndarray, mat: np.ndarray,
                           assign: np.ndarray,
                           threshold: float = 0.95) -> pa.Table:
    """Brute-force within-cluster cosine pairs over the sequential k-means
    golden assignment (margins asserted at generation) — the SemDeDup
    oracle. Same einsum/norm arithmetic as the engine's verify batch."""
    o_a, o_b, o_c = [], [], []
    pos = {int(v): i for i, v in enumerate(vec_ids.tolist())}
    for c in np.unique(assign):
        ids = np.sort(vec_ids[assign == c])
        if len(ids) < 2:
            continue
        rows = np.array([pos[int(v)] for v in ids])
        ii, jj = np.triu_indices(len(ids), k=1)
        va, vb = mat[rows[ii]], mat[rows[jj]]
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        cos = np.einsum("ij,ij->i", va, vb) / (na * nb)
        keep = cos >= threshold
        o_a.append(ids[ii[keep]])
        o_b.append(ids[jj[keep]])
        o_c.append(np.round(cos[keep], 6))
    cat = (lambda parts, dt: np.concatenate(parts).astype(dt) if parts
           else np.empty(0, dt))
    return pa.table({"a": pa.array(cat(o_a, np.int64), pa.int64()),
                     "b": pa.array(cat(o_b, np.int64), pa.int64()),
                     "cosine": pa.array(cat(o_c, np.float64), pa.float64())})


def _ann_rank(cand_ids: np.ndarray, scores: np.ndarray,
              k: int) -> tuple[np.ndarray, np.ndarray]:
    """Global top-k by (score desc, neighbor_id asc) — the engines' final
    pandas sort + head(k), sequentially."""
    order = np.lexsort((cand_ids, -scores))[:k]
    return cand_ids[order], np.arange(1, len(order) + 1, dtype=np.int64)


def _ann_lsh_golden(vec_ids: np.ndarray, mat: np.ndarray, *, k: int = 10,
                    n_queries: int = 5, n_planes: int = 4,
                    n_tables: int = 8, seed: int = 42) -> pa.Table:
    """Sequential transcription of similarity.ann_lsh_topk: the seeded
    hyperplane tables, the multi-table bucket-share candidate rule, exact
    scoring, global (score desc, id asc) top-k. The distributed engine's
    per-batch pre-selection can only diverge on EXACT float score ties
    (measure-zero for these continuous embeddings)."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = mat / norms
    order = np.argsort(vec_ids)
    qsel = order[:n_queries]
    dim = mn.shape[1]
    rng = np.random.RandomState(seed)
    tables = [rng.normal(size=(dim, n_planes)) for _ in range(n_tables)]
    keys = np.empty((len(mn), n_tables), dtype=np.int64)
    for t, pl in enumerate(tables):
        bits = (mn @ pl) > 0
        keys[:, t] = bits @ (1 << np.arange(n_planes, dtype=np.int64))
    o_q, o_n, o_r = [], [], []
    for qi in qsel:
        cand = np.flatnonzero((keys == keys[qi][None, :]).any(axis=1))
        if len(cand) == 0:
            continue
        scores = mn[cand] @ mn[qi]
        nbr, rnk = _ann_rank(vec_ids[cand], scores, k)
        o_q.extend([int(vec_ids[qi])] * len(nbr))
        o_n.extend(int(v) for v in nbr)
        o_r.extend(int(r) for r in rnk)
    return pa.table({"query_id": pa.array(o_q, pa.int64()),
                     "neighbor_id": pa.array(o_n, pa.int64()),
                     "rnk": pa.array(o_r, pa.int64())})


def _ann_ivf_golden(sf_dir: str, vec_ids: np.ndarray, mat: np.ndarray, *,
                    k: int = 10, n_queries: int = 5, n_centroids: int = 16,
                    nprobe: int = 4, iters: int = 8,
                    sample_size: int = 2048, seed: int = 42) -> pa.Table:
    """Sequential transcription of similarity.ann_ivf_topk (and, by the
    tested equal-results contract, the persisted-index variant): the
    coarse quantizer is the engines' own DRIVER-SIDE deterministic trainer
    (train_coarse_quantizer — single-process by construction); the
    distributed parts (assignment, probe filtering, scoring, top-k) are
    re-derived sequentially here."""
    from metis_ray.pipelines.similarity import train_coarse_quantizer

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = mat / norms
    order = np.argsort(vec_ids)
    qsel = order[:n_queries]
    cents = train_coarse_quantizer(sf_dir, n_centroids, iters,
                                   sample_size, seed)
    assign = np.argmax(mn @ cents.T, axis=1)
    qprobe = np.argsort(-(mn[qsel] @ cents.T), axis=1)[:, :nprobe]
    o_q, o_n, o_r = [], [], []
    for row, qi in enumerate(qsel):
        cand = np.flatnonzero(np.isin(assign, qprobe[row]))
        if len(cand) == 0:
            continue
        scores = mn[cand] @ mn[qi]
        nbr, rnk = _ann_rank(vec_ids[cand], scores, k)
        o_q.extend([int(vec_ids[qi])] * len(nbr))
        o_n.extend(int(v) for v in nbr)
        o_r.extend(int(r) for r in rnk)
    return pa.table({"query_id": pa.array(o_q, pa.int64()),
                     "neighbor_id": pa.array(o_n, pa.int64()),
                     "rnk": pa.array(o_r, pa.int64())})


def golden_dir_for_sf(sf_dir: str, root: str = GOLDEN_ROOT) -> str:
    """Materialize (once) the documents-derived goldens for one sf dir.
    Idempotent by manifest (source path + mtime + version)."""
    docs_path = os.path.join(sf_dir, "documents.parquet")
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    name = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(root, f"{name}_v{_GOLDEN_VERSION}")
    man = os.path.join(out, "manifest.json")
    ev_path = os.path.join(sf_dir, "events.parquet")
    src_sig = {"src": docs_path, "mtime": os.path.getmtime(docs_path),
               "emb_mtime": os.path.getmtime(emb_path),
               "ev_mtime": os.path.getmtime(ev_path),
               "ver": _GOLDEN_VERSION}
    if os.path.exists(man):
        with open(man) as fh:
            if json.load(fh) == src_sig:
                return out

    t = pq.read_table(docs_path, columns=["doc_id", "text"])
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = t["text"].to_pylist()

    tmp = out + ".tmp"
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    pq.write_table(_simhash_pairs(doc_ids, texts),
                   os.path.join(tmp, "golden_simhash_pairs.parquet"))
    pq.write_table(_multimodal_features(doc_ids, texts),
                   os.path.join(tmp, "golden_multimodal_features.parquet"))
    pq.write_table(_multimodal_resize(doc_ids, texts),
                   os.path.join(tmp, "golden_multimodal_resize.parquet"))
    et = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    emb_ids = et["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    emb_mat = np.vstack([np.asarray(v, np.float64)
                         for v in et["embedding"].to_pylist()])
    km = _kmeans_golden(emb_ids, emb_mat)
    pq.write_table(km, os.path.join(tmp, "golden_kmeans.parquet"))
    pq.write_table(
        _semantic_pairs_golden(
            emb_ids, emb_mat,
            km["cluster"].to_numpy(zero_copy_only=False), threshold=0.4),
        os.path.join(tmp, "golden_semantic_pairs.parquet"))
    pq.write_table(_tfidf_golden(doc_ids, texts),
                   os.path.join(tmp, "golden_tfidf.parquet"))
    pq.write_table(_decontaminate_golden(doc_ids, texts),
                   os.path.join(tmp, "golden_decontaminate.parquet"))
    pq.write_table(_substring_pairs_golden(doc_ids, texts),
                   os.path.join(tmp, "golden_substring_pairs.parquet"))
    pq.write_table(_hll_users_golden(sf_dir),
                   os.path.join(tmp, "golden_hll_users.parquet"))
    pq.write_table(_ann_lsh_golden(emb_ids, emb_mat),
                   os.path.join(tmp, "golden_ann_lsh.parquet"))
    pq.write_table(_ann_ivf_golden(sf_dir, emb_ids, emb_mat),
                   os.path.join(tmp, "golden_ann_ivf.parquet"))
    pq.write_table(_ann_pq_golden(sf_dir, emb_ids, emb_mat),
                   os.path.join(tmp, "golden_ann_pq.parquet"))
    pq.write_table(_ann_ivfpq_golden(sf_dir, emb_ids, emb_mat),
                   os.path.join(tmp, "golden_ann_ivfpq.parquet"))
    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump(src_sig, fh)
    if os.path.exists(out):
        import shutil
        shutil.rmtree(out)
    os.replace(tmp, out)
    return out


# ---------------------------------------------------------------------------
# corpus-graph goldens: sequential independent k-core / SCC over the
# GENERATOR's golden edge table (no engine code paths) — the DuckDB twins
# for the iterative graph queries the driver otherwise checks rows-only.
# ---------------------------------------------------------------------------

_GRAPH_GOLDEN_VERSION = 18


def _core_numbers(n: int, adj: list[np.ndarray]) -> np.ndarray:
    """Batagelj-Zaversnik O(E) peeling (the textbook k-core algorithm,
    also what NetworkX ``core_number`` implements) over a simple
    undirected adjacency — independent of the engine's h-index fixpoint."""
    deg = np.array([len(a) for a in adj], dtype=np.int64)
    if n == 0:
        return deg
    md = int(deg.max())
    counts = np.bincount(deg, minlength=md + 1)
    vert = np.argsort(deg, kind="stable").astype(np.int64)
    pos = np.empty(n, dtype=np.int64)
    pos[vert] = np.arange(n)
    bin_ptr = np.zeros(md + 1, dtype=np.int64)
    bin_ptr[1:] = np.cumsum(counts)[:-1]
    cur = deg.copy()
    for i in range(n):
        v = int(vert[i])
        for u in adj[v]:
            u = int(u)
            if cur[u] > cur[v]:
                du, pu = int(cur[u]), int(pos[u])
                pw = int(bin_ptr[du])
                w = int(vert[pw])
                if u != w:
                    vert[pu], vert[pw] = w, u
                    pos[u], pos[w] = pw, pu
                bin_ptr[du] += 1
                cur[u] -= 1
    return cur


def _scc_labels(n: int, adj: list[np.ndarray], ids: np.ndarray) -> np.ndarray:
    """Iterative Tarjan SCC; label = min member vertex id (the engine's
    convention). Independent of the trim + forward/backward peeling."""
    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    onstk = np.zeros(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    counter = 0
    for s in range(n):
        if index[s] != -1:
            continue
        work: list[list[int]] = [[s, 0]]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                onstk[v] = True
            descended = False
            nbrs = adj[v]
            for j in range(pi, len(nbrs)):
                u = int(nbrs[j])
                if index[u] == -1:
                    work[-1][1] = j + 1
                    work.append([u, 0])
                    descended = True
                    break
                if onstk[u]:
                    low[v] = min(low[v], index[u])
            if descended:
                continue
            work.pop()
            if low[v] == index[v]:
                members = []
                while True:
                    u = stack.pop()
                    onstk[u] = False
                    members.append(u)
                    if u == v:
                        break
                comp[members] = ids[members].min()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
    return comp


def _sssp_golden(n: int, si: np.ndarray, di: np.ndarray, w: np.ndarray,
                 seed_idx: np.ndarray) -> np.ndarray:
    """Sequential multi-source Dijkstra (binary heap over a CSR of the
    distinct weighted edges) — independent of the engine's frontier
    Bellman-Ford supersteps. Unreachable = -1.0."""
    import heapq

    order = np.argsort(si, kind="stable")
    s_srt, d_srt, w_srt = si[order], di[order], w[order]
    starts = np.searchsorted(s_srt, np.arange(n))
    ends = np.searchsorted(s_srt, np.arange(n), side="right")
    dist = np.full(n, np.inf)
    heap = [(0.0, int(s)) for s in seed_idx]
    dist[seed_idx] = 0.0
    heapq.heapify(heap)
    while heap:
        dv, v = heapq.heappop(heap)
        if dv > dist[v]:
            continue
        for j in range(starts[v], ends[v]):
            u, nd = int(d_srt[j]), dv + float(w_srt[j])
            if nd < dist[u]:
                dist[u] = nd
                heapq.heappush(heap, (nd, u))
    return np.where(np.isinf(dist), -1.0, dist)


def _eigenvector_golden(n: int, si: np.ndarray, di: np.ndarray,
                        w: np.ndarray, n_iter: int = 100) -> np.ndarray:
    """Fixed-n_iter transcription of the nx.eigenvector_centrality
    recurrence (x' = x + A^T x weighted, L2-normalized per round) — the
    engine runs the identical count (tol=0), so both sides sit at float
    noise and 6-dp rounding cannot race a convergence threshold."""
    x = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(n_iter):
        x2 = x.copy()
        np.add.at(x2, di, x[si] * w)
        x = x2 / (np.sqrt((x2 * x2).sum()) or 1.0)
    return x


def _katz_golden(n: int, si: np.ndarray, di: np.ndarray, w: np.ndarray, *,
                 alpha: float, beta: float, n_iter: int = 100) -> np.ndarray:
    """Fixed-n_iter transcription of nx.katz_centrality (x starts at 0,
    x' = alpha * A^T x + beta, final unit-L2 scaling). Generation asserts
    the recurrence actually contracted at this alpha so a spectral-radius
    violation fails loudly instead of producing meaningless values."""
    x = np.zeros(n, dtype=np.float64)
    delta = np.inf
    for _ in range(n_iter):
        x2 = np.full(n, beta, dtype=np.float64)
        np.add.at(x2, di, alpha * x[si] * w)
        delta = float(np.abs(x2 - x).sum())
        x = x2
    if n and delta > 1e-9 * n:
        raise AssertionError(
            f"katz golden: alpha={alpha} did not contract (delta={delta})")
    s = np.sqrt((x * x).sum())
    return x * ((1.0 / s) if s else 1.0)


def _hits_golden(n: int, si: np.ndarray, di: np.ndarray,
                 n_iter: int = 100) -> tuple[np.ndarray, np.ndarray]:
    """Fixed-n_iter transcription of the nx.hits recurrence the engine
    mirrors (authorities = A^T h, hubs = A a, per-round max-normalization
    of both, final sum-normalization)."""
    h = np.full(n, 1.0 / n, dtype=np.float64)
    a = np.zeros(n, dtype=np.float64)
    for _ in range(n_iter):
        a = np.bincount(di, weights=h[si], minlength=n)
        h = np.bincount(si, weights=a[di], minlength=n)
        hm, am = h.max() if n else 0.0, a.max() if n else 0.0
        if hm > 0:
            h = h / hm
        if am > 0:
            a = a / am
    hs, as_ = h.sum(), a.sum()
    if hs > 0:
        h = h / hs
    if as_ > 0:
        a = a / as_
    return h, a


def _pagerank_weighted_golden(n: int, si: np.ndarray, di: np.ndarray,
                              w: np.ndarray, *, alpha: float = 0.85,
                              n_iter: int = 150) -> np.ndarray:
    """NetworkX pagerank(weight=...) transcription: contribution =
    rank * w / out-strength, dangling = zero out-strength, fixed n_iter."""
    strength = np.bincount(si, weights=w, minlength=n)
    safe = np.where(strength > 0, strength, 1.0)
    dangling = strength == 0
    x = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(n_iter):
        contrib = x / safe
        inc = np.bincount(di, weights=contrib[si] * w, minlength=n)
        base = (alpha * x[dangling].sum() + (1.0 - alpha)) / n
        x = alpha * inc + base
    return x


def _pagerank_personalized_golden(n: int, si: np.ndarray, di: np.ndarray,
                                  p: np.ndarray, *, alpha: float = 0.85,
                                  n_iter: int = 150) -> np.ndarray:
    """NetworkX pagerank(personalization=...) transcription: teleport AND
    dangling mass follow the normalized p vector; x starts uniform."""
    outdeg = np.bincount(si, minlength=n).astype(np.float64)
    safe = np.where(outdeg > 0, outdeg, 1.0)
    dangling = outdeg == 0
    x = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(n_iter):
        contrib = x / safe
        inc = np.bincount(di, weights=contrib[si], minlength=n)
        x = alpha * inc + (alpha * x[dangling].sum() + (1.0 - alpha)) * p
    return x


def _lpa_weighted_golden(n: int, si: np.ndarray, di: np.ndarray,
                         w: np.ndarray, ids: np.ndarray,
                         max_iter: int = 30) -> np.ndarray:
    """Weighted deterministic synchronous LPA per the engine spec: the
    vote weight between an undirected pair is the multiplicity summed over
    BOTH directions; each round every vertex adopts the max-vote label
    (ties -> smallest label); isolated vertices keep theirs."""
    from collections import defaultdict

    pair_w: dict[tuple[int, int], float] = defaultdict(float)
    for a, b, wt in zip(si.tolist(), di.tolist(), w.tolist()):
        if a != b:
            lo, hi = (a, b) if a < b else (b, a)
            pair_w[(lo, hi)] += wt
    adj: dict[int, list[tuple[int, float]]] = defaultdict(list)
    for (a, b), wt in pair_w.items():
        adj[a].append((b, wt))
        adj[b].append((a, wt))
    labels = ids.astype(np.int64).copy()
    for _ in range(max_iter):
        new = labels.copy()
        for v in range(n):
            nb = adj.get(v)
            if not nb:
                continue
            votes: dict[int, float] = defaultdict(float)
            for u, wt in nb:
                votes[int(labels[u])] += wt
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def _mis_golden(n: int, si: np.ndarray, di: np.ndarray, ids: np.ndarray,
                seed: int = 0) -> np.ndarray:
    """Greedy-by-priority maximal independent set: process vertices in
    ascending (blake2b64(seed:vid), vid) order, add unless a neighbor was
    already added — exactly the fixpoint Luby local-minima converges to
    with fixed unique priorities."""
    dig = np.fromiter(
        (int.from_bytes(hashlib.blake2b(
            b"%d:%d" % (seed, int(v)), digest_size=8).digest(), "big")
         for v in ids), dtype=np.uint64, count=n)
    adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in zip(si.tolist(), di.tolist()):
        if a != b:
            adj[a].append(b)
            adj[b].append(a)
    in_mis = np.zeros(n, dtype=np.int64)
    banned = np.zeros(n, dtype=bool)
    for v in np.lexsort((ids, dig)):
        v = int(v)
        if banned[v]:
            continue
        in_mis[v] = 1
        for u in adj[v]:
            banned[u] = True
    return in_mis


def _edge_betweenness_golden(n: int, si: np.ndarray, di: np.ndarray,
                             sources: np.ndarray) -> dict:
    """Sequential Brandes with EDGE accumulation (directed, raw
    dependency sums restricted to ``sources``) — independent of the
    engine's per-edge shard accumulator. Returns {(u_pos, v_pos): ebc}."""
    from collections import deque

    order = np.argsort(si, kind="stable")
    s_srt, d_srt = si[order], di[order]
    starts = np.searchsorted(s_srt, np.arange(n))
    ends = np.searchsorted(s_srt, np.arange(n), side="right")
    ebc: dict = {}
    for s in sources:
        s = int(s)
        dist = np.full(n, -1, dtype=np.int64)
        sigma = np.zeros(n, dtype=np.float64)
        dist[s], sigma[s] = 0, 1.0
        stack: list[int] = []
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for j in range(starts[v], ends[v]):
                u = int(d_srt[j])
                if dist[u] < 0:
                    dist[u] = dist[v] + 1
                    q.append(u)
                if dist[u] == dist[v] + 1:
                    sigma[u] += sigma[v]
        delta = np.zeros(n, dtype=np.float64)
        for v in reversed(stack):
            for j in range(starts[v], ends[v]):
                u = int(d_srt[j])
                if dist[u] == dist[v] + 1:
                    c = sigma[v] / sigma[u] * (1.0 + delta[u])
                    ebc[(v, u)] = ebc.get((v, u), 0.0) + c
                    delta[v] += c
    return ebc


def _betweenness_golden(n: int, si: np.ndarray, di: np.ndarray,
                        sources: np.ndarray) -> np.ndarray:
    """Sequential Brandes (unweighted, directed, raw dependency sums
    restricted to ``sources``, source excluded, no normalization) —
    independent of the engine's k-source vectorized supersteps."""
    from collections import deque

    order = np.argsort(si, kind="stable")
    s_srt, d_srt = si[order], di[order]
    starts = np.searchsorted(s_srt, np.arange(n))
    ends = np.searchsorted(s_srt, np.arange(n), side="right")
    bc = np.zeros(n, dtype=np.float64)
    for s in sources:
        s = int(s)
        dist = np.full(n, -1, dtype=np.int64)
        sigma = np.zeros(n, dtype=np.float64)
        dist[s], sigma[s] = 0, 1.0
        stack: list[int] = []
        preds: dict[int, list[int]] = {}
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for j in range(starts[v], ends[v]):
                u = int(d_srt[j])
                if dist[u] < 0:
                    dist[u] = dist[v] + 1
                    q.append(u)
                if dist[u] == dist[v] + 1:
                    sigma[u] += sigma[v]
                    preds.setdefault(u, []).append(v)
        delta = np.zeros(n, dtype=np.float64)
        for v in reversed(stack):
            for u in preds.get(v, ()):
                delta[u] += sigma[u] / sigma[v] * (1.0 + delta[v])
            if v != s:
                bc[v] += delta[v]
    return bc


def _ktruss_golden(si: np.ndarray, di: np.ndarray, ids: np.ndarray,
                   k: int) -> pa.Table:
    """NetworkX nx.k_truss edge set (canonical src < dst vertex ids) —
    fully independent of the engine's iterative support peel."""
    import networkx as nx

    g = nx.Graph()
    for a, b in zip(si.tolist(), di.tolist()):
        if a != b:
            g.add_edge(int(ids[a]), int(ids[b]))
    t = nx.k_truss(g, k)
    pairs = sorted((min(a, b), max(a, b)) for a, b in t.edges())
    return pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64())})


def _hyperball_golden(n: int, si: np.ndarray, di: np.ndarray,
                      ids: np.ndarray, p: int = 9,
                      max_t: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """Sequential transcription of the HyperBall recurrence
    (graph/hyperball.py): registers seeded by the published avalanche
    kernel, one max-merge of every vertex's counter with its out-
    neighbors' counters per round to the reachability fixpoint, harmonic
    gain clamped at 0 per round. uint8 max-merges are order-free and the
    per-row estimate sums run in the identical axis order, so the
    transcription is bit-identical to both engine formulations."""
    from metis_ray.graph.hyperball import _estimate_rows, _init_registers

    regs = _init_registers(ids.astype(np.int64), p)
    est = _estimate_rows(regs)
    harmonic = np.zeros(n, dtype=np.float64)
    order = np.argsort(si, kind="stable")
    s_srt, d_srt = si[order], di[order]
    bounds = np.flatnonzero(np.r_[True, s_srt[1:] != s_srt[:-1]])
    srcs = s_srt[bounds]
    for t in range(1, max_t + 1):
        new = regs.copy()
        if len(s_srt):
            combined = np.maximum.reduceat(regs[d_srt], bounds, axis=0)
            new[srcs] = np.maximum(new[srcs], combined)
        if np.array_equal(new, regs):
            break
        regs = new
        prev, est = est, _estimate_rows(regs)
        harmonic += np.maximum(est - prev, 0.0) / t
    return est, harmonic


def _ann_pq_golden(sf_dir: str, vec_ids: np.ndarray, mat: np.ndarray, *,
                   k: int = 10, n_queries: int = 5, m: int = 8,
                   ksub: int = 256, iters: int = 10,
                   sample_size: int = 2048, seed: int = 42) -> pa.Table:
    """Sequential transcription of similarity.ann_pq_topk: the codebooks
    are the engine's own DRIVER-SIDE deterministic trainer
    (train_pq_codebooks — single-process by construction, the
    coarse-quantizer precedent); encoding, the per-query ADC lookup
    table and the (score desc, id asc) top-k are re-derived here. The
    engine's per-row float math is batch-invariant (fixed subspace
    order), so equality is exact, not approximate."""
    from metis_ray.pipelines.similarity import _pq_encode, \
        train_pq_codebooks

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = mat / norms
    order = np.argsort(vec_ids)
    qsel = order[:n_queries]
    books = train_pq_codebooks(sf_dir, m, ksub, iters, sample_size, seed)
    dsub = books.shape[2]
    codes = _pq_encode(mn, books)
    o_q, o_n, o_r = [], [], []
    for qi in qsel:
        lut = np.stack([books[j] @ mn[qi, j * dsub:(j + 1) * dsub]
                        for j in range(m)])
        scores = np.zeros(len(mn), np.float64)
        for j in range(m):
            scores += lut[j, codes[:, j]]
        nbr, rnk = _ann_rank(vec_ids, scores, k)
        o_q.extend([int(vec_ids[qi])] * len(nbr))
        o_n.extend(int(v) for v in nbr)
        o_r.extend(int(r) for r in rnk)
    return pa.table({"query_id": pa.array(o_q, pa.int64()),
                     "neighbor_id": pa.array(o_n, pa.int64()),
                     "rnk": pa.array(o_r, pa.int64())})


def _ann_ivfpq_golden(sf_dir: str, vec_ids: np.ndarray, mat: np.ndarray,
                      *, k: int = 10, n_queries: int = 5,
                      n_centroids: int = 16, nprobe: int = 4,
                      iters: int = 8, sample_size: int = 2048,
                      seed: int = 42, m: int = 8, ksub: int = 256,
                      pq_iters: int = 10) -> pa.Table:
    """Sequential transcription of similarity.ann_ivfpq_topk: both
    quantizers are the engines' own driver-side deterministic trainers;
    assignment, probe filtering, ADC scoring and the top-k are
    re-derived here (batch-invariant per-row math => exact twin)."""
    from metis_ray.pipelines.similarity import _pq_encode, \
        train_coarse_quantizer, train_pq_codebooks

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = mat / norms
    order = np.argsort(vec_ids)
    qsel = order[:n_queries]
    cents = train_coarse_quantizer(sf_dir, n_centroids, iters,
                                   sample_size, seed)
    books = train_pq_codebooks(sf_dir, m, ksub, pq_iters, sample_size,
                               seed)
    dsub = books.shape[2]
    assign = np.argmax(mn @ cents.T, axis=1)
    codes = _pq_encode(mn, books)
    qprobe = np.argsort(-(mn[qsel] @ cents.T), axis=1)[:, :nprobe]
    o_q, o_n, o_r = [], [], []
    for row, qi in enumerate(qsel):
        cand = np.flatnonzero(np.isin(assign, qprobe[row]))
        if len(cand) == 0:
            continue
        lut = np.stack([books[j] @ mn[qi, j * dsub:(j + 1) * dsub]
                        for j in range(m)])
        scores = np.zeros(len(cand), np.float64)
        for j in range(m):
            scores += lut[j, codes[cand, j]]
        nbr, rnk = _ann_rank(vec_ids[cand], scores, k)
        o_q.extend([int(vec_ids[qi])] * len(nbr))
        o_n.extend(int(v) for v in nbr)
        o_r.extend(int(r) for r in rnk)
    return pa.table({"query_id": pa.array(o_q, pa.int64()),
                     "neighbor_id": pa.array(o_n, pa.int64()),
                     "rnk": pa.array(o_r, pa.int64())})


def graph_golden_dir_for_sf(sf_dir: str, root: str = GOLDEN_ROOT) -> str:
    """Materialize (once) golden_kcore.parquet / golden_scc.parquet for the
    sf dir's corpus graph. Reads ONLY the corpus generator's golden tables
    (known-by-construction edge set), never engine output."""
    from metis_ray.corpus import corpus_dir_for_sf

    g = corpus_dir_for_sf(sf_dir)
    edges_path = os.path.join(g, "golden_edges_file.parquet")
    out = os.path.join(root, f"graph_{os.path.basename(os.path.normpath(g))}"
                             f"_v{_GRAPH_GOLDEN_VERSION}")
    man = os.path.join(out, "manifest.json")
    src_sig = {"src": edges_path, "mtime": os.path.getmtime(edges_path),
               "ver": _GRAPH_GOLDEN_VERSION}
    if os.path.exists(man):
        with open(man) as fh:
            if json.load(fh) == src_sig:
                return out

    f = pq.read_table(os.path.join(g, "golden_files.parquet"),
                      columns=["vertex_id", "quarantined"])
    keep = ~f["quarantined"].to_numpy(zero_copy_only=False)
    ids = np.sort(f["vertex_id"].to_numpy(zero_copy_only=False)[keep]
                  .astype(np.int64))
    n = len(ids)
    e = pq.read_table(edges_path, columns=["src", "dst", "multiplicity"])
    src = e["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = e["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    mult = e["multiplicity"].to_numpy(zero_copy_only=False).astype(np.float64)
    ns = src != dst                                   # drop self-loops
    si = np.searchsorted(ids, src[ns])
    di = np.searchsorted(ids, dst[ns])
    wt = mult[ns]

    def adjacency(a: np.ndarray, b: np.ndarray) -> list[np.ndarray]:
        if len(a):
            pairs = np.unique(np.stack([a, b], axis=1), axis=0)
            a, b = pairs[:, 0], pairs[:, 1]
        starts = np.searchsorted(a, np.arange(n))
        ends = np.searchsorted(a, np.arange(n), side="right")
        return [b[s:t] for s, t in zip(starts, ends)]

    und = adjacency(np.concatenate([si, di]), np.concatenate([di, si]))
    cores = _core_numbers(n, und)
    comp = _scc_labels(n, adjacency(si, di), ids)

    tmp = out + ".tmp"
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    pq.write_table(pa.table({"v": pa.array(ids, pa.int64()),
                             "core": pa.array(cores, pa.int64())}),
                   os.path.join(tmp, "golden_kcore.parquet"))
    pq.write_table(pa.table({"v": pa.array(ids, pa.int64()),
                             "scc": pa.array(comp, pa.int64())}),
                   os.path.join(tmp, "golden_scc.parquet"))
    # weighted tail: weight = multiplicity over the distinct directed edges
    # (exactly the rows the weighted graph dir persists); seeds = the two
    # smallest vertex ids (the engine queries' _min_vertex_ids convention)
    dist = _sssp_golden(n, si, di, wt, np.arange(min(2, n)))
    pq.write_table(pa.table({"v": pa.array(ids, pa.int64()),
                             "dist": pa.array(dist, pa.float64())}),
                   os.path.join(tmp, "golden_sssp.parquet"))
    eig = _eigenvector_golden(n, si, di, wt)
    pq.write_table(pa.table({"v": pa.array(ids, pa.int64()),
                             "eigenvector": pa.array(np.round(eig, 6),
                                                     pa.float64())}),
                   os.path.join(tmp, "golden_eigenvector.parquet"))
    katz = _katz_golden(n, si, di, wt, alpha=0.01, beta=1.0)
    pq.write_table(pa.table({"v": pa.array(ids, pa.int64()),
                             "katz": pa.array(np.round(katz, 6),
                                              pa.float64())}),
                   os.path.join(tmp, "golden_katz.parquet"))
    h, a = _hits_golden(n, si, di)
    pq.write_table(pa.table({"v": pa.array(ids, pa.int64()),
                             "hub": pa.array(np.round(h, 6), pa.float64()),
                             "authority": pa.array(np.round(a, 6),
                                                   pa.float64())}),
                   os.path.join(tmp, "golden_hits.parquet"))
    prw = _pagerank_weighted_golden(n, si, di, wt)
    pq.write_table(pa.table({"v": pa.array(ids, pa.int64()),
                             "rank": pa.array(np.round(prw, 6),
                                              pa.float64())}),
                   os.path.join(tmp, "golden_pagerank_weighted.parquet"))
    # personalization = the engine queries' convention: the two smallest
    # vertex ids with teleport weights 3:1
    p = np.zeros(n, dtype=np.float64)
    if n:
        p[0] = 0.75
    if n > 1:
        p[1] = 0.25
    elif n:
        p[0] = 1.0
    prp = _pagerank_personalized_golden(n, si, di, p)
    pq.write_table(pa.table({"v": pa.array(ids, pa.int64()),
                             "rank": pa.array(np.round(prp, 6),
                                              pa.float64())}),
                   os.path.join(tmp, "golden_pagerank_personalized.parquet"))
    lw = _lpa_weighted_golden(n, si, di, wt, ids)
    pq.write_table(pa.table({"v": pa.array(ids, pa.int64()),
                             "label": pa.array(lw, pa.int64())}),
                   os.path.join(tmp, "golden_labelprop_weighted.parquet"))
    mis = _mis_golden(n, si, di, ids)
    pq.write_table(pa.table({"v": pa.array(ids, pa.int64()),
                             "in_mis": pa.array(mis.astype(bool),
                                                pa.bool_())}),
                   os.path.join(tmp, "golden_mis.parquet"))
    # exact k-source harmonic centrality: per-source sequential BFS
    # accumulating 1/dist (the exact twin of HyperBall's estimate)
    from collections import deque as _deque
    h_order = np.argsort(si, kind="stable")
    h_s, h_d = si[h_order], di[h_order]
    h_starts = np.searchsorted(h_s, np.arange(n))
    h_ends = np.searchsorted(h_s, np.arange(n), side="right")
    harm = np.zeros(n, dtype=np.float64)
    clo_r = np.zeros(n, dtype=np.float64)       # #sources reaching v
    clo_sd = np.zeros(n, dtype=np.float64)      # Σ d(s, v) over them
    for s0 in range(min(16, n)):
        hd = np.full(n, -1, dtype=np.int64)
        hd[s0] = 0
        hq = _deque([s0])
        while hq:
            v0 = hq.popleft()
            for j0 in range(h_starts[v0], h_ends[v0]):
                u0 = int(h_d[j0])
                if hd[u0] < 0:
                    hd[u0] = hd[v0] + 1
                    hq.append(u0)
        pos_h = hd > 0
        harm[pos_h] += 1.0 / hd[pos_h]
        clo_r[pos_h] += 1.0
        clo_sd[pos_h] += hd[pos_h]
    pq.write_table(pa.table({
        "v": pa.array(ids, pa.int64()),
        "harmonic": pa.array(np.round(harm, 6), pa.float64())}),
        os.path.join(tmp, "golden_harmonic.parquet"))
    # k-source closeness: the unscaled r/sd fold over the SAME 16-source
    # BFS distances (the engine's closeness_shard(sources=...) variant)
    clo = np.divide(clo_r, clo_sd, out=np.zeros_like(clo_r),
                    where=clo_sd > 0)
    pq.write_table(pa.table({
        "v": pa.array(ids, pa.int64()),
        "closeness": pa.array(np.round(clo, 6), pa.float64())}),
        os.path.join(tmp, "golden_closeness.parquet"))
    # Kahn topological layers over the same adjacency (sequential peel);
    # vertices on or downstream of a cycle keep layer = -1
    indeg = np.zeros(n, dtype=np.int64)
    np.add.at(indeg, di, 1)
    t_layer = np.full(n, -1, dtype=np.int64)
    frontier = np.flatnonzero(indeg == 0)
    t0 = 0
    while len(frontier):
        t_layer[frontier] = t0
        nxt: list[int] = []
        for v0 in frontier:
            for j0 in range(h_starts[v0], h_ends[v0]):
                u0 = int(h_d[j0])
                indeg[u0] -= 1
                if indeg[u0] == 0:
                    nxt.append(u0)
        frontier = np.asarray(nxt, dtype=np.int64)
        t0 += 1
    pq.write_table(pa.table({
        "v": pa.array(ids, pa.int64()),
        "layer": pa.array(t_layer, pa.int64())}),
        os.path.join(tmp, "golden_topo.parquet"))
    # Louvain phase-1: the module's documented sequential transcription
    # over the undirected multiplicity-weighted pair set
    from metis_ray.graph.louvain import louvain_reference
    lv_pairs: dict = {}
    for a0, b0, w0 in zip(ids[si].tolist(), ids[di].tolist(), wt.tolist()):
        k0 = (min(a0, b0), max(a0, b0))
        lv_pairs[k0] = lv_pairs.get(k0, 0) + int(w0)
    lv = louvain_reference(lv_pairs, ids.tolist(), levels=2,
                           max_rounds=8)
    pq.write_table(pa.table({
        "v": pa.array(ids, pa.int64()),
        "comm": pa.array([lv[int(v)] for v in ids], pa.int64())}),
        os.path.join(tmp, "golden_louvain.parquet"))
    eb = _edge_betweenness_golden(n, si, di, np.arange(min(16, n)))
    eb_rows = sorted((int(ids[a]), int(ids[b]), round(v, 6))
                     for (a, b), v in eb.items())
    pq.write_table(pa.table({
        "src": pa.array([r[0] for r in eb_rows], pa.int64()),
        "dst": pa.array([r[1] for r in eb_rows], pa.int64()),
        "betweenness": pa.array([r[2] for r in eb_rows], pa.float64())}),
        os.path.join(tmp, "golden_edge_betweenness.parquet"))
    bc = _betweenness_golden(n, si, di, np.arange(min(16, n)))
    pq.write_table(pa.table({"v": pa.array(ids, pa.int64()),
                             "betweenness": pa.array(np.round(bc, 6),
                                                     pa.float64())}),
                   os.path.join(tmp, "golden_betweenness.parquet"))
    pq.write_table(_ktruss_golden(si, di, ids, 4),
                   os.path.join(tmp, "golden_ktruss.parquet"))
    # deterministic sampling transcriptions: walks_reference /
    # khop_reference are the modules' DOCUMENTED sequential references
    # (the pytest goldens), evaluated over the generator's edge table with
    # the registered queries' exact arguments
    from collections import defaultdict as _dd

    from metis_ray.graph.sampling import khop_reference
    from metis_ray.graph.walks import walks_reference

    adj_ids: dict = _dd(set)
    wmap: dict = {}
    for a, b, wv in zip(ids[si].tolist(), ids[di].tolist(), wt.tolist()):
        adj_ids[a].add(b)
        wmap[(a, b)] = wmap.get((a, b), 0.0) + wv
    rows = walks_reference(adj_ids, ids[:32].tolist(), length=8, seed=42)
    pq.write_table(pa.table({
        "walk_id": pa.array([r[0] for r in rows], pa.int64()),
        "step": pa.array([r[1] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows], pa.int64())}),
        os.path.join(tmp, "golden_walks.parquet"))
    rows = walks_reference(adj_ids, ids[:32].tolist(), length=8, seed=42,
                           weights=wmap)
    pq.write_table(pa.table({
        "walk_id": pa.array([r[0] for r in rows], pa.int64()),
        "step": pa.array([r[1] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows], pa.int64())}),
        os.path.join(tmp, "golden_walks_weighted.parquet"))
    from metis_ray.graph.node2vec import node2vec_reference
    rows = node2vec_reference(adj_ids, ids[:32].tolist(), length=8,
                              p=0.5, q=2.0, seed=42)
    pq.write_table(pa.table({
        "walk_id": pa.array([r[0] for r in rows], pa.int64()),
        "step": pa.array([r[1] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows], pa.int64())}),
        os.path.join(tmp, "golden_node2vec.parquet"))
    rows = khop_reference(adj_ids, ids[:16].tolist(), fanouts=(8, 4),
                          seed=42)
    pq.write_table(pa.table({
        "hop": pa.array([r[0] for r in rows], pa.int64()),
        "src": pa.array([r[1] for r in rows], pa.int64()),
        "dst": pa.array([r[2] for r in rows], pa.int64())}),
        os.path.join(tmp, "golden_khop.parquet"))
    # minimum spanning forest: sequential Kruskal under the strict
    # (weight, src, dst) total order — provably equal to the engine's
    # Boruvka under the same order (graph/mst.py module docstring)
    from metis_ray.graph.mst import mst_reference
    mst_rows = mst_reference(
        list(zip(ids[si].tolist(), ids[di].tolist(), wt.tolist())),
        ids.tolist())
    pq.write_table(pa.table({
        "src": pa.array([r[0] for r in mst_rows], pa.int64()),
        "dst": pa.array([r[1] for r in mst_rows], pa.int64()),
        "weight": pa.array([r[2] for r in mst_rows], pa.float64())}),
        os.path.join(tmp, "golden_mst.parquet"))
    # double-sweep diameter lower bound: exact sequential transcription
    from metis_ray.graph.algos import diameter_reference
    dia = diameter_reference(adj_ids, ids.tolist())
    pq.write_table(pa.table({
        "start": pa.array([dia["start"]], pa.int64()),
        "far_vertex": pa.array([dia["far_vertex"]], pa.int64()),
        "diameter_lb": pa.array([dia["diameter_lb"]], pa.int64())}),
        os.path.join(tmp, "golden_diameter.parquet"))
    # greedy coloring: the sequential greedy in (blake2b(0,v), v) order —
    # provably what Jones-Plassmann computes (graph/algos.py docstring)
    from metis_ray.graph.algos import coloring_reference
    col_rows = coloring_reference(adj_ids, ids.tolist(), seed=0)
    pq.write_table(pa.table({
        "v": pa.array([r[0] for r in col_rows], pa.int64()),
        "color": pa.array([r[1] for r in col_rows], pa.int64())}),
        os.path.join(tmp, "golden_coloring.parquet"))
    hb_ball, hb_harm = _hyperball_golden(n, si, di, ids)
    pq.write_table(pa.table({
        "v": pa.array(ids, pa.int64()),
        "ball": pa.array(np.round(hb_ball, 3), pa.float64()),
        "harmonic": pa.array(np.round(hb_harm, 3), pa.float64())}),
        os.path.join(tmp, "golden_hyperball.parquet"))
    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump(src_sig, fh)
    if os.path.exists(out):
        import shutil
        shutil.rmtree(out)
    os.replace(tmp, out)
    return out
