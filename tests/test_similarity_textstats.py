"""ANN vs brute force; text-analysis sanity; multimodal plumbing."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from metis_ray.pipelines import multimodal, similarity, textstats

SF = "/root/testdata/sf0.001"


def _brute_topk(k=10, n_queries=5):
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().sort_values("vec_id")
    mat = np.vstack([np.asarray(v, np.float64) for v in t["embedding"]])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = t["vec_id"].to_numpy()
    q = mat[:n_queries]
    sims = q @ mat.T
    out = {}
    for qi in range(n_queries):
        order = sorted(range(len(ids)), key=lambda j: (-sims[qi, j], ids[j]))
        out[ids[qi]] = [int(ids[j]) for j in order[:k]]
    return out


def test_ann_topk_exact_matches_bruteforce():
    got = similarity.ann_topk(SF, k=10, n_queries=5)
    want = _brute_topk()
    for qid, neighbors in want.items():
        g = got[got["query_id"] == qid].sort_values("rnk")["neighbor_id"].tolist()
        assert g == neighbors, qid


def test_ann_lsh_recall():
    got = similarity.ann_lsh_topk(SF, k=10, n_queries=5)
    want = _brute_topk()
    hits = total = 0
    for qid, neighbors in want.items():
        g = set(got[got["query_id"] == qid]["neighbor_id"])
        hits += len(g & set(neighbors))
        total += len(neighbors)
    assert hits / total >= 0.5, f"LSH recall too low: {hits}/{total}"
    # self-match must always survive (query is its own nearest neighbor)
    for qid in want:
        g = got[(got["query_id"] == qid) & (got["rnk"] == 1)]
        assert list(g["neighbor_id"]) == [qid]


def test_token_counts_independent_recount():
    out = textstats.token_counts(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for _, row in docs.head(50).iterrows():
        assert out.loc[row["doc_id"], "n_tokens"] == len(row["text"].split())


def test_lang_quality_shape():
    out = textstats.lang_quality(SF).to_pandas()
    assert len(out) == 500
    assert set(out["lang_pred"]) <= {"en", "es", "fr", "de", "zh", "und"}
    assert out["quality"].between(0, 1).all()


def test_multimodal_plumbing():
    out = multimodal.decode_features(SF, batch_size=32).to_pandas()
    assert len(out) == 500
    f0 = np.asarray(out["feature"].iloc[0])
    assert f0.shape == (multimodal.DecodeAndFeaturize.FEATURE_DIM,)
    assert (0 <= f0).all() and (f0 <= 1).all()
    # deterministic across runs
    again = multimodal.decode_features(SF, batch_size=64).to_pandas()
    m1 = dict(zip(out["asset_id"], [tuple(v) for v in out["feature"]]))
    m2 = dict(zip(again["asset_id"], [tuple(v) for v in again["feature"]]))
    assert m1 == m2


def test_multimodal_real_decoder_gate():
    """The real decoder handles actual PNG/WAV byte streams; anything
    outside the stdlib-codec scope still raises the documented
    NotImplementedError (the PIL/ffmpeg gate)."""
    stage = multimodal.DecodeAndFeaturize(decoder="real")
    with pytest.raises(NotImplementedError):
        stage._real_decode(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # JPEG magic


def test_ann_ivf_recall():
    """IVF-flat recall vs the exact result (the list-probing scale path);
    nprobe=all must equal exact search exactly."""
    exact = similarity.ann_topk(SF, k=10, n_queries=5)
    want = {(q, n) for q, n in zip(exact["query_id"], exact["neighbor_id"])}

    got = similarity.ann_ivf_topk(SF, k=10, n_queries=5,
                                  n_centroids=16, nprobe=4)
    hits = sum((q, n) in want
               for q, n in zip(got["query_id"], got["neighbor_id"]))
    assert hits / len(want) >= 0.5, f"IVF recall too low: {hits}/{len(want)}"
    # every query must at least find itself
    self_found = {q for q, n in zip(got["query_id"], got["neighbor_id"])
                  if q == n}
    assert self_found == set(exact["query_id"].unique())

    # probing every list degenerates to exact search
    full = similarity.ann_ivf_topk(SF, k=10, n_queries=5,
                                   n_centroids=8, nprobe=8)
    assert full.values.tolist() == exact.values.tolist()


def test_multimodal_resize_and_frames():
    """Resize emits exactly width*height bytes per asset with updated meta;
    frame sampling emits every 4th 256-byte slice, byte-identical to the
    source payload; the real-codec path stays gated."""
    from metis_ray.pipelines import multimodal

    rs = multimodal.resize_assets(SF, width=16, height=12).to_pandas()
    assert len(rs) == 500
    assert all(len(p) == 16 * 12 for p in rs["payload"])
    assert all(m["format"] == "fake/resized" and m["width"] == 16
               and m["height"] == 12 for m in rs["meta"])

    fr = multimodal.frame_sample(SF, every_n=4).to_pandas()
    src = multimodal.synthesize_binary_table(SF).to_pandas()
    payloads = dict(zip(src["asset_id"], src["payload"]))
    assert (fr["frame_idx"] % 4 == 0).all()
    for aid, idx, frame in zip(fr["asset_id"], fr["frame_idx"], fr["frame"]):
        assert frame == payloads[aid][idx * 256:(idx + 1) * 256]
    # every asset contributes at least frame 0
    assert set(fr["asset_id"]) == set(src["asset_id"])



def test_quality_filter_consistent():
    from metis_ray.pipelines import textstats

    kept = textstats.quality_filter(SF, min_quality=0.5, lang="en").to_pandas()
    full = textstats.lang_quality(SF).to_pandas()
    want = full[(full["quality"] >= 0.5) & (full["lang_pred"] == "en")]
    assert sorted(kept["doc_id"]) == sorted(want["doc_id"])


def test_distributed_scan_matches_sequential():
    """Two-phase parallel prefix-scan == sequential cumsum; bin packing =
    floor(exclusive_cumsum / budget) with contiguous 0-based bins."""
    from metis_ray.pipelines.scan import cum_tokens, pack_bins

    df = cum_tokens(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (df["cum_tokens"].to_numpy()
            == np.cumsum(df["n_tokens"].to_numpy())).all()

    pb = pack_bins(SF, budget=1000).to_pandas().sort_values("doc_id")
    excl = df["cum_tokens"].to_numpy() - df["n_tokens"].to_numpy()
    assert (pb["bin_id"].to_numpy() == excl // 1000).all()
    bins = np.unique(pb["bin_id"].to_numpy())
    assert bins[0] == 0 and (np.diff(bins) == 1).all()


def test_kmeans_matches_sequential_reference():
    """Distributed spherical k-means == a single-process numpy transcription
    of the same recurrence (same init, same update, same iteration count)."""
    from metis_ray.pipelines.similarity import kmeans_clusters

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().sort_values("vec_id")
    mat = np.vstack([np.asarray(v, np.float64) for v in t["embedding"]])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = t["vec_id"].to_numpy()
    k, iters = 8, 5
    cents = mat[np.argsort(ids)[:k]].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(k):
            sel = mat[assign == c]
            if len(sel):
                v = sel.sum(axis=0)
                cents[c] = v / np.linalg.norm(v)
    want = dict(zip(ids, np.argmax(mat @ cents.T, axis=1)))

    got_df = kmeans_clusters(SF, k=k, iters=iters).to_pandas()
    got = dict(zip(got_df["vec_id"], got_df["cluster"]))
    assert got == want
    assert len(set(got.values())) > 1     # nondegenerate clustering


def test_distributed_cumsum_multiblock():
    """The scan's rank/offset logic depends on Dataset.sort emitting blocks
    in global order — force MANY blocks from shuffled input and compare to
    the sequential cumsum."""
    import pandas as pd
    import ray.data as rd
    from metis_ray.pipelines.scan import distributed_cumsum

    rng = np.random.RandomState(7)
    n = 5000
    df = pd.DataFrame({"k": rng.permutation(n), "v": rng.randint(0, 100, n)})
    ds = rd.from_pandas(df).repartition(16)
    out = (distributed_cumsum(ds, ["k"], "v", "cum").to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = df.sort_values("k").reset_index(drop=True)["v"].cumsum()
    assert (out["cum"].to_numpy() == want.to_numpy()).all()


def test_repetition_stats_matches_duckdb():
    """Engine repetition signals == a DuckDB transcription (same float op
    order: distinct/max(n,1), top-bigram count/max(n-1,1), round 6)."""
    import duckdb
    from metis_ray.pipelines import textstats

    sf = "/root/testdata/sf0.001"
    got = (textstats.repetition_stats(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS w
          FROM documents),
        bg AS (
          SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct,
                 CASE WHEN len(w) < 2 THEN []::VARCHAR[]
                      ELSE list_transform(generate_series(1, len(w) - 1),
                                          i -> w[i] || ' ' || w[i+1])
                 END AS gs
          FROM toks),
        cnt AS (
          SELECT doc_id, g, count(*) AS c
          FROM (SELECT doc_id, unnest(gs) AS g FROM bg) GROUP BY doc_id, g),
        top AS (SELECT doc_id, max(c) AS mc, sum(c) AS tot
                FROM cnt GROUP BY doc_id)
        SELECT b.doc_id, b.n_words,
               round(b.n_distinct / (1.0 * greatest(b.n_words, 1)), 6)
                   AS distinct_word_ratio,
               round(coalesce(t.mc, 0) / (1.0 * greatest(coalesce(t.tot, 0), 1)), 6)
                   AS top_bigram_frac
        FROM bg b LEFT JOIN top t USING (doc_id)
        ORDER BY doc_id
    """).fetchdf()

    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["n_words"]) == list(want["n_words"])
    np.testing.assert_allclose(got["distinct_word_ratio"],
                               want["distinct_word_ratio"], atol=1e-9)
    np.testing.assert_allclose(got["top_bigram_frac"],
                               want["top_bigram_frac"], atol=1e-9)


def test_misra_gries_guarantees():
    """MG invariants on a zipf stream with heavy compression (k=512):
    every item with true frequency > n/k survives; reported counts never
    exceed the truth and undercount by <= n/k per merge level (2 levels)."""
    from metis_ray.functions.sketch import mg_compress, mg_merge

    rng = np.random.RandomState(0)
    x = rng.zipf(1.5, 300_000) % 50_000
    k = 512
    parts = []
    for c in np.array_split(x, 23):
        u, n = np.unique(c, return_counts=True)
        parts.append(mg_compress(u, n.astype(np.int64), k))
    sk = parts[0]
    for p in parts[1:]:
        sk = mg_merge(sk, p, k)
    items, counts = sk
    true_u, true_n = np.unique(x, return_counts=True)
    true = dict(zip(true_u.tolist(), true_n.tolist()))
    bound = 2 * len(x) / k
    for it, ct in zip(items.tolist(), counts.tolist()):
        assert ct <= true[it] and true[it] - ct <= bound
    survived = set(items.tolist())
    for u, n in true.items():
        if n > len(x) / k:
            assert u in survived


def test_heavy_terms_matches_exact_counter():
    """On the testdata corpus (small vocabulary, k >> vocab) MG is exact:
    top terms == a brute-force Counter over every token."""
    from collections import Counter
    import pandas as pd
    from metis_ray.pipelines.textstats import heavy_terms

    sf = "/root/testdata/sf0.001"
    got = heavy_terms(sf, top=20)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    cnt = Counter()
    for t in docs["text"]:
        cnt.update(t.lower().split())
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(got["term"], got["approx_count"])) == want


def test_pii_scrub_matches_duckdb_on_planted_corpus(tmp_path):
    """Exact-equality twin: plant emails / IPv4s / phone runs in a tmp
    documents table, run the Arrow-RE2 pipeline, and compare against the
    SAME pattern composition in DuckDB (also RE2) — counts on the
    intermediate text at each step, replacements in the same order."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from metis_ray.pipelines.textstats import PII_PATTERNS, pii_scrub

    texts = [
        "contact alice.smith+spam@ex-ample.co.uk or bob@x.io today",
        "server at 10.0.0.1 and 192.168.100.254, not 1.2.3",
        "call +1 555-867-5309 or 0800 123 456 now",
        "mixed: eve@corp.com from 172.16.0.9 dialed 555-123-4567",
        "clean text with no identifiers at all",
        "",
        "a@b.cd 1.2.3.4 12-34-56-78",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(["en"] * len(texts)),
                    "source": pa.array(["t"] * len(texts)),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64())})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    got = (pii_scrub(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    sql = "SELECT doc_id, text FROM read_parquet(?)"
    prev = "s0"
    ctes = [f"s0 AS ({sql})"]
    for i, (name, pat, ph) in enumerate(PII_PATTERNS, 1):
        p = pat.replace("'", "''")
        ctes.append(
            f"s{i} AS (SELECT doc_id, "
            f"len(regexp_extract_all(text, '{p}')) AS n_{name}, "
            f"regexp_replace(text, '{p}', '{ph}', 'g') AS text, "
            f"* EXCLUDE (doc_id, text) FROM {prev})")
        prev = f"s{i}"
    q = ("WITH " + ", ".join(ctes) +
         f" SELECT doc_id, n_email, n_ipv4, n_phone, text AS text_clean "
         f"FROM {prev} ORDER BY doc_id")
    want = duckdb.execute(q, [str(tmp_path / "documents.parquet")]).df()

    pd.testing.assert_frame_equal(
        got[["doc_id", "n_email", "n_ipv4", "n_phone", "text_clean"]],
        want.astype({"n_email": "int64", "n_ipv4": "int64",
                     "n_phone": "int64"}))
    # the planted rows actually exercise every pattern
    assert got["n_email"].sum() >= 4
    assert got["n_ipv4"].sum() >= 4
    assert got["n_phone"].sum() >= 3


def test_pii_scrub_runs_on_sf_corpus():
    got = textstats.pii_scrub(SF).to_pandas()
    assert len(got) == 500
    assert set(got.columns) == {"doc_id", "text_clean", "n_email",
                                "n_ipv4", "n_phone"}


def test_shuffle_docs_matches_duckdb_order():
    """Deterministic global shuffle: the engine's distributed sort by
    md5(seed:doc_id) yields EXACTLY the order DuckDB produces for the same
    expression — reproducible training order, any parallelism."""
    import duckdb

    got = textstats.shuffle_docs(SF, seed=7).to_pandas()
    want = duckdb.execute(
        "SELECT doc_id, md5(concat('7:', CAST(doc_id AS VARCHAR))) AS k "
        "FROM read_parquet(?) ORDER BY k",
        [f"{SF}/documents.parquet"]).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["shuffle_key"].tolist() == want["k"].tolist()
    # actually shuffled (not id order), and a different seed reorders
    assert got["doc_id"].tolist() != sorted(got["doc_id"].tolist())
    got2 = textstats.shuffle_docs(SF, seed=8).to_pandas()
    assert got2["doc_id"].tolist() != got["doc_id"].tolist()


def test_tfidf_top_terms_matches_transcription():
    """tfidf_top_terms vs an exact sequential numpy transcription of the
    same recurrence (tf * ln(N/df), ties term-asc) — per-row equality."""
    import pandas as pd

    got = (textstats.tfidf_top_terms(SF, top=3).to_pandas()
           .sort_values(["doc_id", "rnk"]).reset_index(drop=True))

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    n = len(docs)
    from collections import Counter
    df_counter: Counter = Counter()
    per_doc = {}
    for r in docs.itertuples():
        cnt = Counter(r.text.lower().split())
        per_doc[r.doc_id] = cnt
        df_counter.update(cnt.keys())
    rows = []
    for did, cnt in per_doc.items():
        if not cnt:
            continue
        scored = sorted(
            ((-tf * np.log(float(n) / df_counter[t]), t) for t, tf in cnt.items()))
        for rnk, (neg, t) in enumerate(scored[:3], 1):
            rows.append((did, t, round(-neg, 9), rnk))
    want = (pd.DataFrame(rows, columns=["doc_id", "term", "tfidf", "rnk"])
            .sort_values(["doc_id", "rnk"]).reset_index(drop=True))

    assert len(got) == len(want)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    np.testing.assert_allclose(got["tfidf"], want["tfidf"], atol=1e-9)


def test_export_packed_resumable(tmp_path):
    """Partitioned export: every doc lands in its pack_bins partition;
    re-run skips every complete bin (rows = -1, files untouched); deleting
    one bin's file makes the next run rewrite ONLY that bin."""
    import os

    import duckdb
    import pandas as pd

    from metis_ray.pipelines.scan import export_packed, pack_bins

    out = str(tmp_path / "shards")
    man1 = export_packed(SF, out, budget=1000)
    assert (man1["rows"] > 0).all()

    # read-back: Hive layout reconstructs bin_id; contents match pack_bins
    back = duckdb.execute(
        "SELECT doc_id, n_tokens, bin_id FROM read_parquet(?, "
        "hive_partitioning=true) ORDER BY doc_id",
        [f"{out}/*/*.parquet"]).df()
    want = (pack_bins(SF, budget=1000).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert back["doc_id"].tolist() == want["doc_id"].tolist()
    assert back["bin_id"].astype(int).tolist() == want["bin_id"].tolist()
    assert back["n_tokens"].tolist() == want["n_tokens"].tolist()

    # idempotent resume: everything skipped, nothing rewritten
    mtimes = {d: os.path.getmtime(os.path.join(out, d, "part-0.parquet"))
              for d in os.listdir(out)}
    man2 = export_packed(SF, out, budget=1000)
    assert (man2["rows"] == -1).all()
    assert len(man2) == len(man1)
    for d, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, d, "part-0.parquet")) == m

    # partial-failure resume: drop one bin, only it is rewritten
    victim = sorted(os.listdir(out))[0]
    os.remove(os.path.join(out, victim, "part-0.parquet"))
    man3 = export_packed(SF, out, budget=1000)
    rewritten = man3[man3["rows"] > 0]
    assert len(rewritten) == 1
    assert f"bin_id={int(rewritten['bin_id'].iloc[0])}" == victim


def test_unigram_logprob_matches_bruteforce():
    """unigram_logprob vs a sequential Counter transcription: exact ints
    for n_tokens, 1e-9 for the mean (the engine sums k·ln(c) in shuffle
    order; the transcription in doc order — ULP-level only)."""
    import pandas as pd
    from collections import Counter

    got = (textstats.unigram_logprob(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    corpus: Counter = Counter()
    per_doc = {}
    for r in docs.itertuples():
        cnt = Counter(r.text.lower().split())
        per_doc[r.doc_id] = cnt
        corpus.update(cnt)
    total = sum(corpus.values())
    rows = []
    for did, cnt in sorted(per_doc.items()):
        n = sum(cnt.values())
        if n == 0:
            continue
        s = sum(k * np.log(corpus[t]) for t, k in cnt.items())
        rows.append((did, n, round(s / n - np.log(total), 6)))
    want = pd.DataFrame(rows, columns=["doc_id", "n_tokens",
                                       "mean_logprob"])

    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    np.testing.assert_allclose(got["mean_logprob"], want["mean_logprob"],
                               atol=2e-6)


def test_unigram_logprob_empty_and_degenerate_docs():
    """Zero-token docs produce no row; a single-doc corpus scores
    mean_logprob = Σ k·ln(k)/n − ln(n) exactly."""
    import os
    import tempfile
    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a a b", "   ", ""], pa.string())})
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = (textstats.unigram_logprob(d).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert got["doc_id"].tolist() == [1]
        assert got["n_tokens"].tolist() == [3]
        # corpus: a->2, b->1, C=3; mean = (2 ln2 + 1 ln1)/3 - ln3
        want = (2 * np.log(2)) / 3 - np.log(3)
        assert abs(got["mean_logprob"][0] - round(want, 6)) < 1e-12


def test_pca_project_matches_numpy():
    """pca_project vs a full-matrix numpy PCA with the same deterministic
    sign rule — projections equal to 1e-6 (the engine folds d×d partials
    block-wise; the transcription computes the covariance in one shot)."""
    import pandas as pd
    from metis_ray.pipelines import similarity

    k = 6
    got = (similarity.pca_project(SF, n_components=k).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))

    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    m = np.vstack([np.asarray(v, np.float64) for v in emb["embedding"]])
    mean = m.mean(axis=0)
    cov = (m.T @ m) / len(m) - np.outer(mean, mean)
    _, evecs = np.linalg.eigh(cov)
    comps = evecs[:, ::-1][:, :k].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    want = (m - mean) @ comps.T

    order = np.argsort(emb["vec_id"].to_numpy())
    assert got["vec_id"].tolist() == emb["vec_id"].to_numpy()[order].tolist()
    for i in range(k):
        np.testing.assert_allclose(got[f"pc{i}"], want[order, i], atol=2e-6)
    # variance ordering: pc0 must carry the most variance
    vs = [got[f"pc{i}"].var() for i in range(k)]
    assert vs == sorted(vs, reverse=True)


def test_pca_project_empty_table():
    import os
    import tempfile
    import pyarrow as pa
    import pyarrow.parquet as pq
    from metis_ray.pipelines import similarity

    with tempfile.TemporaryDirectory() as d:
        t = pa.table({"vec_id": pa.array([], pa.int64()),
                      "embedding": pa.array([], pa.list_(pa.float32())),
                      "label": pa.array([], pa.int32())})
        pq.write_table(t, os.path.join(d, "embeddings.parquet"))
        ds = similarity.pca_project(d, n_components=4)
        assert ds.count() == 0
        assert ds.schema().names == ["vec_id", "pc0", "pc1", "pc2", "pc3"]


def test_knn_graph_matches_bruteforce():
    """Exact k-NN graph: every vector's top-k OTHER vectors, sequential
    numpy transcription as the oracle (self excluded, (sim desc, id)
    ties)."""
    got = similarity.knn_graph(SF, k=5)
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().sort_values(
        "vec_id")
    mat = np.vstack([np.asarray(v, np.float64) for v in t["embedding"]])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = t["vec_id"].to_numpy()
    sims = mat @ mat.T
    for qi, qid in enumerate(ids):
        order = sorted((j for j in range(len(ids)) if j != qi),
                       key=lambda j: (-sims[qi, j], ids[j]))
        want = [int(ids[j]) for j in order[:5]]
        g = got[got["vec_id"] == qid].sort_values("rnk")
        assert g["neighbor_id"].tolist() == want, qid
        assert g["rnk"].tolist() == list(range(1, len(want) + 1))
    assert set(got["vec_id"]) == set(int(i) for i in ids)


def test_events_transitions_matches_sequential():
    """Markov transition counts vs a sequential per-user scan."""
    from collections import Counter

    from metis_ray.pipelines.relational import events_transitions
    got = events_transitions(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas().sort_values(
        ["user_id", "ts"])
    want: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        ts = g["event_type"].tolist()
        want.update(zip(ts[:-1], ts[1:]))
    gmap = {(r.prev_type, r.event_type): int(r.n)
            for r in got.itertuples()}
    assert gmap == dict(want)


def test_weighted_sample_matches_sequential_and_is_size_biased():
    """Efraimidis-Spirakis weighted sample: exact equality vs the
    sequential transcription, plus the size-bias signal (selected docs
    are longer on average than the corpus, across seeds)."""
    import hashlib

    from metis_ray.pipelines.textstats import weighted_sample
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    denom = float(16 ** 15)

    def seq(k, seed):
        u = np.array([int(hashlib.md5(f"{seed}:{i}".encode())
                          .hexdigest()[:15], 16) + 1
                      for i in docs["doc_id"]], np.float64) / denom
        w = np.maximum(docs["n_chars"].to_numpy().astype(np.float64), 1.0)
        key = -np.log(u) / w
        return sorted(int(docs["doc_id"].iloc[j])
                      for j in np.argsort(key, kind="stable")[:k])

    for seed in (42, 7):
        got = weighted_sample(SF, k=10, seed=seed)
        assert got["doc_id"].tolist() == seq(10, seed), seed

    mean_all = docs["n_chars"].mean()
    mean_sel = np.mean([docs.set_index("doc_id").loc[seq(10, s),
                                                     "n_chars"].mean()
                        for s in range(30)])
    assert mean_sel > mean_all * 1.1, (mean_sel, mean_all)
