"""Text-analysis pipelines over the ``documents`` table: token counting,
fingerprinting, language-ID, quality scoring — each a single vectorized-body
``map_batches`` stage (actor pool where a compiled model/profile is held)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from metis_ray.functions.hashing import ngram_fingerprint
from metis_ray.functions.text import bpe_ish_tokens, lang_id, quality_score
from metis_ray.sources.parquet import read_table


def token_counts(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens): whitespace token count (SQL-oracle-checkable).

    Pure Arrow kernels (trim -> split_whitespace -> list length, empty
    strings masked to 0 — Arrow splits '' into ['']) — no per-row Python;
    semantics identical to ``ws_token_count``."""
    import pyarrow.compute as pc

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stage(batch: pa.Table) -> pa.Table:
        t = pc.utf8_trim_whitespace(batch["text"])
        n = pc.list_value_length(pc.utf8_split_whitespace(t))
        n = pc.if_else(pc.equal(t, ""), pa.scalar(0, n.type), n)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(n, pa.int64()),
        })

    return docs.map_batches(stage, batch_format="pyarrow")


def token_pieces(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_pieces): BPE-ish regex piece count (words / numbers /
    symbols) — the tokenizer-cost estimator; no SQL twin."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stage(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_pieces": pa.array([len(bpe_ish_tokens(t)) for t in texts], pa.int64()),
        })

    return docs.map_batches(stage, batch_format="pyarrow")


def fingerprints(sf_dir: str) -> rd.Dataset:
    """(doc_id, md5): content fingerprint matching DuckDB's md5()."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stage(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "md5": pa.array([hashlib.md5(t.encode()).hexdigest() for t in texts],
                            pa.string()),
        })

    return docs.map_batches(stage, batch_format="pyarrow")


def rolling_fingerprints(sf_dir: str) -> rd.Dataset:
    """(doc_id, rolling_min): min rolling polynomial hash over char 8-grams
    (a 1-perm MinHash document fingerprint); no SQL twin."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stage(batch: pa.Table) -> pa.Table:
        from metis_ray.functions.hashing import ngram_fingerprints
        texts = batch["text"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "rolling_min": pa.array(ngram_fingerprints(texts), pa.int64()),
        })

    return docs.map_batches(stage, batch_format="pyarrow")


class LangQuality:
    """Actor-pool stage (profiles/regexes loaded once per actor):
    (doc_id, lang_pred, quality, n_chars)."""

    def __init__(self) -> None:
        # touch module-level compiled state so import cost is paid here
        lang_id("warm up the profiles")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array([lang_id(t) for t in texts], pa.string()),
            "quality": pa.array([quality_score(t) for t in texts], pa.float64()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })


def lang_quality(sf_dir: str, concurrency: int = 2) -> rd.Dataset:
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(LangQuality, batch_format="pyarrow",
                            concurrency=concurrency)


def quality_filter(sf_dir: str, *, min_quality: float = 0.5,
                   lang: str | None = "en", concurrency: int = 2) -> rd.Dataset:
    """Training-data curation filter (the C4/Gopher-style keep-set): docs
    whose heuristic quality clears ``min_quality`` and (optionally) whose
    predicted language matches. Composes the lang/quality stage with an
    Arrow filter — one streaming pass, rows never widen.
    (doc_id, lang_pred, quality)."""
    import pyarrow.compute as pc

    scored = lang_quality(sf_dir, concurrency)

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch["quality"], pa.scalar(min_quality))
        if lang is not None:
            m = pc.and_(m, pc.equal(batch["lang_pred"], pa.scalar(lang)))
        return batch.filter(m).select(["doc_id", "lang_pred", "quality"])

    return scored.map_batches(keep, batch_format="pyarrow")


def lang_distribution(sf_dir: str, concurrency: int = 2) -> rd.Dataset:
    """(lang_pred, n_docs): grouped rollup of predicted language."""
    from ray.data.aggregate import Count
    return (lang_quality(sf_dir, concurrency)
            .groupby("lang_pred").aggregate(Count(alias_name="n_docs")))


def weighted_sample(sf_dir: str, *, k: int = 50,
                    seed: int = 42) -> pd.DataFrame:
    """Deterministic WEIGHTED sampling without replacement — inclusion
    probability proportional to weight = max(n_chars, 1) — via the
    Efraimidis-Spirakis exponential race with md5-derived uniforms:
    u = (first 15 md5(f"{seed}:{doc_id}") hex digits + 1) / 16^15 in
    (0, 1], race key = -ln(u)/weight, the sample = the k SMALLEST keys
    (ties impossible: md5 is injective over the distinct doc ids here).
    Membership is a pure function of (seed, doc_id, weight) — stable
    across runs, parallelism and block layout — and the identical
    expression runs in SQL (md5 + ('0x'||hex)::UBIGINT + ln), which is
    the DuckDB twin; only ids/metadata are emitted so the compare never
    touches the float keys. The size-biased complement of ``sample_docs``
    (uniform md5-threshold sampling).

    Scale shape: per-batch local k-smallest (a combiner), the driver
    merges k x blocks tiny partials — the full table never leaves the
    workers. Output (doc_id, lang, source, n_chars) sorted by doc_id."""
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "source", "n_chars"])
    denom = float(16 ** 15)             # 2^60: division is exact

    def local_k(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        u = (np.array([int(hashlib.md5(f"{seed}:{i}".encode())
                           .hexdigest()[:15], 16) + 1 for i in ids],
                      np.float64) / denom)
        w = np.maximum(batch["n_chars"].to_numpy(zero_copy_only=False)
                       .astype(np.float64), 1.0)
        key = -np.log(u) / w
        keep = np.sort(np.argsort(key, kind="stable")[:k])
        t = batch.take(pa.array(keep))
        return t.append_column("_key", pa.array(key[keep], pa.float64()))

    part = docs.map_batches(local_k, batch_format="pyarrow").to_pandas()
    part = part.sort_values("_key").head(k)
    return (part.drop(columns="_key").sort_values("doc_id")
            .reset_index(drop=True))


def sample_docs(sf_dir: str, *, prefix_lt: str = "29") -> rd.Dataset:
    """Deterministic uniform document sample: keep docs whose
    ``md5(str(doc_id))`` hex digest starts below ``prefix_lt``
    (two hex chars => rate = int(prefix_lt,16)/256, default ~16%).

    The reproducible-sampling primitive a training-data pipeline needs:
    membership is a pure function of ``doc_id`` — stable across runs, scales
    without coordination, and the same predicate runs verbatim in SQL
    (``substr(md5(...),1,2) < ...``). Output: full metadata rows of the
    sampled docs."""
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "source", "n_chars"])

    def stage(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (hashlib.md5(str(i).encode()).hexdigest()[:2] < prefix_lt
             for i in ids), dtype=bool, count=len(ids))
        return batch.filter(pa.array(keep))

    return docs.map_batches(stage, batch_format="pyarrow")


_STOPWORDS = ("the", "a")


def clean_docs(sf_dir: str) -> rd.Dataset:
    """Boilerplate/stopword normalization (the text-cleaning stage of a
    curation pipeline): drop stopwords (word-boundary regex), collapse
    whitespace, trim. (doc_id, clean_text, n_tokens_clean) — the regexes
    are RE2-compatible so the DuckDB twin runs them verbatim."""
    import re
    # re.ASCII pins \b/\s to RE2's ASCII semantics so the DuckDB twin runs
    # the same regex verbatim (unicode \b would diverge on e.g. 'theé')
    sw = re.compile(r"\b(" + "|".join(_STOPWORDS) + r")\b", re.ASCII)
    ws = re.compile(r"\s+", re.ASCII)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stage(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        clean = [ws.sub(" ", sw.sub("", t)).strip() for t in texts]
        return pa.table({
            "doc_id": batch["doc_id"],
            "clean_text": pa.array(clean, pa.string()),
            "n_tokens_clean": pa.array(
                [len(c.split()) if c else 0 for c in clean], pa.int64()),
        })

    return docs.map_batches(stage, batch_format="pyarrow")


def stratified_sample(sf_dir: str, *, rates: dict[str, str] | None = None,
                      even_lt: str = "40", odd_lt: str = "10",
                      default_lt: str | None = None) -> rd.Dataset:
    """Source-stratified deterministic sample — the mixture-weighting
    primitive (up/down-weight corpora per source when composing a training
    mix). Same md5-threshold membership as ``sample_docs`` but the rate is
    chosen per ``source``: pass ``rates`` (source -> 2-hex-char threshold;
    unknown sources use ``default_lt``, or raise if it is None) or fall back
    to the demo policy over the synthetic ``srcN`` names (even-indexed at
    ``int(even_lt,16)/256``, odd at ``int(odd_lt,16)/256`` — what the SQL
    twin mirrors). Output: sampled rows + the rate bucket that admitted
    them."""
    import re
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "n_chars"])
    srcnum = re.compile(r"^src(\d+)$")

    def rate_for(s: str) -> str:
        if rates is not None:
            r = rates.get(s, default_lt)
            if r is None:
                raise ValueError(f"no sampling rate for source {s!r} "
                                 "(pass default_lt for a catch-all)")
            return r
        m = srcnum.match(s)
        if m is None:
            raise ValueError(
                f"source {s!r} does not match the demo 'srcN' policy — "
                "pass an explicit rates= table")
        return even_lt if int(m.group(1)) % 2 == 0 else odd_lt

    def stage(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        srcs = batch["source"].to_pylist()
        lim = [rate_for(s) for s in srcs]
        keep = np.fromiter(
            (hashlib.md5(str(i).encode()).hexdigest()[:2] < l
             for i, l in zip(ids, lim)), dtype=bool, count=len(ids))
        t = batch.append_column("rate_lt", pa.array(lim, pa.string()))
        return t.filter(pa.array(keep))

    return docs.map_batches(stage, batch_format="pyarrow")


def fingerprint_table(sf_dir: str) -> rd.Dataset:
    """(doc_id, md5, rolling_min): both document fingerprints in ONE pass
    over the text column (content md5 + min rolling polynomial hash over
    char 8-grams). Merges ``fingerprints`` and ``rolling_fingerprints`` so
    the text is read and decoded once."""
    import hashlib

    from metis_ray.functions.hashing import ngram_fingerprints

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stage(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "md5": pa.array([hashlib.md5(t.encode()).hexdigest()
                             for t in texts], pa.string()),
            "rolling_min": pa.array(ngram_fingerprints(texts), pa.int64()),
        })

    return docs.map_batches(stage, batch_format="pyarrow")


def repetition_stats(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_words, distinct_word_ratio, top_bigram_frac): Gopher-style
    repetition quality signals — the fraction of distinct words and the
    frequency share of the most common word 2-gram. High top_bigram_frac /
    low distinct_word_ratio flag machine-generated or boilerplate text for
    curation filters. Per-doc bounded Python (Counter over one doc's
    bigrams) inside a vectorized batch stage, same shape as ``lang_quality``;
    certified against a DuckDB transcription in
    tests/test_similarity_textstats.py."""
    from collections import Counter

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stage(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_words, dratio, topfrac = [], [], []
        for t in texts:
            w = [x for x in t.lower().split() if x]
            n = len(w)
            n_words.append(n)
            dratio.append(round(len(set(w)) / max(n, 1), 6))
            if n < 2:
                topfrac.append(round(0 / 1, 6))
            else:
                c = Counter(zip(w, w[1:]))
                tot = n - 1
                topfrac.append(round(max(c.values()) / max(tot, 1), 6))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "distinct_word_ratio": pa.array(dratio, pa.float64()),
            "top_bigram_frac": pa.array(topfrac, pa.float64()),
        })

    return docs.map_batches(stage, batch_format="pyarrow")


def heavy_terms(sf_dir: str, *, k: int = 4096, top: int = 20) -> pd.DataFrame:
    """Approximate top terms across the corpus via a mergeable Misra-Gries
    heavy-hitters summary: per-batch exact term counts compressed to <= k
    survivors, merged pairwise (any term with true frequency > total/k is
    GUARANTEED to survive; reported counts undercount by <= total/k).
    Completes the mergeable-sketch trio (HLL distincts, quantile summary,
    heavy hitters) — shuffle bytes bounded by k, independent of corpus
    size; the final fold is one root merge whose inputs are <= k rows per
    block (tree-mergeable beyond that). Output (term, approx_count),
    ``top`` rows, count-desc then term-asc. Guarantees tested in
    tests/test_similarity_textstats.py."""
    from metis_ray.functions.sketch import mg_compress, mg_merge

    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for t in batch["text"].to_pylist():
            words.extend(t.lower().split())
        if not words:
            return pa.table({"terms": pa.array([], pa.list_(pa.string())),
                             "counts": pa.array([], pa.list_(pa.int64()))})
        u, c = np.unique(np.asarray(words, dtype=object), return_counts=True)
        u, c = mg_compress(u, c.astype(np.int64), k)
        return pa.table({
            "terms": pa.array([list(map(str, u))], pa.list_(pa.string())),
            "counts": pa.array([c.tolist()], pa.list_(pa.int64()))})

    def merge_level(batch: pa.Table) -> pa.Table:
        # distributed tree-merge level: fold every summary row in the
        # batch into one, so the driver sees ceil(#blocks / batch_size)
        # rows instead of one per input block (MG merge is associative —
        # any fold shape gives the same guarantees)
        sk = (np.empty(0, dtype=object), np.empty(0, dtype=np.int64))
        for t, c in zip(batch["terms"].to_pylist(),
                        batch["counts"].to_pylist()):
            sk = mg_merge(sk, (np.asarray(t, dtype=object),
                               np.asarray(c, dtype=np.int64)), k)
        return pa.table({
            "terms": pa.array([list(map(str, sk[0]))],
                              pa.list_(pa.string())),
            "counts": pa.array([sk[1].tolist()], pa.list_(pa.int64()))})

    rows = (docs.map_batches(partial, batch_format="pyarrow")
            .map_batches(merge_level, batch_format="pyarrow",
                         batch_size=1024)
            .take_all())
    sk = (np.empty(0, dtype=object), np.empty(0, dtype=np.int64))
    for r in rows:
        sk = mg_merge(sk, (np.asarray(r["terms"], dtype=object),
                           np.asarray(r["counts"], dtype=np.int64)), k)
    items, counts = sk
    df = pd.DataFrame({"term": [str(t) for t in items],
                       "approx_count": counts.astype(np.int64)})
    return (df.sort_values(["approx_count", "term"],
                           ascending=[False, True])
            .head(top).reset_index(drop=True))


# deterministic probe set for the registered docs_term_counts_cms query:
# common tokens of the synthetic documents vocabulary, present at every sf
CMS_PROBE_TERMS = ("batch", "hash", "join", "merge", "order", "scan",
                   "sort", "stream", "table", "the", "window")


def term_counts_cms(sf_dir: str, *, probes=CMS_PROBE_TERMS,
                    width: int = 8192) -> pd.DataFrame:
    """Point-query term frequencies via a Count-Min sketch — the
    LINEAR member of the mergeable-sketch family (HLL distincts,
    quantile summary, Misra-Gries heavy hitters, CMS point queries).
    Per-batch exact token counts fold into a (CM_DEPTH, width) int64
    counter matrix; because CMS merge is element-wise addition, the
    tree-merge is exact in any fold shape and the shuffle moves a
    fixed CM_DEPTH*width*8 bytes per block regardless of vocabulary
    size. Output (term, approx_count) for the probe terms, term-asc.
    Guarantees (never undercounts; overcount <= (e/width)*total w.p.
    1-e^-CM_DEPTH; linearity exact) tested in tests/test_cms.py."""
    from metis_ray.functions.sketch import CM_DEPTH, cms_add, cms_new, \
        cms_query

    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        sk = cms_new(width)
        words: list[str] = []
        for t in batch["text"].to_pylist():
            words.extend(t.lower().split())
        if words:
            u, c = np.unique(np.asarray(words, dtype=object),
                             return_counts=True)
            cms_add(sk, u, c.astype(np.int64))
        return pa.table({"sk": pa.array([sk.ravel().tolist()],
                                        pa.list_(pa.int64()))})

    def merge_level(batch: pa.Table) -> pa.Table:
        acc = np.zeros(CM_DEPTH * width, dtype=np.int64)
        for row in batch["sk"].to_pylist():
            acc += np.asarray(row, dtype=np.int64)
        return pa.table({"sk": pa.array([acc.tolist()],
                                        pa.list_(pa.int64()))})

    rows = (docs.map_batches(partial, batch_format="pyarrow")
            .map_batches(merge_level, batch_format="pyarrow",
                         batch_size=64)
            .take_all())
    sk = np.zeros((CM_DEPTH, width), dtype=np.int64)
    for r in rows:
        sk += np.asarray(r["sk"], dtype=np.int64).reshape(CM_DEPTH, width)
    terms = sorted(str(p) for p in probes)
    est = cms_query(sk, np.asarray(terms, dtype=object))
    return pd.DataFrame({"term": terms,
                         "approx_count": est.astype(np.int64)})


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Applied IN ORDER (emails first: they contain digits and dots that the
# later patterns would otherwise half-match). RE2 syntax only — the same
# engine backs Arrow's *_substring_regex kernels and DuckDB's regexp_*,
# which is what makes the DuckDB twin an exact-equality oracle.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{6,}\d", "<PHONE>"),
]


def pii_scrub(sf_dir: str) -> rd.Dataset:
    """(doc_id, text_clean, n_email, n_ipv4, n_phone): redact emails /
    IPv4 addresses / phone-like digit runs into placeholder tokens and
    count each — the curation step every public LLM-data pipeline runs
    before training (reference analogue: the per-record field-masking
    maps of SURVEY §2.2).

    Entirely Arrow RE2 kernels (``count_substring_regex`` +
    ``replace_substring_regex``) — zero per-row Python, and semantics
    identical to DuckDB's RE2 ``regexp_extract_all``/``regexp_replace``,
    so the pytest twin certifies exact equality (counts taken on the
    intermediate text at each step, same composition order)."""
    import pyarrow.compute as pc

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stage(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        out: dict = {"doc_id": batch["doc_id"]}
        for name, pat, placeholder in PII_PATTERNS:
            out[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(t, pat), pa.int64())
            t = pc.replace_substring_regex(t, pat, placeholder)
        out["text_clean"] = t
        return pa.table(out)

    return docs.map_batches(stage, batch_format="pyarrow")


def shuffle_docs(sf_dir: str, *, seed: int = 42) -> rd.Dataset:
    """Deterministic global training-order shuffle: each doc gets the
    pseudorandom key ``md5(f"{seed}:{doc_id}")`` and the table is
    distributed-sorted by it — the reproducible alternative to
    ``random_shuffle()`` for fixing a training data order. Membership of
    position is a pure function of (seed, doc_id): stable across runs,
    cluster sizes and block layouts, and the same expression runs verbatim
    in SQL (``md5(concat(...)) ... ORDER BY``). Reshuffling = new seed.
    Output: metadata rows + ``shuffle_key``, globally ordered by it."""
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "source", "n_chars"])

    def key(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        k = [hashlib.md5(f"{seed}:{i}".encode()).hexdigest() for i in ids]
        return batch.append_column("shuffle_key", pa.array(k, pa.string()))

    return docs.map_batches(key, batch_format="pyarrow").sort("shuffle_key")


def _doc_term_counts(batch: pa.Table) -> pa.Table:
    """(doc_id, term, tf) rows: within-document term counts, exact — one
    document is one input row, so the per-doc numpy unique never splits a
    document across batches. Shared by TF-IDF and the unigram-LM scorer."""
    ids: list[int] = []
    terms: list[str] = []
    tfs: list[int] = []
    for i, t in zip(batch["doc_id"].to_pylist(),
                    batch["text"].to_pylist()):
        w = t.lower().split()
        if not w:
            continue
        u, c = np.unique(np.asarray(w, dtype=object), return_counts=True)
        ids.extend([i] * len(u))
        terms.extend(str(x) for x in u)
        tfs.extend(int(x) for x in c)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "term": pa.array(terms, pa.string()),
                     "tf": pa.array(tfs, pa.int64())})


def unigram_logprob(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, mean_logprob): per-document mean token
    log-probability under the corpus's OWN unigram distribution — the
    perplexity-style curation filter (docs far below the corpus mean are
    boilerplate/noise candidates; far above are over-represented
    duplicates). mean_logprob = (Σ_t tf_t·ln c_t)/n − ln C for p(term) =
    c_term/C over corpus term counts c and total token count C.

    Distributed shape: one pass emits exact (doc_id, term, tf) partials
    (per-doc numpy unique — no global vocabulary anywhere); corpus counts
    are a ``groupby(term)`` over pre-counted ints (Zipf makes partials
    tiny); the scalar C folds via ``Dataset.sum``; scores attach by a
    hash-partitioned join on term (the vocabulary can outgrow a
    broadcast) and reduce by ``groupby(doc_id)`` — every stage a
    shuffle-or-map. Documents with zero tokens produce no row (the SQL
    twin's inner join drops them identically). Rounded to 6 dp."""
    import math

    from ray.data.aggregate import Sum

    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "mean_logprob": pa.array([], pa.float64())})
    dt, _ = _nonempty_blocks(docs.map_batches(_doc_term_counts,
                                              batch_format="pyarrow"))
    if dt is None:
        return rd.from_arrow(empty)

    cnt, _ = _nonempty_blocks(
        dt.groupby("term").aggregate(Sum("tf", alias_name="c")))
    # total token count from the Zipf-bounded vocabulary table, not a
    # second scan of the (much larger) doc-term table
    total = int(cnt.sum("c"))
    ln_total = math.log(total)

    j = dt.join(cnt, join_type="inner", num_partitions=_join_parts(),
                on=("term",))

    def weigh(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"doc_id": batch["doc_id"],
                         "n": batch["tf"],
                         "w": pa.array(tf * np.log(c), pa.float64())})

    agg, _ = _nonempty_blocks(
        j.map_batches(weigh, batch_format="pyarrow")
         .groupby("doc_id").aggregate(Sum("n", alias_name="n_tokens"),
                                      Sum("w", alias_name="s")))
    if agg is None:
        return rd.from_arrow(empty)

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        s = batch["s"].to_numpy(zero_copy_only=False)
        lp = np.round(s / n.astype(np.float64) - ln_total, 6)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tokens": batch["n_tokens"],
                         "mean_logprob": pa.array(lp, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def tfidf_top_terms(sf_dir: str, *, top: int = 3) -> rd.Dataset:
    """(doc_id, term, tfidf, rnk): the ``top`` highest-TF-IDF terms per
    document (tf = in-doc count, idf = ln(N/df), ties broken term-asc) —
    the classic content-keyword extractor.

    Distributed shape: one ``map_batches`` pass emits (doc_id, term, tf)
    partials (per-doc numpy unique, no global vocabulary anywhere);
    document frequency is a ``groupby(term)`` count; scores attach by a
    hash-partitioned join on term (the df table can outgrow a broadcast);
    the per-doc top-k is a ``groupby(doc_id).map_groups`` — every stage a
    shuffle-or-map, nothing driver-side but the scalar N. Oracle: an exact
    numpy transcription of the same recurrence in pytest."""
    from ray.data.aggregate import Count

    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "term": pa.array([], pa.string()),
                      "tfidf": pa.array([], pa.float64()),
                      "rnk": pa.array([], pa.int64())})
    tft, _ = _nonempty_blocks(docs.map_batches(_doc_term_counts,
                                               batch_format="pyarrow"))
    if tft is None:
        return rd.from_arrow(empty)
    dft, _ = _nonempty_blocks(
        tft.groupby("term").aggregate(Count(alias_name="df")))
    j = tft.join(dft, join_type="inner", num_partitions=_join_parts(),
                 on=("term",))

    def score(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = tf * np.log(float(n_docs) / dfv)
        return pa.table({"doc_id": batch["doc_id"],
                         "term": batch["term"],
                         "tfidf": pa.array(s, pa.float64())})

    def topk(group: pa.Table) -> pa.Table:
        s = group["tfidf"].to_numpy(zero_copy_only=False)
        terms = np.asarray(group["term"].to_pylist(), dtype=object)
        order = np.lexsort((terms, -s))[:top]
        return pa.table({
            "doc_id": group["doc_id"].take(pa.array(order)),
            "term": group["term"].take(pa.array(order)),
            "tfidf": pa.array(np.round(s[order], 9), pa.float64()),
            "rnk": pa.array(np.arange(1, len(order) + 1), pa.int64())})

    scored, _ = _nonempty_blocks(j.map_batches(score,
                                               batch_format="pyarrow"))
    if scored is None:
        return rd.from_arrow(empty)
    return scored.groupby("doc_id").map_groups(topk, batch_format="pyarrow")


def top_terms_exact(sf_dir: str, *, top: int = 30) -> pd.DataFrame:
    """EXACT corpus-wide top-``top`` terms by count — the exact twin of the
    Misra-Gries ``heavy_terms`` summary (same tokenization: lowercase,
    whitespace split, empty terms dropped), so the approximate sketch can
    be audited against ground truth at any scale you can afford the
    shuffle.

    Fully vectorized: Arrow ``utf8_lower`` → ``utf8_split_whitespace`` →
    flatten per batch, per-batch partial counts (Arrow ``group_by``), ONE
    term-partitioned groupby-sum shuffle (bytes ∝ distinct terms, not
    corpus size), then distributed sort + limit. Ties: count desc, term
    asc — identical on both sides."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    docs = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if batch.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        toks = pc.list_flatten(
            pc.utf8_split_whitespace(pc.utf8_lower(batch["text"])))
        toks = toks.filter(pc.not_equal(toks, ""))
        t = pa.table({"term": toks})
        g = t.group_by("term").aggregate([([], "count_all")])
        return pa.table({"term": g["term"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    counts = (docs.map_batches(partial, batch_format="pyarrow")
              .groupby("term").aggregate(Sum("n", alias_name="n")))

    def cast64(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if "n" not in batch.column_names:
            return pa.schema([("term", pa.string()),
                              ("n", pa.int64())]).empty_table()
        return batch.set_column(batch.column_names.index("n"), "n",
                                pc.cast(batch["n"], pa.int64()))

    out = (counts.map_batches(cast64, batch_format="pyarrow")
           .sort(["n", "term"], descending=[True, False])
           .limit(top).to_pandas())
    return out[["term", "n"]].reset_index(drop=True)
