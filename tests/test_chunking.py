"""Token-budget chunking (pipelines/chunking.py) vs the sequential
transcription and a DuckDB list-slice twin; coverage/overlap invariants."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _mk_docs(n=80, seed=5):
    rng = np.random.RandomState(seed)
    words = ["alpha", "beta", "gamma", "delta", "x1", "yy", "zzz"]
    texts = []
    for i in range(n):
        k = int(rng.randint(0, 40))
        texts.append(" ".join(rng.choice(words, k)) if k else "")
    texts[0] = "   "                       # whitespace-only doc
    texts[1] = "  padded   with \t tabs\nand newlines  "
    return pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts, pa.string())})


def _got(t, max_tokens, overlap):
    import ray.data as rd
    from metis_ray.pipelines.chunking import chunk_documents
    ds = chunk_documents(rd.from_arrow(t), max_tokens=max_tokens,
                         overlap=overlap)
    df = ds.to_pandas()
    return sorted(zip(df.doc_id.astype(int), df.chunk_id.astype(int),
                      df.n_chunks.astype(int), df.chunk_text,
                      df.n_tokens.astype(int)))


def test_chunking_matches_reference_and_duckdb():
    from metis_ray.pipelines.chunking import chunking_reference
    t = _mk_docs()
    rows = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    for max_tokens, overlap in [(8, 0), (8, 3), (5, 4), (100, 10)]:
        got = _got(t, max_tokens, overlap)
        assert got == chunking_reference(rows, max_tokens=max_tokens,
                                         overlap=overlap)
        stride = max_tokens - overlap
        con = duckdb.connect()
        con.register("d", t)
        want = sorted(map(tuple, con.execute(f"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                          ELSE regexp_split_to_array(trim(text), '\\s+')
                     END AS toks
              FROM d
            ), c AS (
              SELECT doc_id, toks, len(toks) AS n,
                     CASE WHEN len(toks) = 0 THEN 0
                          WHEN len(toks) <= {max_tokens} THEN 1
                          ELSE CAST(ceil((len(toks) - {overlap}) * 1.0
                                         / {stride}) AS BIGINT)
                     END AS n_chunks
              FROM t
            ), e AS (
              SELECT doc_id, toks, n, n_chunks,
                     unnest(range(0, n_chunks)) AS chunk_id
              FROM c
            )
            SELECT doc_id, chunk_id, n_chunks,
                   array_to_string(
                       toks[chunk_id*{stride}+1
                            : least(chunk_id*{stride}+{max_tokens}, n)],
                       ' ') AS chunk_text,
                   least(chunk_id*{stride}+{max_tokens}, n)
                       - chunk_id*{stride} AS n_tokens
            FROM e""").fetchall()))
        con.close()
        assert got == want, (max_tokens, overlap)


def test_chunking_coverage_and_overlap_invariants():
    """Every token index of every non-empty doc is covered; consecutive
    chunks overlap by exactly `overlap` except possibly more at the
    final (clamped) chunk; no chunk exceeds max_tokens."""
    t = _mk_docs(n=60, seed=11)
    max_tokens, overlap = 7, 2
    got = _got(t, max_tokens, overlap)
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    bydoc = {}
    for did, ci, nc, txt, nt in got:
        assert 1 <= nt <= max_tokens
        assert len(txt.split()) == nt
        bydoc.setdefault(did, []).append((ci, txt, nt, nc))
    stride = max_tokens - overlap
    for did, chunks in bydoc.items():
        chunks.sort()
        toks = texts[did].split()
        assert all(nc == len(chunks) for (_, _, _, nc) in chunks)
        covered = set()
        for ci, txt, nt, _ in chunks:
            s = ci * stride
            assert toks[s:s + nt] == txt.split()
            covered |= set(range(s, s + nt))
        assert covered == set(range(len(toks)))   # full coverage
    # docs with tokens but no chunks would be a coverage hole
    docs_with_tokens = {d for d, x in texts.items() if x.split()}
    assert set(bydoc) == docs_with_tokens


def test_chunking_rejects_bad_params():
    import ray.data as rd
    from metis_ray.pipelines.chunking import chunk_documents
    ds = rd.from_arrow(_mk_docs(n=3))
    with pytest.raises(ValueError):
        chunk_documents(ds, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(ds, max_tokens=5, overlap=5)
    with pytest.raises(ValueError):
        chunk_documents(ds, max_tokens=5, overlap=-1)
