"""Token-budget document chunking with overlap.

The context-window packing primitive of an LLM training/RAG pipeline:
split each document into chunks of at most ``max_tokens`` whitespace
tokens, consecutive chunks sharing ``overlap`` tokens (stride =
max_tokens - overlap), full coverage guaranteed — every token of every
document lands in at least one chunk ("no information lost", the
reference's core ethos; analogue of its record framing that splits a
stream into bounded parts, SURVEY.md §2.2 parsers).

Chunk rule (deterministic, order-free): with n = token count,
    n_chunks = 0            if n == 0      (empty docs emit nothing)
               1            if n <= max_tokens
               ceil((n - overlap) / stride) otherwise
and chunk i covers tokens [i*stride, min(i*stride + max_tokens, n)).
Tokens are the corpus-wide convention: Arrow
``utf8_split_whitespace(trim(text))`` — identical to ``token_counts``
and its DuckDB twin ``regexp_split_to_array(trim(text), '\\s+')``, so
chunk text is SQL-transcribable (list slice + array_to_string).

Scale shape: a pure per-batch flat-map — no shuffle, no state, no
driver data; chunk ids are derived from (doc, position), so the output
is deterministic at any parallelism. Tokenization is one vectorized
Arrow kernel per batch; only the chunk assembly walks docs in Python
(joining large variable-length slices has no Arrow kernel for
overlapping windows — same deliberate loop as the ingest extractor,
large rows amortize it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def chunk_table(batch: pa.Table, *, max_tokens: int, overlap: int,
                id_col: str = "doc_id",
                text_col: str = "text") -> pa.Table:
    """Chunk one Arrow batch (the map_batches kernel, importable for
    tests). Output: (doc_id, chunk_id, n_chunks, chunk_text, n_tokens)."""
    stride = max_tokens - overlap
    trimmed = pc.utf8_trim_whitespace(batch[text_col])
    toks = pc.utf8_split_whitespace(trimmed)
    ids = batch[id_col].to_pylist()
    out_id, out_ci, out_nc, out_txt, out_nt = [], [], [], [], []
    for did, tl, tr in zip(ids, toks.to_pylist(), trimmed.to_pylist()):
        if tr == "":                       # Arrow splits '' into ['']
            continue
        n = len(tl)
        if n <= max_tokens:
            nc = 1
        else:
            nc = -((n - overlap) // -stride)        # ceil div
        for i in range(nc):
            s = i * stride
            e = min(s + max_tokens, n)
            out_id.append(did)
            out_ci.append(i)
            out_nc.append(nc)
            out_txt.append(" ".join(tl[s:e]))
            out_nt.append(e - s)
    return pa.table({
        "doc_id": pa.array(out_id, batch[id_col].type),
        "chunk_id": pa.array(out_ci, pa.int64()),
        "n_chunks": pa.array(out_nc, pa.int64()),
        "chunk_text": pa.array(out_txt, pa.string()),
        "n_tokens": pa.array(out_nt, pa.int64())})


def chunk_documents(docs: rd.Dataset, *, max_tokens: int,
                    overlap: int = 0, id_col: str = "doc_id",
                    text_col: str = "text") -> rd.Dataset:
    """Chunk every document in ``docs`` (see module docstring for the
    exact rule). ``0 <= overlap < max_tokens`` required — overlap >=
    max_tokens would never advance. Returns a streaming Dataset
    (doc_id, chunk_id, n_chunks, chunk_text, n_tokens)."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not (0 <= overlap < max_tokens):
        raise ValueError("require 0 <= overlap < max_tokens")
    return docs.select_columns([id_col, text_col]).map_batches(
        lambda t: chunk_table(t, max_tokens=max_tokens, overlap=overlap,
                              id_col=id_col, text_col=text_col),
        batch_format="pyarrow")


def chunking_reference(rows: list[tuple], *, max_tokens: int,
                       overlap: int) -> list[tuple]:
    """Sequential transcription of the exact chunk rule over (doc_id,
    text) tuples (the pytest golden). Python str.split() == Arrow
    utf8_split_whitespace for the trimmed-input / Unicode-ws contract."""
    stride = max_tokens - overlap
    out = []
    for did, text in rows:
        tl = text.split()
        n = len(tl)
        if n == 0:
            continue
        nc = 1 if n <= max_tokens else -((n - overlap) // -stride)
        for i in range(nc):
            s = i * stride
            e = min(s + max_tokens, n)
            out.append((did, i, nc, " ".join(tl[s:e]), e - s))
    return sorted(out)
