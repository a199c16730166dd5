"""Text-analysis kernels for the training-data pipelines (all deterministic).

Token counting, language-ID (character n-gram heuristic), quality scoring
(length / punctuation / stopword ratios), shingling, SimHash.  These are the
per-batch bodies used inside ``map_batches`` stages; regex compilation and
profile tables live at module import (once per worker process), mirroring the
load-once-per-actor rule.
"""

from __future__ import annotations

import re

import numpy as np

from metis_ray.functions.hashing import hash64

_WS = re.compile(r"\s+")
# BPE-ish word/piece splitter: words, numbers, or single non-space symbols
_TOKEN = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
_PUNCT = re.compile(r"[^\w\s]")

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on "
    "with as at by from".split())

# tiny trigram profiles per language (public-knowledge heuristic: frequent
# character trigrams). Deliberately small — the point is the vectorized
# scoring shape, not linguistic accuracy.
_LANG_PROFILES = {
    "en": ("the", "and", "ing", "ion", "ent", " th", "he ", "er ", "on ", "re "),
    "es": ("de ", " de", "os ", "la ", " la", "ión", "ent", "es ", "ar ", "que"),
    "fr": (" de", "de ", "es ", " le", "le ", "ent", "que", " qu", "tio", "eur"),
    "de": ("en ", "er ", "ch ", "der", "die", "ein", "sch", "und", " un", "ung"),
    "zh": ("zh_", "_zh", "shi", "de_", "ng ", "ian", "ong", "ing", "uan", "ao "),
}


def ws_token_count(text: str) -> int:
    """Whitespace token count; '' -> 0. Matches the SQL oracle expression
    ``length(regexp_split_to_array(trim(text), '\\s+'))`` for nonempty text."""
    t = text.strip()
    if not t:
        return 0
    return len(_WS.split(t))


def bpe_ish_tokens(text: str) -> list[str]:
    return _TOKEN.findall(text)


def quality_features(text: str) -> tuple[int, int, float, float, float]:
    """(n_chars, n_tokens, stopword_ratio, punct_ratio, mean_token_len)."""
    toks = text.split()
    n = len(toks)
    if n == 0:
        return (len(text), 0, 0.0, 0.0, 0.0)
    stop = sum(1 for t in toks if t.lower() in STOPWORDS)
    punct = len(_PUNCT.findall(text))
    mean_len = sum(len(t) for t in toks) / n
    return (len(text), n, stop / n, punct / max(1, len(text)), mean_len)


def quality_score(text: str) -> float:
    """[0,1] heuristic quality score: penalize empty/short docs, extreme
    punctuation density and vanishing stopword ratios (classic web-corpus
    quality filters, Gopher/C4-style rules from the public literature)."""
    n_chars, n_tok, stop_r, punct_r, mean_len = quality_features(text)
    if n_tok == 0:
        return 0.0
    s = 1.0
    if n_tok < 10:
        s *= n_tok / 10.0
    if not (2.0 <= mean_len <= 12.0):
        s *= 0.5
    if punct_r > 0.2:
        s *= 0.5
    if stop_r < 0.01:
        s *= 0.8
    return round(s, 6)


def lang_id(text: str) -> str:
    """Character-trigram profile vote; deterministic tie-break by language
    name. Returns one of the profile keys, or 'und' for empty text."""
    t = text.lower()[:4000]
    if not t.strip():
        return "und"
    best_lang, best_hits = "und", -1
    for lang in sorted(_LANG_PROFILES):
        hits = sum(t.count(g) for g in _LANG_PROFILES[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "und"


def word_shingles(text: str, k: int = 3) -> list[str]:
    """k-word shingles over whitespace tokens (lowercased)."""
    toks = text.lower().split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def simhash64(tokens: list[str]) -> int:
    """Classic 64-bit SimHash over token hashes (Charikar 2002): sum signed
    bit votes, take sign. Returns a nonnegative 63-bit int (bit 63 unused,
    keeping the int64-everywhere invariant)."""
    if not tokens:
        return 0
    h = hash64(tokens).astype(np.uint64)
    bits = ((h[:, None] >> np.arange(63, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(63):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
