"""Mergeable sketches: HyperLogLog approximate-distinct (Flajolet et al.).

The scale pattern (ray guide "Aggregation at scale"): emit one serialized
sketch per batch inside ``map_batches``, merge the tiny partials in a final
grouped stage — sketches are designed to be mergeable, so the shuffle moves
kilobytes regardless of input cardinality.
"""

from __future__ import annotations

import numpy as np

from metis_ray.functions.hashing import hash64

P_BITS = 12
M = 1 << P_BITS
_ALPHA = 0.7213 / (1 + 1.079 / M)


def hll_new() -> np.ndarray:
    return np.zeros(M, dtype=np.uint8)


def hll_add_values(reg: np.ndarray, values) -> np.ndarray:
    """Fold a batch of values (strings or ints) into the register array."""
    if len(values) == 0:
        return reg
    if isinstance(values[0], (int, np.integer)):
        h = np.asarray(values, dtype=np.int64).astype(np.uint64)
        # avalanche integer keys (splitmix-style) so low-entropy ids spread
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    else:
        h = hash64([str(v) for v in values]).astype(np.uint64)
    idx = (h >> np.uint64(64 - P_BITS)).astype(np.int64)
    rest = (h << np.uint64(P_BITS)) | np.uint64((1 << P_BITS) - 1)
    # rank = count-leading-zeros(rest) + 1, vectorized binary reduction
    lz = np.zeros(len(rest), dtype=np.uint8)
    cur = rest.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = cur < (np.uint64(1) << np.uint64(64 - s))   # top s bits all zero
        lz[m] += s
        cur[m] = cur[m] << np.uint64(s)
    rank = lz + 1
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> float:
    est = _ALPHA * M * M / np.power(2.0, -reg.astype(np.float64)).sum()
    zeros = int((reg == 0).sum())
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)      # linear counting for small ranges
    return float(est)


# ---------------------------------------------------------------------------
# mergeable quantile summary (weighted compress-merge, Greenwald-Khanna
# style error bound: <= 1/k per compression level)
# ---------------------------------------------------------------------------

def qsketch_compress(values: np.ndarray, weights: np.ndarray | None = None,
                     k: int = 256) -> tuple[np.ndarray, np.ndarray]:
    """Compress a weighted value multiset to <= k (value, weight) points at
    evenly spaced cumulative-weight ranks. Deterministic (no sampling);
    rank error of any quantile query against the compressed summary is at
    most total_weight / k. Associative under merge+recompress, so partials
    can fold in any tree shape (the mergeable-summary contract)."""
    if len(values) == 0:
        return (np.empty(0, np.float64), np.empty(0, np.float64))
    v = np.asarray(values, dtype=np.float64)
    w = (np.ones(len(v)) if weights is None
         else np.asarray(weights, dtype=np.float64))
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    if len(v) <= k:
        return v, w
    total = w.sum()
    cum = np.cumsum(w)
    targets = (np.arange(k) + 0.5) / k * total
    idx = np.searchsorted(cum, targets, side="left")
    idx = np.minimum(idx, len(v) - 1)
    return v[idx], np.full(k, total / k)


def qsketch_merge(a: tuple[np.ndarray, np.ndarray],
                  b: tuple[np.ndarray, np.ndarray],
                  k: int = 256) -> tuple[np.ndarray, np.ndarray]:
    """Merge two summaries and recompress to <= k points."""
    return qsketch_compress(np.concatenate([a[0], b[0]]),
                            np.concatenate([a[1], b[1]]), k)


def qsketch_query(sk: tuple[np.ndarray, np.ndarray], q: float) -> float:
    """Value at quantile q (0..1): the point whose cumulative weight first
    reaches q * total (midpoint rank convention matching compress)."""
    v, w = sk
    if len(v) == 0:
        return float("nan")
    cum = np.cumsum(w)
    i = int(np.searchsorted(cum, q * cum[-1], side="left"))
    return float(v[min(i, len(v) - 1)])


# ---------------------------------------------------------------------------
# mergeable heavy-hitters summary (Misra-Gries): any item with true
# frequency > total/k is guaranteed to survive; reported counts
# undercount by at most total/k
# ---------------------------------------------------------------------------

def mg_compress(items: np.ndarray, counts: np.ndarray,
                k: int = 1024) -> tuple[np.ndarray, np.ndarray]:
    """Compress exact (item, count) pairs to <= k survivors by the
    Misra-Gries reduction: subtract the (k+1)-th largest count from all,
    keep the positive ones. Deterministic; associative under merge."""
    if len(items) <= k:
        return items, counts
    order = np.argsort(counts, kind="stable")[::-1]
    thresh = counts[order[k]]
    keep = counts > thresh
    return items[keep], counts[keep] - thresh


def mg_merge(a: tuple[np.ndarray, np.ndarray],
             b: tuple[np.ndarray, np.ndarray],
             k: int = 1024) -> tuple[np.ndarray, np.ndarray]:
    """Merge two summaries (sum counts per item) and recompress to <= k."""
    items = np.concatenate([a[0], b[0]])
    counts = np.concatenate([a[1], b[1]])
    uniq, inv = np.unique(items, return_inverse=True)
    summed = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(summed, inv, counts)
    return mg_compress(uniq, summed, k)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): point-queryable
# frequency summary. LINEAR — merge is element-wise addition, so the
# sketch of a union is exactly the sum of the parts' sketches in any
# fold shape. Estimates never undercount; the overcount of any single
# query is <= (e / width) * total_count with probability 1 - e^-depth.
# ---------------------------------------------------------------------------

CM_DEPTH = 4


def _cms_rows(items, width: int) -> np.ndarray:
    """(CM_DEPTH, len(items)) column indices via Kirsch-Mitzenmacher
    double hashing over the 64-bit item hash: idx_r = (h1 + r*h2) % w
    with h2 forced odd so rows can't all collapse to one index."""
    h = hash64([str(v) for v in items]).astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    r = np.arange(CM_DEPTH, dtype=np.uint64)[:, None]
    return ((h1[None, :] + r * h2[None, :]) % np.uint64(width)
            ).astype(np.int64)


def cms_new(width: int = 8192) -> np.ndarray:
    return np.zeros((CM_DEPTH, width), dtype=np.int64)


def cms_add(sk: np.ndarray, items, counts=None) -> np.ndarray:
    """Fold (item, count) pairs into the counter matrix in place."""
    if len(items) == 0:
        return sk
    c = (np.ones(len(items), np.int64) if counts is None
         else np.asarray(counts, dtype=np.int64))
    idx = _cms_rows(items, sk.shape[1])
    for r in range(CM_DEPTH):
        np.add.at(sk[r], idx[r], c)
    return sk


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_query(sk: np.ndarray, items) -> np.ndarray:
    """Estimated count per item: the row-wise minimum of its counters."""
    if len(items) == 0:
        return np.empty(0, np.int64)
    idx = _cms_rows(items, sk.shape[1])
    return np.min(
        np.stack([sk[r, idx[r]] for r in range(CM_DEPTH)]), axis=0)
