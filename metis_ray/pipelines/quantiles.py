"""Exact distributed quantiles by global sort + rank selection.

The ground-truth twin of the mergeable quantile sketch
(``relational.value_quantiles``): where the sketch trades a bounded rank
error for cardinality-independent shuffle bytes, this computes the EXACT
percentile_cont values — and only the handful of rank-owning rows ever
reach the driver. Same role ``docs_top_terms_exact`` plays for the
Misra-Gries heavy-hitter sketch: certify the approximation and serve the
cases where exactness is the requirement.

Shape (the 100 TB contract): one range-partitioning ``Dataset.sort`` on
the value column (Ray's distributed sort — the honest cost of exactness),
then per-block row counts (ints) to the driver, then one ``num_cpus=0.25``
point-lookup task per NEEDED block — at most 2 × len(qs) blocks are
touched and each returns scalars, so the driver never sees rows. Linear
interpolation matches ANSI ``percentile_cont`` / NumPy default / DuckDB
``quantile_cont``.

Reference analogue: the reference's summary percentiles are computed by
sorting the whole column in pandas (SURVEY.md §2.5); the re-expression
keeps the sort but distributes it and ships back only the selected ranks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


@ray.remote(num_cpus=0.25)
def _block_len(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote(num_cpus=0.25)
def _pick(tbl: pa.Table, col: str, idxs: list[int]) -> list[float]:
    v = tbl[col].to_numpy(zero_copy_only=False)
    return [float(v[i]) for i in idxs]


def exact_quantiles(ds: rd.Dataset, col: str,
                    qs: list[float]) -> pa.Table:
    """percentile_cont(q) of ``col`` for each q in ``qs`` (linear
    interpolation between closest ranks, nulls/NaNs dropped first — the
    ANSI / DuckDB ``quantile_cont`` semantics). Returns (q, value) with
    value NULL when the column is empty. 0 <= q <= 1 required."""
    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not (0.0 <= float(q) <= 1.0) for q in qs):
        raise ValueError("quantiles must be in [0, 1]")

    clean = ds.select_columns([col]).map_batches(
        lambda t: t.filter(pc.and_(t[col].is_valid(),
                                   pc.invert(pc.is_nan(t[col]))))
        if pa.types.is_floating(t[col].type)
        else t.filter(t[col].is_valid()),
        batch_format="pyarrow")
    s = clean.sort(col)
    refs = s.to_arrow_refs()
    lens = ray.get([_block_len.remote(r) for r in refs])
    n = int(sum(lens))
    if n == 0:
        return pa.table({"q": pa.array([float(q) for q in qs],
                                       pa.float64()),
                         "value": pa.array([None] * len(qs),
                                           pa.float64())})

    starts = np.concatenate([[0], np.cumsum(lens)])   # block offsets
    # global ranks needed: floor(h) and ceil(h) for each h = (n-1) q
    need: dict[int, float] = {}
    plan = []                       # (q, lo_rank, hi_rank, frac)
    for q in qs:
        h = (n - 1) * float(q)
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        plan.append((float(q), lo, hi, h - np.floor(h)))
        need[lo] = need[hi] = 0.0

    # group needed ranks by owning block; one point-lookup task per block
    by_block: dict[int, list[int]] = {}
    for r in need:
        b = int(np.searchsorted(starts, r, side="right") - 1)
        by_block.setdefault(b, []).append(r - int(starts[b]))
    futs = {b: _pick.remote(refs[b], col, sorted(local))
            for b, local in by_block.items()}
    for b, vals in zip(futs, ray.get(list(futs.values()))):
        for local, v in zip(sorted(by_block[b]), vals):
            need[local + int(starts[b])] = v

    # (1-f)*lo + f*hi, NOT lo + f*(hi-lo): the two are equal in exact
    # arithmetic but differ in the last IEEE bit — this is the form
    # DuckDB's quantile_cont evaluates, so the SQL twin is bit-identical
    out = [(1.0 - frac) * need[lo] + frac * need[hi]
           for (_, lo, hi, frac) in plan]
    return pa.table({"q": pa.array([p[0] for p in plan], pa.float64()),
                     "value": pa.array(out, pa.float64())})
