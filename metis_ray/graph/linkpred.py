"""Neighborhood-overlap link prediction as a pure Ray Data composition.

Common-neighbors count and Adamic-Adar score over the undirected view of
the dependency graph — the classic "which files SHOULD import each other"
signal (Adamic & Adar 2003; the reference's analytics surface stops at
per-vertex statistics, this extends the same edge table to pair-level
prediction). Reference analogue: the per-key statistic tables built by
Metis' tally stages (see SURVEY.md §2.5) — here the key is a vertex PAIR
and the statistic is wedge overlap.

Shape (the 100 TB contract):

    canonical undirected edges (distinct, src<dst)          [1 shuffle]
      -> symmetrized incidence (v, n) both directions        [map only]
      -> wedge centers: groupby(v).map_groups                [1 shuffle]
           * centers with degree > max_hub_degree emit ONE counted
             sentinel row instead of O(deg^2) pairs — the same skew guard
             as the LSH bucket cap (dedup._pairs_from_buckets). A hub's
             1/ln(deg) weight is asymptotically negligible anyway, so the
             cap is a documented semantic, not an approximation knob: the
             SQL twin applies the SAME predicate.
           * each surviving center emits its triu pair list with the
             center's weight 1/ln(deg) — pairs never visit the driver.
      -> groupby(a, b): Sum(weight) + Count = the two scores  [1 shuffle]
      -> left_anti join vs the canonical edge set (only NON-adjacent
         pairs are predictions)                               [1 shuffle]
      -> round Arrow-side, distributed sort, limit k.

Every stage is a Dataset op; per-batch work is numpy; the driver sees only
the final k rows (and the optional sentinel count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from metis_ray.graph.partition import canonical_edges

_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                          ("w", pa.float64())])


def _symmetrize(canon: rd.Dataset) -> rd.Dataset:
    def both(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.not_equal(batch["src"], batch["dst"]))
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array(np.concatenate([s, d]), pa.int64()),
                         "n": pa.array(np.concatenate([d, s]), pa.int64())})

    return canon.map_batches(both, batch_format="pyarrow")


def _wedge_pairs(sym: rd.Dataset, max_hub_degree: int,
                 stats: dict | None) -> rd.Dataset:
    """Candidate pairs (a < b) with per-wedge Adamic-Adar weight ``w`` and
    an implicit count-of-rows common-neighbor tally; hub centers emit one
    counted sentinel row (a = -1) instead of O(deg^2) pairs."""

    def wedges(group: pa.Table) -> pa.Table:
        ns = np.unique(group["n"].to_numpy(zero_copy_only=False))
        deg = len(ns)
        if deg < 2:
            return _PAIR_SCHEMA.empty_table()
        if deg > max_hub_degree:
            v = group["v"][0].as_py()
            return pa.table({"a": pa.array([-1], pa.int64()),
                             "b": pa.array([v], pa.int64()),
                             "w": pa.array([0.0], pa.float64())})
        ii, jj = np.triu_indices(deg, k=1)
        w = 1.0 / np.log(deg)
        return pa.table({"a": pa.array(ns[ii], pa.int64()),
                         "b": pa.array(ns[jj], pa.int64()),
                         "w": pa.array(np.full(len(ii), w), pa.float64())})

    pairs = sym.groupby("v").map_groups(wedges, batch_format="pyarrow")

    if stats is not None:
        pairs = pairs.materialize()
        stats["dropped_hubs"] = pairs.map_batches(
            lambda t: t.filter(pc.less(t["a"], pa.scalar(0))),
            batch_format="pyarrow").count()
    return pairs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["a"], pa.scalar(0))),
        batch_format="pyarrow")


def adamic_adar(edges: rd.Dataset, *, k: int = 100,
                max_hub_degree: int = 4096,
                stats: dict | None = None) -> rd.Dataset:
    """Top-``k`` non-adjacent pairs by Adamic-Adar score.

    Output columns: (a, b, common_neighbors: int64, adamic_adar: float64
    rounded to 6 dp). Deterministic order: (adamic_adar DESC, a, b) —
    rounding happens Arrow-side BEFORE the distributed sort so ties at the
    k-th score resolve exactly as the SQL twin's ORDER BY (the q3 rule).

    Wedge centers with undirected degree > ``max_hub_degree`` are excluded
    by definition (counted in ``stats['dropped_hubs']`` when given).
    Centers of degree 1 contribute no wedge; degree >= 2 makes ln(deg) > 0.
    """
    # ONE dedup shuffle, shared: canon feeds both the wedge machinery and
    # the anti-join side — without materialize() each consumer re-executes
    # the groupby-distinct over the whole edge table
    canon = canonical_edges(edges).materialize()
    sym = _symmetrize(canon)
    pairs = _wedge_pairs(sym, max_hub_degree, stats)

    scored = pairs.groupby(["a", "b"]).aggregate(
        Sum("w", alias_name="adamic_adar"),
        Count(alias_name="common_neighbors"))

    # predictions = pairs NOT already edges (hash-shuffle anti-join; both
    # sides stay distributed). Joins choke on zero-row blocks -> compact.
    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks
    left, n_left = _nonempty_blocks(scored)
    if left is None:
        return rd.from_arrow(pa.schema(
            [("a", pa.int64()), ("b", pa.int64()),
             ("common_neighbors", pa.int64()),
             ("adamic_adar", pa.float64())]).empty_table())
    # compact the RIGHT side too (the materialized dedup groupby can carry
    # schema-less zero-row blocks; joins raise on either side)
    adj, _ = _nonempty_blocks(canon.rename_columns({"src": "a", "dst": "b"}))
    nonadj = left if adj is None else left.join(
        adj, join_type="left_anti", on=("a", "b"),
        num_partitions=_join_parts())

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "a": batch["a"],
            "b": batch["b"],
            "common_neighbors": batch["common_neighbors"],
            "adamic_adar": pc.round(batch["adamic_adar"], ndigits=6),
        })

    out = nonadj.map_batches(finish, batch_format="pyarrow")
    return out.sort(["adamic_adar", "a", "b"],
                    descending=[True, False, False]).limit(k)


def jaccard_neighbors(edges: rd.Dataset, *, k: int = 100,
                      max_hub_degree: int = 4096,
                      stats: dict | None = None) -> rd.Dataset:
    """Top-``k`` non-adjacent pairs by neighborhood Jaccard similarity
    |N(a) ∩ N(b)| / |N(a) ∪ N(b)|.

    Output columns: (a, b, common_neighbors: int64, jaccard: float64
    rounded to 6 dp), deterministic order (jaccard DESC, a, b). The
    intersection comes from the hub-capped wedge count (same candidate
    machinery and the same documented cap semantic as :func:`adamic_adar`);
    the two degrees are exact and attached by hash-shuffle joins against
    the degree table (|V| rows — never broadcast, never collected).
    """
    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks

    # ONE dedup shuffle, shared across wedges / degrees / the anti-join
    # side (same rationale as adamic_adar)
    canon = canonical_edges(edges).materialize()
    sym = _symmetrize(canon)
    pairs = _wedge_pairs(sym, max_hub_degree, stats)

    cn = pairs.groupby(["a", "b"]).aggregate(
        Count(alias_name="common_neighbors"))

    left, _ = _nonempty_blocks(cn)
    if left is None:
        return rd.from_arrow(pa.schema(
            [("a", pa.int64()), ("b", pa.int64()),
             ("common_neighbors", pa.int64()),
             ("jaccard", pa.float64())]).empty_table())
    nparts = _join_parts()
    adj, _ = _nonempty_blocks(canon.rename_columns({"src": "a", "dst": "b"}))
    nonadj = left if adj is None else left.join(
        adj, join_type="left_anti", on=("a", "b"), num_partitions=nparts)

    deg, _ = _nonempty_blocks(
        sym.groupby("v").aggregate(Count(alias_name="deg")))
    if deg is None:      # unreachable: wedge pairs imply degrees >= 2
        return rd.from_arrow(pa.schema(
            [("a", pa.int64()), ("b", pa.int64()),
             ("common_neighbors", pa.int64()),
             ("jaccard", pa.float64())]).empty_table())

    left, _ = _nonempty_blocks(nonadj)
    if left is None:
        return rd.from_arrow(pa.schema(
            [("a", pa.int64()), ("b", pa.int64()),
             ("common_neighbors", pa.int64()),
             ("jaccard", pa.float64())]).empty_table())
    deg_a = deg.rename_columns({"v": "a", "deg": "deg_a"})
    withdeg = left.join(deg_a, join_type="inner", on=("a",),
                        num_partitions=nparts)
    left, _ = _nonempty_blocks(withdeg)
    if left is None:
        return rd.from_arrow(pa.schema(
            [("a", pa.int64()), ("b", pa.int64()),
             ("common_neighbors", pa.int64()),
             ("jaccard", pa.float64())]).empty_table())
    deg_b = deg.rename_columns({"v": "b", "deg": "deg_b"})
    withdeg = left.join(deg_b, join_type="inner", on=("b",),
                        num_partitions=nparts)

    def finish(batch: pa.Table) -> pa.Table:
        cn_ = batch["common_neighbors"].to_numpy(zero_copy_only=False)
        da = batch["deg_a"].to_numpy(zero_copy_only=False)
        db = batch["deg_b"].to_numpy(zero_copy_only=False)
        j = cn_ / (da + db - cn_)
        return pa.table({
            "a": batch["a"],
            "b": batch["b"],
            "common_neighbors": batch["common_neighbors"],
            "jaccard": pc.round(pa.array(j, pa.float64()), ndigits=6),
        })

    out = withdeg.map_batches(finish, batch_format="pyarrow")
    return out.sort(["jaccard", "a", "b"],
                    descending=[True, False, False]).limit(k)
