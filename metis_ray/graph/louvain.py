"""Louvain community detection as a PURE-Dataset formulation — every
local-moving round is label/volume joins + groupby shuffles over Datasets;
no per-vertex state ever sits on the driver (the round-4 verdict's
anti-pattern), which is what lets the label table scale past one machine.

Semantics (deterministic by construction, so a sequential transcription is
an exact-equality oracle):

* Undirected weighted graph: w{a,b} = total multiplicity over both
  directed orientations, self-loops dropped; vol(v) = weighted degree,
  2m = Σ vol.
* Local-moving round t: every node v with (v + t) % 2 == 0 (the
  alternating-parity gate of distributed Louvain — prevents the
  synchronous two-cycle where neighbor pairs endlessly swap communities)
  evaluates the classic modularity gain of joining each NEIGHBOR
  community C against staying, using the PRE-round labels and volumes:

      score(move to C) = 2m * w(v, C)   - deg(v) * vol(C)
      score(stay)      = 2m * w(v, own) - deg(v) * (vol(own) - deg(v))

  (the usual dQ * (2m)^2 with constant terms dropped — all INTEGERS, so
  argmax and the move-iff-strictly-better rule cannot drift between the
  distributed engine and the transcription; ties among moves resolve to
  the smallest community id). int64 bound: 2m * w stays under 2^63 up to
  ~10^9 total edge multiplicity with 10^6-weight neighbors — past that,
  switch the score lanes to the hi/lo-split trick of
  relational.lineitem_corr_stats.
* A level stops when an even+odd round pair moves nothing, or after
  max_rounds (default 12: the bulk of consolidation lands in the first
  ~8 rounds; past that the synchronous dynamics enter a small 2-round
  limit cycle — vertices shuttling between equally attractive
  communities as volumes flip — which the NEXT coarsening level
  dissolves. The cap is part of the recurrence, so the transcription
  stops at the identical state).
* Phase 2 (``levels`` > 1): contract each community to a node — coarse
  edge weights = summed inter-community weights (one groupby), coarse
  node degree = the community's FULL volume (internal mass included, the
  standard Louvain coarse-level degree; 2m is invariant) — and re-run
  local moving on the contracted graph; final labels project back
  through one join per level. Internal (self-loop) weight never appears
  as a move candidate — it travels with the node — but it DOES ride in
  deg/vol, exactly as Louvain requires.

Scale shape per round: one label join onto the edge table, one
(node, neighbor-community) weight groupby, three small attach joins, one
bucket-vectorized argmax, one volume groupby — label and volume tables
stay distributed, the driver sees one moved-count scalar. Contraction is
two label joins + one groupby per level.

Reference analogue: the iterative min-label convergence loops the
reference runs per wafer region (SURVEY.md §2.9); NetworkX's
louvain_communities is RANDOMIZED, so the oracle here is the documented
sequential transcription plus planted-partition recovery
(tests/test_louvain.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks


def _undirected_weights(edges: rd.Dataset) -> rd.Dataset:
    """(a, b, w): both orientations of each distinct undirected pair,
    w = total multiplicity across both directed rows, self-loops out."""
    has_mult = "multiplicity" in edges.schema().names

    def canon(batch: pa.Table) -> pa.Table:
        a = batch["src"].to_numpy(zero_copy_only=False)
        b = batch["dst"].to_numpy(zero_copy_only=False)
        w = (batch["multiplicity"].to_numpy(zero_copy_only=False)
             .astype(np.int64) if has_mult
             else np.ones(len(a), np.int64))
        ns = a != b
        a, b, w = a[ns], b[ns], w[ns]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        t = pa.table({"a": pa.array(lo, pa.int64()),
                      "b": pa.array(hi, pa.int64()),
                      "w": pa.array(w, pa.int64())})
        return t.group_by(["a", "b"]).aggregate([("w", "sum")]) \
                .rename_columns(["a", "b", "w"])

    und = (edges.map_batches(canon, batch_format="pyarrow")
           .groupby(["a", "b"]).aggregate(Sum("w", alias_name="w")))

    def both(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array(np.concatenate([a, b]), pa.int64()),
            "b": pa.array(np.concatenate([b, a]), pa.int64()),
            "w": pa.array(np.concatenate([w, w]), pa.int64())})

    return und.map_batches(both, batch_format="pyarrow")


def _local_moving(e: rd.Dataset, deg: rd.Dataset, two_m: int, parts: int,
                  max_rounds: int) -> tuple[rd.Dataset, int]:
    """One Louvain level over ``e`` (a, b, w — both orientations, no
    self rows, compacted+materialized) with node degrees from ``deg``
    (v, deg — may include internal mass at coarse levels and may cover
    nodes absent from ``e``; those keep their singleton label).
    Returns ((v, comm) Dataset covering every deg node, rounds)."""
    dg_v = deg.materialize()
    dg_v, _ = _nonempty_blocks(dg_v)
    if dg_v is None:
        return rd.from_arrow(pa.table({"v": pa.array([], pa.int64()),
                                       "comm": pa.array([], pa.int64())})), 0
    dg = dg_v.map_batches(lambda tb: tb.rename_columns(["a", "deg"]),
                          batch_format="pyarrow").materialize()

    # nodes with at least one external edge run the loop; the rest keep
    # their singleton label (they can never move nor be a move target)
    enodes = e.groupby("a").aggregate(Sum("w", alias_name="_d"))
    enodes, _ = _nonempty_blocks(enodes)
    if enodes is None:
        lonely_all = dg_v.map_batches(
            lambda tb: pa.table({"v": tb["v"], "comm": tb["v"]}),
            batch_format="pyarrow")
        return lonely_all, 0
    loop_nodes = enodes.map_batches(
        lambda tb: pa.table({"v": tb["a"]}), batch_format="pyarrow")
    loop_nodes, _ = _nonempty_blocks(loop_nodes)
    lonely = dg_v.select_columns(["v"]).join(
        loop_nodes, join_type="left_anti", num_partitions=parts, on=("v",))
    lonely, _ = _nonempty_blocks(lonely)

    labels = loop_nodes.map_batches(
        lambda tb: pa.table({"v": tb["v"], "comm": tb["v"]}),
        batch_format="pyarrow").materialize()
    labels, _ = _nonempty_blocks(labels)

    def volumes(lab: rd.Dataset) -> rd.Dataset:
        j = lab.join(dg_v, join_type="inner",
                     num_partitions=parts, on=("v",))
        vol = j.groupby("comm").aggregate(Sum("deg", alias_name="vol"))
        vol, _ = _nonempty_blocks(vol)
        return vol.materialize()

    vol = volumes(labels)
    rounds = 0
    quiet = 0
    for t in range(max_rounds):
        # labels and vol are compacted+materialized at the end of each
        # round; the rename map_batches below preserve nonemptiness, so
        # only join OUTPUTS need recompaction inside the round
        lab_b = labels.map_batches(
            lambda tb: tb.rename_columns(["b", "comm_b"]),
            batch_format="pyarrow")
        j = e.join(lab_b, join_type="inner", num_partitions=parts,
                   on=("b",))
        wvc = (j.groupby(["a", "comm_b"])
               .aggregate(Sum("w", alias_name="wvc")))
        wvc, _ = _nonempty_blocks(wvc)
        if wvc is None:
            break
        own = labels.map_batches(
            lambda tb: tb.rename_columns(["a", "comm_a"]),
            batch_format="pyarrow")
        wvc = wvc.join(own, join_type="inner", num_partitions=parts,
                       on=("a",))
        wvc, _ = _nonempty_blocks(wvc)
        wvc = wvc.join(dg, join_type="inner", num_partitions=parts,
                       on=("a",))
        vc = vol.map_batches(
            lambda tb: tb.rename_columns(["comm_b", "vol_c"]),
            batch_format="pyarrow")
        wvc, _ = _nonempty_blocks(wvc)
        wvc = wvc.join(vc, join_type="inner", num_partitions=parts,
                       on=("comm_b",))
        vo = vol.map_batches(
            lambda tb: tb.rename_columns(["comm_a", "vol_own"]),
            batch_format="pyarrow")
        wvc, _ = _nonempty_blocks(wvc)
        wvc = wvc.join(vo, join_type="inner", num_partitions=parts,
                       on=("comm_a",))

        def add_bucket(tb: pa.Table, _nb=max(16, parts)) -> pa.Table:
            b = tb["a"].to_numpy(zero_copy_only=False) % _nb
            return tb.append_column("bucket", pa.array(b, pa.int64()))

        def pick(g: pd.DataFrame, _t=t, _2m=two_m) -> pd.DataFrame:
            # vectorized argmax over every node in this hash bucket
            a = g["a"].to_numpy(np.int64)
            order = np.argsort(a, kind="stable")
            a = a[order]
            C = g["comm_b"].to_numpy(np.int64)[order]
            wv = g["wvc"].to_numpy(np.int64)[order]
            own = g["comm_a"].to_numpy(np.int64)[order]
            dg_ = g["deg"].to_numpy(np.int64)[order]
            vc_ = g["vol_c"].to_numpy(np.int64)[order]
            vo_ = g["vol_own"].to_numpy(np.int64)[order]
            ua, first, inv = np.unique(a, return_index=True,
                                       return_inverse=True)
            deg_v, vol_own_v, own_v = dg_[first], vo_[first], own[first]
            w_own = np.zeros(len(ua), np.int64)
            is_own = C == own
            w_own[inv[is_own]] = wv[is_own]     # (a, C) rows are unique
            stay = _2m * w_own - deg_v * (vol_own_v - deg_v)
            mm = ~is_own
            s = _2m * wv[mm] - dg_[mm] * vc_[mm]
            gi, ci = inv[mm], C[mm]
            best_s = np.full(len(ua), np.iinfo(np.int64).min, np.int64)
            best_c = np.zeros(len(ua), np.int64)
            if len(s):
                o2 = np.lexsort((ci, -s, gi))   # per node: score desc,
                gi2, s2, c2 = gi[o2], s[o2], ci[o2]   # then comm-id asc
                head = np.r_[True, gi2[1:] != gi2[:-1]]
                best_s[gi2[head]] = s2[head]
                best_c[gi2[head]] = c2[head]
            gate = (ua + _t) % 2 == 0
            cond = gate & (best_s > stay)
            new = np.where(cond, best_c, own_v)
            return pd.DataFrame({"v": ua, "comm": new,
                                 "moved": cond.astype(np.int64)})

        picked = (wvc.map_batches(add_bucket, batch_format="pyarrow")
                  .groupby("bucket").map_groups(pick,
                                                batch_format="pandas")
                  .materialize())
        moves = int(picked.aggregate(Sum("moved"))["sum(moved)"])
        labels = picked.drop_columns(["moved"]).materialize()
        labels, _ = _nonempty_blocks(labels)
        rounds += 1
        if moves == 0:
            quiet += 1
            if quiet >= 2:                      # a full even+odd quiet pair
                break
        else:
            quiet = 0
            vol = volumes(labels)
    if lonely is not None:
        singles = lonely.map_batches(
            lambda tb: pa.table({"v": tb["v"], "comm": tb["v"]}),
            batch_format="pyarrow")
        labels = labels.union(singles).materialize()
        labels, _ = _nonempty_blocks(labels)
    return labels, rounds


def louvain_dataset(edges: rd.Dataset, vertices: rd.Dataset, *,
                    max_rounds: int = 12,
                    levels: int = 1) -> tuple[rd.Dataset, int]:
    """((v, comm) Dataset over ALL vertices — isolated ones stay
    singleton — and the total local-moving rounds across levels). See
    module docstring for the exact recurrence; ``levels`` > 1 adds
    coarsening passes (full multi-level Louvain)."""
    parts = _join_parts()
    e, _ = _nonempty_blocks(_undirected_weights(edges))
    if e is None:
        def single(batch: pa.Table) -> pa.Table:
            v = batch["vertex_id"]
            return pa.table({"v": v, "comm": v})
        return vertices.map_batches(single, batch_format="pyarrow"), 0
    e = e.materialize()

    deg = (e.groupby("a").aggregate(Sum("w", alias_name="deg"))
           .map_batches(lambda tb: tb.rename_columns(["v", "deg"]),
                        batch_format="pyarrow"))
    two_m = int(e.aggregate(Sum("w"))["sum(w)"])   # both orientations = 2m

    labels, total_rounds = _local_moving(e, deg, two_m, parts, max_rounds)

    for _lvl in range(1, levels):
        # coarse node degree = FULL community volume (internal mass rides
        # in deg/vol; 2m is invariant across levels)
        deg2 = (labels.join(deg, join_type="inner", num_partitions=parts,
                            on=("v",))
                .groupby("comm").aggregate(Sum("deg", alias_name="deg"))
                .map_batches(lambda tb: tb.rename_columns(["v", "deg"]),
                             batch_format="pyarrow"))
        # contract: inter-community weights only (self rows dropped)
        lab_a = labels.map_batches(
            lambda tb: tb.rename_columns(["a", "ca"]),
            batch_format="pyarrow")
        lab_b = labels.map_batches(
            lambda tb: tb.rename_columns(["b", "cb"]),
            batch_format="pyarrow")
        ej = e.join(lab_a, join_type="inner", num_partitions=parts,
                    on=("a",))
        ej, _ = _nonempty_blocks(ej)
        if ej is None:
            break
        ej = ej.join(lab_b, join_type="inner", num_partitions=parts,
                     on=("b",))

        def coarse(tb: pa.Table) -> pa.Table:
            ca = tb["ca"].to_numpy(zero_copy_only=False)
            cb = tb["cb"].to_numpy(zero_copy_only=False)
            w = tb["w"].to_numpy(zero_copy_only=False)
            keep = ca != cb
            return pa.table({"a": pa.array(ca[keep], pa.int64()),
                             "b": pa.array(cb[keep], pa.int64()),
                             "w": pa.array(w[keep].astype(np.int64),
                                           pa.int64())})

        e2 = (ej.map_batches(coarse, batch_format="pyarrow")
              .groupby(["a", "b"]).aggregate(Sum("w", alias_name="w")))
        e2, _ = _nonempty_blocks(e2)
        if e2 is None:
            break                                # one community per block
        e2 = e2.materialize()
        l2, r2 = _local_moving(e2, deg2, two_m, parts, max_rounds)
        total_rounds += r2
        # project: v -> c1 -> c2
        l2r = l2.map_batches(
            lambda tb: tb.rename_columns(["comm", "comm2"]),
            batch_format="pyarrow")
        l2r, _ = _nonempty_blocks(l2r)
        labels = labels.join(l2r, join_type="inner", num_partitions=parts,
                             on=("comm",))
        labels = labels.map_batches(
            lambda tb: pa.table({"v": tb["v"], "comm": tb["comm2"]}),
            batch_format="pyarrow").materialize()
        labels, _ = _nonempty_blocks(labels)
        e, deg = e2, deg2

    # isolated vertices: not in any edge -> singleton communities
    lab_r, _ = _nonempty_blocks(labels)
    vt = vertices.map_batches(
        lambda tb: pa.table({"v": tb["vertex_id"]}),
        batch_format="pyarrow")
    vt, _ = _nonempty_blocks(vt)
    if lab_r is None:
        out = vt.map_batches(lambda tb: pa.table({"v": tb["v"],
                                                  "comm": tb["v"]}),
                             batch_format="pyarrow")
        return out, total_rounds
    iso = vt.join(lab_r.select_columns(["v"]), join_type="left_anti",
                  num_partitions=parts, on=("v",))
    iso, _ = _nonempty_blocks(iso)
    if iso is not None:
        singles = iso.map_batches(
            lambda tb: pa.table({"v": tb["v"], "comm": tb["v"]}),
            batch_format="pyarrow")
        labels = labels.union(singles)
    return labels, total_rounds


def _local_moving_ref(adj: dict, deg: dict, two_m: int,
                      max_rounds: int) -> tuple[dict, int]:
    """Sequential transcription of one ``_local_moving`` level."""
    comm = {v: v for v in adj if adj[v]}
    for v in deg:
        comm.setdefault(v, v)                   # lonely -> singleton
    vol: dict = {}
    for v, c in comm.items():
        if adj.get(v):
            vol[c] = vol.get(c, 0) + deg.get(v, 0)
    quiet = 0
    rounds = 0
    for t in range(max_rounds):
        new_comm = dict(comm)
        moves = 0
        for v in sorted(adj):
            if not adj[v] or (v + t) % 2:
                continue
            own_c = comm[v]
            w_to: dict = {}
            for u, w in adj[v].items():
                cu = comm[u]
                w_to[cu] = w_to.get(cu, 0) + w
            stay = (two_m * w_to.get(own_c, 0)
                    - deg[v] * (vol.get(own_c, 0) - deg[v]))
            best_score, best_c = None, None
            for c, w in sorted(w_to.items()):
                if c == own_c:
                    continue
                s = two_m * w - deg[v] * vol.get(c, 0)
                if best_score is None or s > best_score:
                    best_score, best_c = s, c
            if best_score is not None and best_score > stay:
                new_comm[v] = best_c
                moves += 1
        comm = new_comm
        rounds += 1
        if moves == 0:
            quiet += 1
            if quiet >= 2:
                break
        else:
            quiet = 0
            vol = {}
            for v in adj:
                if adj[v]:
                    vol[comm[v]] = vol.get(comm[v], 0) + deg[v]
    return comm, rounds


def louvain_reference(pairs_w: dict, vids, *, max_rounds: int = 12,
                      levels: int = 1) -> dict[int, int]:
    """Sequential transcription of the EXACT multi-level recurrence above
    (the pytest and golden oracle): ``pairs_w`` maps canonical (a < b)
    pairs to their undirected integer weight."""
    adj: dict = {int(v): {} for v in vids}
    for (a, b), w in pairs_w.items():
        if a == b:
            continue
        adj.setdefault(a, {})
        adj.setdefault(b, {})
        adj[a][b] = adj[a].get(b, 0) + int(w)
        adj[b][a] = adj[b].get(a, 0) + int(w)
    deg = {v: sum(adj[v].values()) for v in adj}
    two_m = sum(deg.values())
    if two_m == 0:
        return {int(v): int(v) for v in vids}
    comm, _ = _local_moving_ref(adj, deg, two_m, max_rounds)
    for _lvl in range(1, levels):
        deg2: dict = {}
        for v, d in deg.items():
            if adj.get(v):
                deg2[comm[v]] = deg2.get(comm[v], 0) + d
        adj2: dict = {c: {} for c in deg2}
        for v in adj:
            for u, w in adj[v].items():
                cv, cu = comm[v], comm[u]
                if cv != cu:
                    adj2[cv][cu] = adj2[cv].get(cu, 0) + w
        if not any(adj2[c] for c in adj2):
            break
        comm2, _ = _local_moving_ref(adj2, deg2, two_m, max_rounds)
        comm = {v: comm2.get(c, c) for v, c in comm.items()}
        adj, deg = adj2, deg2
    out = {int(v): int(v) for v in vids}
    out.update({v: c for v, c in comm.items()})
    return out
