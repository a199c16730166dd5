"""Per-community conductance of a vertex partition.

The community-quality twin of ``stats.modularity``: for each community S
over the undirected distinct-edge view (self-loops dropped, the NetworkX
``nx.conductance`` convention),

    phi(S) = cut(S, S-bar) / min(vol(S), vol(S-bar))

with cut = edges crossing the boundary and vol = sum of member degrees
(vol(S-bar) = 2m - vol(S)). Low conductance = a well-separated community;
the standard acceptance metric for LPA / CC partitions before they are
used for locality-aware repartitioning (``partition.community_layout``).

Scale shape (the 100 TB contract, same as modularity): two label joins
over the edge table + one degree join, per-batch INTEGER partials, one
groupby(label) shuffle each — per-community rows are the only thing that
ever reaches the driver's result, and every count is exact and
partitioning-independent; the single float op is the final division.

Reference analogue: the per-group summary tallies of the reference's
rec_count tables (SURVEY.md §2.5) — here the group key is the community.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum

from metis_ray.graph.partition import canonical_edges
from metis_ray.graph.stats import _join_parts, _no_self_loops
from metis_ray.graph.triangles import _degrees


def conductance(edges: rd.Dataset, labels: rd.Dataset) -> pa.Table:
    """Conductance of every community in the (v, label) partition over
    the undirected view of ``edges``. Returns one row per DISTINCT label:
    (label, cut_edges, volume, conductance) sorted by label, with
    conductance NULL when min(vol, 2m - vol) = 0 (an edge-free community,
    or a partition with a single community — NetworkX raises there; a
    typed null keeps the per-community table total). Like ``modularity``,
    a label table that duplicates a vertex or misses an edge-incident
    vertex raises instead of silently computing over a subset."""
    from metis_ray.pipelines.dedup import _nonempty_blocks

    parts = _join_parts()
    canon = canonical_edges(_no_self_loops(edges))
    lab = labels.select_columns(["v", "label"])

    # partition validity first (duplicate v double-counts volume AND
    # breaks the coverage arithmetic below) — same contract as modularity
    n_lab = lab.count()
    n_lab_v = lab.groupby("v").aggregate(Count(alias_name="_n")).count()
    if n_lab != n_lab_v:
        raise ValueError(
            f"labels hold {n_lab} rows over {n_lab_v} distinct vertices — "
            "duplicate vertex rows, not a partition of the graph")

    base = (lab.groupby("label").aggregate(Count(alias_name="_sz"))
            .select_columns(["label"]))
    base, _ = _nonempty_blocks(base)
    if base is None:
        return pa.table({"label": pa.array([], pa.int64()),
                         "cut_edges": pa.array([], pa.int64()),
                         "volume": pa.array([], pa.int64()),
                         "conductance": pa.array([], pa.float64())})

    e, m = _nonempty_blocks(canon)
    vol = cut = None
    if e is not None and m > 0:
        deg = _degrees(e).materialize()
        n_deg = deg.count()
        dj, n_cov = _nonempty_blocks(
            deg.join(lab, join_type="inner", num_partitions=parts,
                     on=("v",)))
        if n_cov != n_deg:
            raise ValueError(
                f"labels cover {n_cov} of {n_deg} edge-incident vertices "
                "— not a partition of the graph")
        vol = (dj.groupby("label").aggregate(Sum("deg", alias_name="volume"))
               if dj is not None else None)

        la = lab.map_batches(
            lambda t: t.rename_columns(["src", "label_a"]),
            batch_format="pyarrow")
        lb = lab.map_batches(
            lambda t: t.rename_columns(["dst", "label_b"]),
            batch_format="pyarrow")
        la, _ = _nonempty_blocks(la)
        lb, _ = _nonempty_blocks(lb)
        j = e.join(la, join_type="inner", num_partitions=parts, on=("src",))
        j, _ = _nonempty_blocks(j)
        if j is not None:
            j = j.join(lb, join_type="inner", num_partitions=parts,
                       on=("dst",))

            def boundary(batch: pa.Table) -> pa.Table:
                """Each crossing edge charges one cut to BOTH endpoint
                communities — a per-batch (label, cut) partial."""
                a = batch["label_a"].to_numpy(zero_copy_only=False)
                b = batch["label_b"].to_numpy(zero_copy_only=False)
                x = a != b
                lbl = np.concatenate([a[x], b[x]])
                if not len(lbl):
                    return pa.table({"label": pa.array([], pa.int64()),
                                     "cut_edges": pa.array([], pa.int64())})
                u, c = np.unique(lbl, return_counts=True)
                return pa.table({
                    "label": pa.array(u.astype(np.int64), pa.int64()),
                    "cut_edges": pa.array(c.astype(np.int64), pa.int64())})

            cuts = j.map_batches(boundary, batch_format="pyarrow")
            cuts, _ = _nonempty_blocks(cuts)
            cut = (cuts.groupby("label")
                   .aggregate(Sum("cut_edges", alias_name="cut_edges"))
                   if cuts is not None else None)

    out = base
    if vol is not None:
        vol, _ = _nonempty_blocks(vol)
    if vol is not None:
        out = out.join(vol, join_type="left_outer", num_partitions=parts,
                       on=("label",))
        out, _ = _nonempty_blocks(out)
    if cut is not None:
        cut, _ = _nonempty_blocks(cut)
    if cut is not None and out is not None:
        out = out.join(cut, join_type="left_outer", num_partitions=parts,
                       on=("label",))
        out, _ = _nonempty_blocks(out)

    def finish(batch: pa.Table, _m2=2 * m) -> pa.Table:
        n = batch.num_rows
        z = pa.array(np.zeros(n, np.int64))
        v = (pc.fill_null(batch["volume"], 0) if "volume"
             in batch.column_names else z)
        c = (pc.fill_null(batch["cut_edges"], 0) if "cut_edges"
             in batch.column_names else z)
        vn = v.to_numpy(zero_copy_only=False).astype(np.int64)
        cn = c.to_numpy(zero_copy_only=False).astype(np.int64)
        den = np.minimum(vn, _m2 - vn)
        phi = np.where(den > 0, np.round(cn / np.maximum(den, 1), 6),
                       np.nan)
        return pa.table({
            "label": batch["label"],
            "cut_edges": pa.array(cn, pa.int64()),
            "volume": pa.array(vn, pa.int64()),
            "conductance": pa.array(
                [None if den[i] <= 0 else float(phi[i]) for i in range(n)],
                pa.float64())})

    import ray as _ray
    tabs = [b for b in _ray.get(
        out.map_batches(finish, batch_format="pyarrow").to_arrow_refs())
        if b.num_rows]
    if not tabs:        # unreachable: base is non-empty
        return pa.table({"label": pa.array([], pa.int64()),
                         "cut_edges": pa.array([], pa.int64()),
                         "volume": pa.array([], pa.int64()),
                         "conductance": pa.array([], pa.float64())})
    t = pa.concat_tables(tabs)
    idx = pc.sort_indices(t, sort_keys=[("label", "ascending")])
    return t.take(idx)


def conductance_reference(src, dst, label_of: dict[int, int]) -> list[tuple]:
    """Sequential transcription (the pytest golden): same undirected
    distinct view, same cut/volume/NULL rule. Returns sorted rows
    (label, cut_edges, volume, conductance-or-None)."""
    und = set()
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a != b:
            und.add((min(a, b), max(a, b)))
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m2 = 2 * len(und)
    vol: dict[int, int] = {}
    cut: dict[int, int] = {}
    for lbl in set(label_of.values()):
        vol[lbl] = 0
        cut[lbl] = 0
    for v, d in deg.items():
        vol[label_of[v]] += d
    for a, b in und:
        la, lb = label_of[a], label_of[b]
        if la != lb:
            cut[la] += 1
            cut[lb] += 1
    rows = []
    for lbl in sorted(vol):
        den = min(vol[lbl], m2 - vol[lbl])
        phi = round(cut[lbl] / den, 6) if den > 0 else None
        rows.append((lbl, cut[lbl], vol[lbl], phi))
    return rows
