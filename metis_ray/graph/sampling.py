"""Deterministic k-hop neighborhood sampling (the GraphSAGE primitive).

For GNN-style training pipelines: from each seed vertex, expand ``h`` hops,
keeping at most ``fanouts[h]`` neighbors per frontier vertex at hop ``h``.
Reference analogue: the reference's bounded record iterators (SURVEY.md
§2.3); here the bound is the per-vertex fanout and the "stream" is a
frontier over the edge table.

Determinism without coordination (the 100 TB contract): the neighbors kept
for vertex v at hop h are the ``fanout`` smallest by the avalanche hash
mixed from (v, hop, neighbor, seed) — a uniform-without-replacement sample
for a pseudo-random hash, reproducible at ANY parallelism / partitioning
(the same trick as graph/walks.py). Selection is two-level and skew-safe:
every batch keeps its LOCAL fanout-smallest per vertex (the combiner — a
hub's candidates never meet in one task until they are <= fanout ×
block-count rows), then one groupby(src) picks the global fanout-smallest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from metis_ray.graph.walks import _mix


def _local_topf(batch: pa.Table, hop: int, fanout: int,
                seed: int) -> pa.Table:
    """Per-batch combiner: keep each vertex's ``fanout`` smallest-hash
    neighbors within this batch (ties break to the smaller neighbor id,
    matching the final selection)."""
    if batch.num_rows == 0:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64())})
    s = batch["src"].to_numpy(zero_copy_only=False)
    d = batch["dst"].to_numpy(zero_copy_only=False)
    h = _mix(s, hop, d, seed)
    order = np.lexsort((d, h, s))                     # group by src, then (h, d)
    s, d, h = s[order], d[order], h[order]
    cuts = np.flatnonzero(np.concatenate(([True], s[1:] != s[:-1])))
    rank = np.arange(len(s)) - np.repeat(cuts, np.diff(
        np.append(cuts, len(s))))
    keep = rank < fanout
    return pa.table({"src": pa.array(s[keep], pa.int64()),
                     "dst": pa.array(d[keep], pa.int64())})


def khop_sample(edges: rd.Dataset, seeds: list[int], *,
                fanouts: tuple = (10, 5), seed: int = 0,
                directed: bool = True) -> rd.Dataset:
    """Sampled ego-net edges: (hop, src, dst) with hop = 1..len(fanouts),
    src in hop h's frontier and dst one of its <= fanouts[h-1] sampled
    out-neighbors (undirected view when ``directed=False``). The hop-h
    frontier is the distinct dst set of hop h-1 (seeds at hop 0);
    revisited vertices are re-expanded (GraphSAGE semantics — each hop
    samples independently). Duplicate input edges are collapsed first, so
    the sample is over the DISTINCT neighbor set. Exact sequential
    transcription oracle: ``khop_reference``."""
    from metis_ray.graph.partition import symmetrized
    from metis_ray.graph.stats import distinct_edges
    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks

    g = edges.select_columns(["src", "dst"])
    # compact: the dedup groupby can emit schema-less zero-row blocks and
    # the frontier join raises on them on the RIGHT side too
    g, _ = _nonempty_blocks(
        symmetrized(g) if not directed else distinct_edges(g))
    parts = _join_parts()

    frontier = rd.from_arrow(pa.table({"src": pa.array(
        sorted(set(int(v) for v in seeds)), pa.int64())}))
    hops = []
    empty = pa.table({"hop": pa.array([], pa.int64()),
                      "src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})

    if g is None:
        return rd.from_arrow(empty)
    for hop, fanout in enumerate(fanouts, start=1):
        fr, n_live = _nonempty_blocks(frontier)
        if fr is None:
            break
        cand = fr.join(g, join_type="inner", num_partitions=parts,
                       on=("src",))
        cand, _ = _nonempty_blocks(
            cand.map_batches(
                lambda t, _h=hop, _f=fanout: _local_topf(t, _h, _f, seed),
                batch_format="pyarrow"))
        if cand is None:
            break

        def final(group: pa.Table, _h=hop, _f=fanout) -> pa.Table:
            return _local_topf(group, _h, _f, seed)

        picked = (cand.groupby("src").map_groups(final,
                                                 batch_format="pyarrow")
                  .materialize())
        hops.append(picked.map_batches(
            lambda t, _h=hop: pa.table({
                "hop": pa.array(np.full(t.num_rows, _h, np.int64)),
                "src": t["src"], "dst": t["dst"]}),
            batch_format="pyarrow"))
        frontier = (picked.map_batches(
            lambda t: pa.table({"src": t["dst"]}), batch_format="pyarrow")
            .groupby("src").count()
            .select_columns(["src"]))

    if not hops:
        return rd.from_arrow(empty)
    out = hops[0]
    for h in hops[1:]:
        out = out.union(h)
    return out


def khop_reference(adj: dict[int, set[int]], seeds: list[int], *,
                   fanouts: tuple = (10, 5), seed: int = 0) -> list[tuple]:
    """Sequential transcription of the EXACT sampling recurrence (the
    pytest golden): same mix, same (hash, id) tie order, same frontier
    rule. Returns sorted (hop, src, dst) tuples."""
    frontier = sorted(set(int(v) for v in seeds))
    rows = []
    for hop, fanout in enumerate(fanouts, start=1):
        nxt = set()
        for v in frontier:
            nbrs = sorted(adj.get(v, ()))
            if not nbrs:
                continue
            d = np.asarray(nbrs, dtype=np.int64)
            h = _mix(np.full(len(d), v, np.int64), hop, d, seed)
            order = np.lexsort((d, h))[:fanout]
            for i in order:
                rows.append((hop, v, int(d[i])))
                nxt.add(int(d[i]))
        frontier = sorted(nxt)
        if not frontier:
            break
    return sorted(rows)
