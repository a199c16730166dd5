"""Deterministic node2vec-biased random walks as Dataset supersteps.

Second-order walks (Grover & Leskovec, KDD 2016, arXiv:1607.00653): the
choice at step t is biased by where the walk came from — a neighbor x of
the current vertex draws search bias

    alpha(prev, x) = 1/p  if x == prev          (return)
                     1    if x in N(prev)       (BFS-ish, stay local)
                     1/q  otherwise             (DFS-ish, explore)

so p < 1 keeps walks local and q < 1 pushes them outward; p = q = 1
degenerates to the first-order DeepWalk walk (``graph/walks.py``).
These walk corpora are the input to skip-gram graph embeddings — the
training-data primitive this engine exists to feed.

Determinism without coordination (the 100 TB contract, the same trick as
``walks.py``): the biased choice is a deterministic exponential race
(Efraimidis-Spirakis) — each candidate draws key = -ln(U)/alpha with U =
an avalanche hash of (walk_id, step, candidate, seed) mapped into (0, 1],
and the walk takes the argmin key, so P(choose x) = alpha_x / sum(alpha).
Reproducible at ANY parallelism / partitioning; ``node2vec_reference``
transcribes the exact recurrence sequentially (the pytest/DuckDB golden).

Scale shape: per step, one frontier-sized hash join against the edge
table (candidate expansion) plus one hash join against the SAME edge
table keyed (prev, candidate) — the "is x a neighbor of prev" probe that
makes the walk second-order — then a groupby(walk_id) argmin. The edge
relation is shuffled once per join but never broadcast and never touches
the driver; frontier state is (walk_id, prev, cur), O(walks) rows.

Reference analogue: the reference's per-record state machines carry one
record of lookback (``Metis/python/metis_source.py:47-52``) — here the
lookback (prev) travels IN the frontier row, never in a coordinator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from metis_ray.graph.walks import _mix, _race_keys


def node2vec_walks(edges: rd.Dataset, starts: list[int], *,
                   length: int = 10, p: float = 1.0, q: float = 1.0,
                   seed: int = 0, directed: bool = True) -> rd.Dataset:
    """node2vec walks of at most ``length`` steps from each start vertex
    (one walk per start; ``walk_id`` = start vertex id). Returns a
    Dataset (walk_id, step, v) with step 0 = the start. Step 1 has no
    lookback and chooses uniformly (argmin avalanche hash, the DeepWalk
    rule); steps >= 2 race with the p/q bias above. Neighborhoods are the
    DISTINCT out-neighbor sets of the directed view (or the symmetrized
    view with ``directed=False``); dead-end walkers stop. ``p`` and ``q``
    must be positive and finite."""
    from metis_ray.graph.partition import symmetrized
    from metis_ray.graph.stats import distinct_edges
    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks

    if not (np.isfinite(p) and np.isfinite(q) and p > 0 and q > 0):
        raise ValueError("node2vec p and q must be positive and finite")

    g = edges.select_columns(["src", "dst"])
    g = symmetrized(g) if not directed else distinct_edges(g)
    g, _ = _nonempty_blocks(g)   # compact: joins raise on zero-row blocks
    parts = _join_parts()

    # the (prev, candidate) membership probe side: same relation, renamed
    # so the two-key join has matching column names on both sides, plus a
    # constant marker that survives the left_outer as null-for-non-edges
    adj = None
    if g is not None:
        adj = g.map_batches(
            lambda t: pa.table({"prev": t["src"], "v": t["dst"],
                                "is_nbr": pa.array(
                                    np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow")
        adj, _ = _nonempty_blocks(adj)

    s = np.asarray(sorted(set(int(v) for v in starts)), dtype=np.int64)
    steps = [rd.from_arrow(pa.table({
        "walk_id": pa.array(s, pa.int64()),
        "step": pa.array(np.zeros(len(s), np.int64)),
        "v": pa.array(s, pa.int64())}))]
    # frontier carries the lookback: (walk_id, prev, src); prev = -1 at
    # step 1 (no lookback — ids are non-negative by the vertex-id contract)
    frontier = rd.from_arrow(pa.table({
        "walk_id": pa.array(s, pa.int64()),
        "prev": pa.array(np.full(len(s), -1, np.int64)),
        "src": pa.array(s, pa.int64())}))

    for step in range(1, length + 1):
        if g is None:                  # edgeless graph: walks end at step 0
            break
        fr, _ = _nonempty_blocks(frontier)
        if fr is None:
            break
        cand = fr.join(g, join_type="inner", num_partitions=parts,
                       on=("src",))
        cand, _ = _nonempty_blocks(cand)
        if cand is None:
            break
        if step > 1 and adj is not None:
            # second-order probe: mark candidates that are out-neighbors
            # of prev. Rename dst -> v to meet the probe relation's key
            # names; the left_outer leaves is_nbr null for non-edges.
            cand = cand.map_batches(
                lambda t: pa.table({"walk_id": t["walk_id"],
                                    "prev": t["prev"], "src": t["src"],
                                    "v": t["dst"]}),
                batch_format="pyarrow")
            cand = cand.join(adj, join_type="left_outer",
                             num_partitions=parts, on=("prev", "v"))
            cand, _ = _nonempty_blocks(cand)
            if cand is None:
                break

        def choose(group: pa.Table, _step=step, _p=p, _q=q) -> pa.Table:
            w = group["walk_id"].to_numpy(zero_copy_only=False)
            col = "v" if "v" in group.column_names else "dst"
            d = group[col].to_numpy(zero_copy_only=False)
            cur = int(group["src"][0].as_py())
            h = _mix(w, _step, d, seed)
            if _step == 1:
                # no lookback: uniform choice, tie-break to smaller id —
                # identical to walks.py's unweighted rule
                i = np.lexsort((d, h))[0]
            else:
                prev = group["prev"].to_numpy(zero_copy_only=False)
                nbr = (pc.fill_null(group["is_nbr"], 0)
                       .to_numpy(zero_copy_only=False).astype(np.int64))
                alpha = np.where(d == prev, 1.0 / _p,
                                 np.where(nbr == 1, 1.0, 1.0 / _q))
                i = np.lexsort((d, _race_keys(h, alpha)))[0]
            return pa.table({
                "walk_id": pa.array([int(w[i])], pa.int64()),
                "prev": pa.array([cur], pa.int64()),
                "src": pa.array([int(d[i])], pa.int64())})

        nxt = cand.groupby("walk_id").map_groups(
            choose, batch_format="pyarrow").materialize()
        steps.append(nxt.map_batches(
            lambda t, _step=step: pa.table({
                "walk_id": t["walk_id"],
                "step": pa.array(np.full(t.num_rows, _step, np.int64)),
                "v": t["src"]}), batch_format="pyarrow"))
        frontier = nxt

    out = steps[0]
    for st in steps[1:]:
        out = out.union(st)
    return out


def node2vec_reference(adj: dict[int, set[int]], starts: list[int], *,
                       length: int = 10, p: float = 1.0, q: float = 1.0,
                       seed: int = 0) -> list[tuple]:
    """Sequential transcription of the EXACT node2vec recurrence (the
    pytest/DuckDB golden): same mix, same race keys, same tie order, same
    alpha arithmetic. Returns sorted (walk_id, step, v) tuples."""
    rows = []
    for s in sorted(set(int(v) for v in starts)):
        prev, cur = -1, s
        rows.append((s, 0, s))
        for step in range(1, length + 1):
            nbrs = sorted(adj.get(cur, ()))
            if not nbrs:
                break
            d = np.asarray(nbrs, dtype=np.int64)
            h = _mix(np.full(len(d), s, np.int64), step, d, seed)
            if step == 1:
                i = np.lexsort((d, h))[0]
            else:
                pn = adj.get(prev, set())
                nbr = np.asarray([1 if int(x) in pn else 0 for x in d],
                                 dtype=np.int64)
                alpha = np.where(d == prev, 1.0 / p,
                                 np.where(nbr == 1, 1.0, 1.0 / q))
                i = np.lexsort((d, _race_keys(h, alpha)))[0]
            prev, cur = cur, int(d[i])
            rows.append((s, step, cur))
    return sorted(rows)
