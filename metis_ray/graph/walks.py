"""Deterministic random-walk sampling as Dataset supersteps.

The training-data primitive for graph-context corpus construction
(DeepWalk / node2vec-style vertex sequences): from each start vertex, take
``length`` steps, at each step choosing uniformly among the current
vertex's out-neighbors. Reference analogue: the reference's record
iterators walk a fixed file structure (SURVEY.md §2.3 stream state); here
the "stream" is a frontier of walkers over the edge table.

Determinism without coordination (the 100 TB contract): the "random"
choice at (walk, step) is argmin over the neighbors' avalanche hash
mixed from (walk_id, step, neighbor, seed) — a uniform choice for a
pseudo-random hash, reproducible at ANY parallelism / partitioning, the
same coordination-free trick as textstats' md5-threshold sampling. Each
step is one frontier-sized hash join + one groupby(walk) argmin; paths
accumulate as distributed step tables (union), never on the driver.
Dead-end walkers (no out-edges) drop out of the join and simply stop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def _mix(walk_id: np.ndarray, step: int, neigh: np.ndarray,
         seed: int) -> np.ndarray:
    """splitmix64-style avalanche of the (walk, step, neighbor, seed) key;
    wrapping uint64 arithmetic, order-free and partition-free."""
    x = (walk_id.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
         ^ neigh.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
         ^ np.uint64((step * 0xD6E8FEB86659FD93 + seed) & 0xFFFFFFFFFFFFFFFF))
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def _race_keys(h: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Exponential-race keys: -ln(U)/w with U = hash mapped into (0, 1].
    argmin over neighbors == weighted-proportional choice; identical
    arithmetic in the sequential reference => bit-deterministic."""
    u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0   # (0, 1]
    return -np.log(u) / weights.astype(np.float64)


def random_walks(edges: rd.Dataset, starts: list[int], *,
                 length: int = 10, seed: int = 0,
                 directed: bool = True,
                 weight_col: str | None = None) -> rd.Dataset:
    """Walks of at most ``length`` steps from each start vertex (one walk
    per start; ``walk_id`` = start vertex id). Returns a Dataset
    (walk_id, step, v) with step 0 = the start. Choice rule documented in
    the module docstring. Unweighted walks choose uniformly over the
    DISTINCT out-neighbor set; with ``weight_col`` (e.g. the edge
    ``multiplicity``) the choice is weighted-proportional via a
    deterministic exponential race (Efraimidis-Spirakis): each neighbor
    draws key = -ln(U)/w with U = its avalanche hash as uniform(0,1],
    and the walk takes the argmin key — P(choose i) = w_i/Σw, still
    coordination-free and parallelism-independent. Duplicate (src, dst)
    rows are summed before the race (additive multiplicity — weights
    must be positive and finite, enforced). ``weight_col`` is
    only supported on directed walks (the undirected view has no
    canonical per-direction weight)."""
    from metis_ray.graph.partition import symmetrized
    from metis_ray.graph.stats import distinct_edges
    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks

    if weight_col is not None:
        if not directed:
            raise ValueError("weight_col requires directed=True")
        from ray.data.aggregate import Sum

        def to_w(t: pa.Table, _w=weight_col) -> pa.Table:
            w = t[_w].to_numpy(zero_copy_only=False).astype(np.float64)
            # a zero weight would make the edge silently unreachable
            # (inf/NaN race key) and a negative one would always win —
            # turn silent bias into a loud error
            if t.num_rows and (not np.isfinite(w).all() or (w <= 0).any()):
                raise ValueError(
                    f"weight_col {_w!r} must be positive and finite")
            return pa.table({"src": t["src"], "dst": t["dst"],
                             "w": pa.array(w, pa.float64())})

        # duplicate (src, dst) rows act ADDITIVELY (P ∝ summed weight),
        # mirroring the unweighted path's distinct_edges(); without this
        # groupby a duplicate edge would race as max(w), not sum(w)
        g = (edges.select_columns(["src", "dst", weight_col])
             .map_batches(to_w, batch_format="pyarrow")
             .groupby(["src", "dst"]).aggregate(Sum("w", alias_name="w")))
    else:
        g = edges.select_columns(["src", "dst"])
        # symmetrized() output is already distinct by construction; only
        # the directed view needs the dedup shuffle
        g = symmetrized(g) if not directed else distinct_edges(g)
    g, _ = _nonempty_blocks(g)   # compact: joins raise on zero-row blocks
    parts = _join_parts()

    s = np.asarray(sorted(set(int(v) for v in starts)), dtype=np.int64)
    frontier = rd.from_arrow(pa.table({
        "walk_id": pa.array(s, pa.int64()),
        "src": pa.array(s, pa.int64())}))
    steps = [frontier.map_batches(
        lambda t: pa.table({"walk_id": t["walk_id"], "step":
                            pa.array(np.zeros(t.num_rows, np.int64)),
                            "v": t["src"]}), batch_format="pyarrow")]

    for step in range(1, length + 1):
        if g is None:                  # edgeless graph: walks end at step 0
            break
        fr, n_live = _nonempty_blocks(frontier)
        if fr is None:
            break
        cand = fr.join(g, join_type="inner", num_partitions=parts,
                       on=("src",))
        cand, n_cand = _nonempty_blocks(cand)
        if cand is None:
            break

        def choose(group: pa.Table, _step=step) -> pa.Table:
            w = group["walk_id"].to_numpy(zero_copy_only=False)
            d = group["dst"].to_numpy(zero_copy_only=False)
            h = _mix(w, _step, d, seed)
            if "w" in group.column_names:
                wt = group["w"].to_numpy(zero_copy_only=False)
                k = _race_keys(h, wt)
                i = np.lexsort((d, k))[0]
            else:
                # argmin by (hash, dst): ties (hash collisions) break to
                # the smaller neighbor id, fully deterministic
                i = np.lexsort((d, h))[0]
            return pa.table({"walk_id": pa.array([int(w[i])], pa.int64()),
                             "v": pa.array([int(d[i])], pa.int64())})

        nxt = cand.groupby("walk_id").map_groups(
            choose, batch_format="pyarrow").materialize()
        steps.append(nxt.map_batches(
            lambda t, _step=step: pa.table({
                "walk_id": t["walk_id"],
                "step": pa.array(np.full(t.num_rows, _step, np.int64)),
                "v": t["v"]}), batch_format="pyarrow"))
        frontier = nxt.map_batches(
            lambda t: pa.table({"walk_id": t["walk_id"], "src": t["v"]}),
            batch_format="pyarrow")

    out = steps[0]
    for st in steps[1:]:
        out = out.union(st)
    return out


def walks_reference(adj: dict[int, set[int]], starts: list[int], *,
                    length: int = 10, seed: int = 0,
                    weights: dict[tuple[int, int], float] | None = None,
                    ) -> list[tuple]:
    """Sequential transcription of the EXACT walk recurrence (the pytest
    golden): same mix, same race keys, same tie order. Returns sorted
    (walk_id, step, v) tuples."""
    rows = []
    for s in sorted(set(int(v) for v in starts)):
        cur = s
        rows.append((s, 0, s))
        for step in range(1, length + 1):
            nbrs = sorted(adj.get(cur, ()))
            if not nbrs:
                break
            d = np.asarray(nbrs, dtype=np.int64)
            h = _mix(np.full(len(d), s, np.int64), step, d, seed)
            if weights is not None:
                wt = np.asarray([weights[(cur, int(x))] for x in d])
                i = np.lexsort((d, _race_keys(h, wt)))[0]
            else:
                i = np.lexsort((d, h))[0]
            cur = int(d[i])
            rows.append((s, step, cur))
    return sorted(rows)
