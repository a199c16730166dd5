"""Betweenness centrality (Brandes 2001), vectorized over a source set.

BC(v) = Σ_{s≠v≠t} σ_st(v)/σ_st — with the source sum restricted to a
deterministic sample of k sources this is the standard unbiased
approximation (Brandes & Pich 2007); sources=ALL gives the exact value.

Formulation: the Dataset-engine shape (graph/dataset_engine.py). All k
sources advance TOGETHER — per-vertex state is an (n × k) matrix
(distance, path-count σ, dependency δ), broadcast per superstep with
``ray.put``; each superstep is one map_batches scan of the edge table
whose per-batch output is pre-combined by vertex (``np.add.reduceat``)
and max/sum-merged on the driver (the HyperBall exchange shape,
graph/hyperball.py):

* forward (level-synchronous BFS): a frontier edge (u,v) with u at level
  t contributes σ[u] to v; vertices first reached now get dist t+1 and
  the summed σ (path counts over a DAG of shortest paths).
* backward (levels T−1 … 0): an edge (u,v) with dist(u)=t, dist(v)=t+1
  contributes σ[u]/σ[v]·(1+δ[v]) to δ[u].
* BC(v) = Σ_sources δ[v] with δ at each source itself excluded.

2·T edge scans total (T = deepest BFS level); k·n floats cross the
driver per round — at 10^12 vertices the matrices shard into the CSR
actors (graph/shard.py) exactly like the PageRank payload; the scan
kernels are unchanged.

σ is tracked in float64: path counts are exact up to 2^53 paths — far
beyond any graph where exact betweenness is meaningful — and match
NetworkX (which keeps exact Python ints) to float tolerance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

_INF = np.iinfo(np.int32).max


def _fold(inc, vid: np.ndarray, k: int):
    """Merge per-batch partial rows (v, payload float64[k]) into
    (positions, combined) via sort + add.reduceat."""
    if not len(inc):
        return None, None
    pos = np.searchsorted(vid, inc["v"].to_numpy())
    mat = np.frombuffer(b"".join(inc["payload"].tolist()),
                        np.float64).reshape(-1, k)
    order = np.argsort(pos, kind="stable")
    pos, mat = pos[order], mat[order]
    bounds = np.flatnonzero(np.r_[True, pos[1:] != pos[:-1]])
    return pos[bounds], np.add.reduceat(mat, bounds, axis=0)


def betweenness_dataset(edges: rd.Dataset, vertices: rd.Dataset, *,
                        sources: list[int] | None = None,
                        directed: bool = True,
                        max_iter: int = 10_000) -> tuple[rd.Dataset, int]:
    """Returns ((v, betweenness) Dataset, supersteps). ``sources=None``
    uses every vertex (exact). For undirected graphs each unordered
    (s,t) pair is counted once (NetworkX ``betweenness_centrality``
    with ``normalized=False`` semantics on either graph kind)."""
    from metis_ray.graph.partition import symmetrized
    from metis_ray.graph.stats import distinct_edges

    verts = vertices.select_columns(["vertex_id"]).to_pandas()
    vid = np.sort(verts["vertex_id"].to_numpy().astype(np.int64))
    n = len(vid)

    g = edges.select_columns(["src", "dst"])
    # symmetrized() output is already distinct by construction; only the
    # directed view needs the dedup shuffle
    g = symmetrized(g) if not directed else distinct_edges(g)
    g = g.materialize()

    if sources is None:
        src_ids = vid
    else:
        src_ids = np.asarray(sorted(set(int(s) for s in sources)), np.int64)
        pos = np.searchsorted(vid, src_ids)
        if len(src_ids) and ((pos >= n).any()
                             or (vid[np.minimum(pos, n - 1)]
                                 != src_ids).any()):
            raise ValueError("source is not a graph vertex")
    k = len(src_ids)
    spos = np.searchsorted(vid, src_ids)

    dist = np.full((n, k), _INF, dtype=np.int32)
    sigma = np.zeros((n, k), dtype=np.float64)
    dist[spos, np.arange(k)] = 0
    sigma[spos, np.arange(k)] = 1.0
    frontier = np.zeros((n, k), dtype=bool)
    frontier[spos, np.arange(k)] = True

    epochs = 0
    levels = 0
    # ---- forward: level-synchronous multi-source BFS with path counts
    for t in range(max_iter):
        if not frontier.any():
            break
        ref = ray.put((vid, frontier, sigma))

        def fwd(batch: pa.Table, _k=k) -> pa.Table:
            empty = pa.table({"v": pa.array([], pa.int64()),
                              "payload": pa.array([], pa.large_binary())})
            if "src" not in batch.column_names or batch.num_rows == 0:
                return empty
            v, f, sg = ray.get(ref)
            si = np.searchsorted(v, batch["src"].to_numpy(
                zero_copy_only=False))
            di = np.searchsorted(v, batch["dst"].to_numpy(
                zero_copy_only=False))
            fm = f[si]                              # (b, k) frontier mask
            live = fm.any(axis=1)
            if not live.any():
                return empty
            si, di, fm = si[live], di[live], fm[live]
            contrib = sg[si] * fm                   # σ flows along edges
            order = np.argsort(di, kind="stable")
            di, contrib = di[order], contrib[order]
            bounds = np.flatnonzero(np.r_[True, di[1:] != di[:-1]])
            comb = np.add.reduceat(contrib, bounds, axis=0)
            return pa.table({
                "v": pa.array(v[di[bounds]], pa.int64()),
                "payload": pa.array([row.tobytes() for row in comb],
                                    pa.large_binary())})

        inc = g.map_batches(fwd, batch_format="pyarrow").to_pandas()
        epochs += 1
        pos, comb = _fold(inc, vid, k)
        frontier = np.zeros((n, k), dtype=bool)
        if pos is None:
            break
        new = (dist[pos] == _INF) & (comb > 0)      # first touch only
        if not new.any():
            break
        d_slice = dist[pos]
        d_slice[new] = t + 1
        dist[pos] = d_slice
        s_slice = sigma[pos]
        s_slice[new] += comb[new]
        sigma[pos] = s_slice
        frontier[pos] = new
        levels = t + 1

    # ---- backward: dependency accumulation, deepest level first
    delta = np.zeros((n, k), dtype=np.float64)
    for t in range(levels - 1, -1, -1):
        ref = ray.put((vid, dist, sigma, delta, t))

        def bwd(batch: pa.Table, _k=k) -> pa.Table:
            empty = pa.table({"v": pa.array([], pa.int64()),
                              "payload": pa.array([], pa.large_binary())})
            if "src" not in batch.column_names or batch.num_rows == 0:
                return empty
            v, d, sg, dl, lvl = ray.get(ref)
            si = np.searchsorted(v, batch["src"].to_numpy(
                zero_copy_only=False))
            di = np.searchsorted(v, batch["dst"].to_numpy(
                zero_copy_only=False))
            m = (d[si] == lvl) & (d[di] == lvl + 1)  # (b, k) DAG edges
            live = m.any(axis=1)
            if not live.any():
                return empty
            si, di, m = si[live], di[live], m[live]
            denom = np.where(m, sg[di], 1.0)
            w = np.where(m, sg[si] / denom * (1.0 + dl[di]), 0.0)
            order = np.argsort(si, kind="stable")
            si, w = si[order], w[order]
            bounds = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
            comb = np.add.reduceat(w, bounds, axis=0)
            return pa.table({
                "v": pa.array(v[si[bounds]], pa.int64()),
                "payload": pa.array([row.tobytes() for row in comb],
                                    pa.large_binary())})

        inc = g.map_batches(bwd, batch_format="pyarrow").to_pandas()
        epochs += 1
        pos, comb = _fold(inc, vid, k)
        if pos is not None:
            delta[pos] += comb

    delta[spos, np.arange(k)] = 0.0                 # w == s excluded
    bc = delta.sum(axis=1)
    if not directed:
        bc = bc / 2.0                               # unordered (s,t) pairs
    out = pa.table({"v": pa.array(vid, pa.int64()),
                    "betweenness": pa.array(bc, pa.float64())})
    return rd.from_arrow(out), epochs
