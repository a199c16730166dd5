"""HyperBall: neighborhood function / effective diameter / harmonic
centrality via per-vertex HyperLogLog counters (Boldi & Vigna, "In-Core
Computation of Geometric Centralities with HyperBall", 2013).

Each vertex carries a 2^p-register HLL sketch of its out-ball
B(v,t) = {u : dist(v,u) <= t}; one superstep merges every vertex's
counter with its out-neighbors' counters (B(v,t) = {v} ∪ ⋃ B(w,t−1)),
so after t rounds the counter estimates |B(v,t)|. From the per-round
estimates follow:

* the neighborhood function  NF(t) = Σ_v |B(v,t)|,
* the effective diameter (smallest t with NF(t) >= q·NF(∞), interpolated),
* harmonic (out-)centrality  H(v) = Σ_t (|B(v,t)|−|B(v,t−1)|)/t
  — equal to Σ_{u≠v} 1/dist(v,u), NetworkX's ``harmonic_centrality`` on
  the REVERSED graph.

Formulation: the Dataset-engine shape (graph/dataset_engine.py) — the
(n × 2^p) uint8 register matrix lives on the driver and is broadcast by
``ray.put`` each superstep; the scatter over the edge table gathers
neighbor registers, pre-combines per source inside each batch
(``np.maximum.reduceat``), and the driver max-merges the per-batch
partials (sort + reduceat — no shuffle; partial rows are bounded by
blocks × vertices-per-block). Registers only grow, so the fixpoint (no register
changed) is exact reachability closure. At 10^12 vertices the register
matrix itself must shard — that variant belongs in the CSR shard actors
(graph/shard.py) with registers as the per-shard payload; same exchange,
same kernels (documented, not built: the Dataset engine is the
reference formulation, like bfs_distance_dataset).

Estimates are APPROXIMATE (rse ≈ 1.04/√2^p): like the HLL aggregate
(functions/sketch.py) this is recall/accuracy-tested in pytest, not
SQL-twinned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _avalanche(x: np.ndarray) -> np.ndarray:
    h = x.astype(np.uint64)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def _init_registers(vid: np.ndarray, p: int) -> np.ndarray:
    """(n, 2^p) uint8: each vertex's counter seeded with its own id."""
    m = 1 << p
    h = _avalanche(vid)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    lz = np.zeros(len(rest), dtype=np.uint8)
    cur = rest.copy()
    for s in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - s))
        lz[mask] += s
        cur[mask] = cur[mask] << np.uint64(s)
    regs = np.zeros((len(vid), m), dtype=np.uint8)
    regs[np.arange(len(vid)), idx] = lz + 1
    return regs


_POW2 = 2.0 ** -np.arange(256, dtype=np.float64)


def _estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Vectorized HLL estimate per row of an (n, m) register matrix."""
    m = regs.shape[1]
    s = _POW2[regs].sum(axis=1)
    est = _alpha(m) * m * m / s
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.maximum(zeros, 1))
    return np.where(small, lin, est)


def hyperball(edges: rd.Dataset, vertices: rd.Dataset, *, p: int = 9,
              max_t: int = 64, q: float = 0.9) -> dict:
    """Run HyperBall over the directed edge table to the reachability
    fixpoint (or ``max_t``). Returns::

        {"nf":          pa.Table (t, nf)           # t=0 .. fixpoint
         "centrality":  pa.Table (v, ball, harmonic)
         "effective_diameter": float,              # interpolated at q
         "epochs": int}
    """
    verts = vertices.select_columns(["vertex_id"]).to_pandas()
    vid = np.sort(verts["vertex_id"].to_numpy().astype(np.int64))
    n = len(vid)
    m = 1 << p
    regs = _init_registers(vid, p)
    est = _estimate_rows(regs)
    harmonic = np.zeros(n, dtype=np.float64)
    nf = [float(est.sum())]

    g = edges.select_columns(["src", "dst"]).materialize()
    epochs = 0
    for t in range(1, max_t + 1):
        ref = ray.put((vid, regs))

        def scatter(batch: pa.Table, _m=m) -> pa.Table:
            empty = pa.table({"v": pa.array([], pa.int64()),
                              "reg": pa.array([], pa.large_binary())})
            if "src" not in batch.column_names or batch.num_rows == 0:
                return empty
            v, r = ray.get(ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            si = np.searchsorted(v, src)
            di = np.searchsorted(v, dst)
            order = np.argsort(si, kind="stable")
            si, di = si[order], di[order]
            rows = r[di]                      # (b, m) gathered neighbors
            bounds = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
            combined = np.maximum.reduceat(rows, bounds, axis=0)
            out_v = v[si[bounds]]
            return pa.table({
                "v": pa.array(out_v, pa.int64()),
                "reg": pa.array([row.tobytes() for row in combined],
                                pa.large_binary())})

        # per-batch pre-combined partials merge on the driver (the register
        # matrix is driver-resident in this formulation anyway): sort by
        # vertex, max-reduceat segments, one fancy-indexed max — no
        # groupby shuffle, rows bounded by blocks × vertices-per-block
        inc = g.map_batches(scatter, batch_format="pyarrow").to_pandas()
        new = regs
        if len(inc):
            pos = np.searchsorted(vid, inc["v"].to_numpy())
            gathered = np.frombuffer(
                b"".join(inc["reg"].tolist()), np.uint8).reshape(-1, m)
            order = np.argsort(pos, kind="stable")
            pos, gathered = pos[order], gathered[order]
            bounds = np.flatnonzero(np.r_[True, pos[1:] != pos[:-1]])
            combined = np.maximum.reduceat(gathered, bounds, axis=0)
            upos = pos[bounds]
            new = regs.copy()
            new[upos] = np.maximum(new[upos], combined)
        epochs = t
        if np.array_equal(new, regs):
            break
        regs = new
        prev, est = est, _estimate_rows(regs)
        # registers only grow => estimates are monotone up to the
        # linear-counting/raw switch; clamp the per-round gain at 0
        harmonic += np.maximum(est - prev, 0.0) / t
        nf.append(float(est.sum()))

    nf_inf = nf[-1]
    target = q * nf_inf
    d_eff = 0.0
    for t in range(len(nf)):
        if nf[t] >= target:
            if t == 0:
                d_eff = 0.0
            else:
                gain = nf[t] - nf[t - 1]
                d_eff = t - 1 + ((target - nf[t - 1]) / gain
                                 if gain > 0 else 1.0)
            break
    else:
        d_eff = float(len(nf) - 1)

    return {
        "nf": pa.table({"t": pa.array(range(len(nf)), pa.int64()),
                        "nf": pa.array(nf, pa.float64())}),
        "centrality": pa.table({
            "v": pa.array(vid, pa.int64()),
            "ball": pa.array(est, pa.float64()),
            "harmonic": pa.array(harmonic, pa.float64())}),
        "effective_diameter": float(d_eff),
        "epochs": epochs,
    }
