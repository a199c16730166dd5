"""CSR partition shard: the engine's one genuinely stateful component.

The reference's streaming source/sink hold cross-call state — byteorder, lot,
read offset, append position (``metis_source.py:47-52``,
``metis_sink.py:56-65``).  Metis-Ray's analogue is a CSR shard: the
per-partition compressed adjacency (indptr/indices numpy arrays), the current
value vector (rank / label), and the epoch number, loaded once and reused
every superstep.  It runs as a raw ``@ray.remote`` actor rather than a
``map_batches`` actor pool because Ray Data's pool gives no partition->actor
affinity — a shard must always see *its* partition, which is exactly the
"shared mutable index" case where dropping below the Dataset API is
warranted.  Everything around the shards (build, shuffle, outputs) stays in
Dataset land.

Scatter payloads are pre-combined per destination partition before leaving
the shard (dense ``bincount`` for sums, sort+``reduceat`` for mins, count
triples for label frequencies).  This per-shard combining is the skew
mitigation: a hot destination vertex receives at most P partial values per
superstep — the salted-key pattern with P implicit salts — so a 10^8-degree
hub costs the same as any other vertex at apply time (SURVEY.md section 4.2).

The plain class is directly unit-testable; ``CSRShardActor = ray.remote(CSRShard)``.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

_IDMAX = np.int64(np.iinfo(np.int64).max)


def _groupmin(pos: np.ndarray, vals: np.ndarray, out: np.ndarray) -> None:
    """out[p] = min(out[p], min(vals where pos==p)) — vectorized via sort +
    reduceat (np.minimum.at is orders of magnitude slower)."""
    if len(pos) == 0:
        return
    order = np.argsort(pos, kind="stable")
    p = pos[order]
    v = vals[order]
    starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
    mins = np.minimum.reduceat(v, starts)
    upos = p[starts]
    out[upos] = np.minimum(out[upos], mins)


class CSRShard:
    """One graph partition: owned vertices + CSR over their out-edges."""

    def __init__(self, pid: int, P: int, graph_dir: str) -> None:
        self.pid = pid
        self.P = P
        self.graph_dir = graph_dir
        t0 = time.perf_counter()

        vdir = os.path.join(graph_dir, "vertices", f"pid={pid}")
        self.verts = np.sort(
            pq.read_table(vdir, columns=["vertex_id"])["vertex_id"]
            .to_numpy(zero_copy_only=False).astype(np.int64))
        self.n = len(self.verts)

        edir = os.path.join(graph_dir, "edges", f"pid={pid}")
        if os.path.isdir(edir):
            et = pq.read_table(edir, columns=["src", "dst"])
            src = et["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = et["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:  # partition with vertices but no out-edges
            src = np.empty(0, np.int64)
            dst = np.empty(0, np.int64)
        order = np.argsort(src, kind="stable")
        src = src[order]
        self.dst = dst[order]
        row = np.searchsorted(self.verts, src)
        counts = np.bincount(row, minlength=self.n) if len(row) else np.zeros(self.n, np.int64)
        self.indptr = np.zeros(self.n + 1, dtype=np.int64)
        np.cumsum(counts, out=self.indptr[1:])
        self.outdeg = counts.astype(np.float64)
        self.m = len(self.dst)

        self.dst_owner = (self.dst % np.int64(P)).astype(np.int32)
        # per-target edge index lists, precomputed once (used every superstep)
        self._tgt_edges = [np.flatnonzero(self.dst_owner == t) for t in range(P)]
        self.dst_pos = np.zeros(self.m, dtype=np.int64)   # filled by exchange
        self.peer_counts: list[int] = [0] * P

        self.x: np.ndarray | None = None       # float64 (pagerank)
        self.labels: np.ndarray | None = None  # uint64 (cc / lpa)
        self.epoch = 0
        self.load_seconds = time.perf_counter() - t0

    # ---- one-time dst-position exchange ---------------------------------

    def meta(self) -> dict:
        return {"pid": self.pid, "n": self.n, "m": self.m,
                "load_seconds": self.load_seconds}

    def queries_for(self, t: int) -> np.ndarray:
        """Unique raw dst ids this shard sends to partition t."""
        return np.unique(self.dst[self._tgt_edges[t]])

    def answer_positions(self, dsts: np.ndarray) -> np.ndarray:
        """Positions of the queried vertex ids within this shard's verts.
        Every edge destination must be a known vertex (resolution guarantees
        it); a miss here is a build bug, not data noise."""
        pos = np.searchsorted(self.verts, dsts)
        pos = np.clip(pos, 0, max(0, self.n - 1))
        if len(dsts) and not (self.verts[pos] == dsts).all():
            missing = int((self.verts[pos] != dsts).sum())
            raise ValueError(
                f"shard {self.pid}: {missing} edge destinations not in vertex set")
        return pos

    def install_positions(self, t: int, uniq: np.ndarray, pos: np.ndarray,
                          peer_n: int) -> None:
        idx = self._tgt_edges[t]
        lookup = np.searchsorted(uniq, self.dst[idx])
        self.dst_pos[idx] = pos[lookup]
        self.peer_counts[t] = peer_n

    # ---- PageRank -------------------------------------------------------

    def pagerank_init(self, n_total: int) -> None:
        self.x = np.full(self.n, 1.0 / n_total, dtype=np.float64)
        self.epoch = 0

    def pagerank_scatter(self) -> dict[int, np.ndarray]:
        """Per-target dense partial sums of rank mass.

        Dense exchange: each payload is a float64 vector of the target's
        vertex count — at most P*|V| floats per superstep in total.  For very
        large V/P ratios a sparse (positions, values) payload would win; the
        dense form keeps apply a pure vector add.  The returned dict lives in
        the object store; the driver routes only the ObjectRef, never the
        data."""
        assert self.x is not None
        safe = np.where(self.outdeg > 0, self.outdeg, 1.0)
        per_vert = self.x / safe
        per_edge = np.repeat(per_vert, np.diff(self.indptr))
        out: dict[int, np.ndarray] = {}
        for t in range(self.P):
            idx = self._tgt_edges[t]
            if len(idx) == 0:
                continue
            out[t] = np.bincount(self.dst_pos[idx], weights=per_edge[idx],
                                 minlength=self.peer_counts[t])
        return out

    def dangling_mass(self) -> float:
        """Local rank mass on dangling (out-degree 0) vertices — summed
        globally by the driver each superstep (a float per shard, not data)."""
        assert self.x is not None
        return float(self.x[self.outdeg == 0].sum())

    def pagerank_apply(self, payload_refs: list, dangle_sum: float,
                       alpha: float, n_total: int) -> float:
        """x_new = alpha*(incoming + danglesum/N) + (1-alpha)/N — the exact
        NetworkX power-iteration formulation (uniform personalization /
        dangling weights). Returns local L1 delta."""
        incoming = np.zeros(self.n, dtype=np.float64)
        for ref in payload_refs:
            part = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            vec = part.get(self.pid)
            if vec is not None:
                incoming[: len(vec)] += vec
        base = (alpha * dangle_sum + (1.0 - alpha)) / n_total
        x_new = alpha * incoming + base
        delta = float(np.abs(x_new - self.x).sum())
        self.x = x_new
        self.epoch += 1
        return delta

    # ---- min-label propagation (connected components) -------------------

    def labels_init(self) -> None:
        self.labels = self.verts.copy()
        self.epoch = 0

    def minlabel_scatter(self) -> dict[int, np.ndarray]:
        """Per-target min-combined labels (dense vector, identity = U64MAX)."""
        assert self.labels is not None
        per_edge = np.repeat(self.labels, np.diff(self.indptr))
        out: dict[int, np.ndarray] = {}
        for t in range(self.P):
            idx = self._tgt_edges[t]
            if len(idx) == 0:
                continue
            acc = np.full(self.peer_counts[t], _IDMAX, dtype=np.int64)
            _groupmin(self.dst_pos[idx], per_edge[idx], acc)
            out[t] = acc
        return out

    def minlabel_apply(self, payload_refs: list) -> int:
        """labels = min(labels, incoming); returns #changed."""
        assert self.labels is not None
        acc = np.full(self.n, _IDMAX, dtype=np.int64)
        for ref in payload_refs:
            part = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            vec = part.get(self.pid)
            if vec is not None:
                np.minimum(acc[: len(vec)], vec, out=acc[: len(vec)])
        new = np.minimum(self.labels, acc)
        changed = int((new != self.labels).sum())
        self.labels = new
        self.epoch += 1
        return changed

    # ---- frequency label propagation (community detection) --------------

    def lpa_scatter(self) -> dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Per-target (pos, label, count) triples — counts pre-combined per
        shard so a hub vertex receives at most P partial count rows per
        distinct label."""
        assert self.labels is not None
        per_edge = np.repeat(self.labels, np.diff(self.indptr))
        out = {}
        for t in range(self.P):
            idx = self._tgt_edges[t]
            if len(idx) == 0:
                continue
            pos = self.dst_pos[idx]
            lab = per_edge[idx]
            key = np.stack([pos.astype(np.int64), lab], axis=1)
            uniq, cnt = np.unique(key, axis=0, return_counts=True)
            out[t] = (uniq[:, 0].astype(np.int64), uniq[:, 1], cnt.astype(np.int64))
        return out

    def lpa_apply(self, payload_refs: list) -> int:
        """label(v) = argmax_count over neighbor labels, tie -> smallest
        label; vertices with no incoming keep their label. Deterministic
        synchronous LPA (see graph/runner.py docstring for the exact
        semantics the oracle mirrors)."""
        assert self.labels is not None
        poss, labs, cnts = [], [], []
        for ref in payload_refs:
            part = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            tr = part.get(self.pid)
            if tr is not None:
                poss.append(tr[0]); labs.append(tr[1]); cnts.append(tr[2])
        if not poss:
            self.epoch += 1
            return 0
        pos = np.concatenate(poss)
        lab = np.concatenate(labs)
        cnt = np.concatenate(cnts)
        # combine partial counts for identical (pos, label)
        order = np.lexsort((lab, pos))
        pos, lab, cnt = pos[order], lab[order], cnt[order]
        newgrp = np.r_[True, (pos[1:] != pos[:-1]) | (lab[1:] != lab[:-1])]
        starts = np.flatnonzero(newgrp)
        gpos = pos[starts]
        glab = lab[starts]
        gcnt = np.add.reduceat(cnt, starts)
        # pick per pos: max count, tie -> min label. Sort by (pos, -cnt, lab)
        order2 = np.lexsort((glab, -gcnt, gpos))
        gpos, glab = gpos[order2], glab[order2]
        first = np.flatnonzero(np.r_[True, gpos[1:] != gpos[:-1]])
        upd_pos = gpos[first]
        upd_lab = glab[first]
        new = self.labels.copy()
        new[upd_pos] = upd_lab
        changed = int((new != self.labels).sum())
        self.labels = new
        self.epoch += 1
        return changed

    # ---- state I/O (checkpoint / results) -------------------------------

    def state_table(self, value_name: str) -> pa.Table:
        vals = self.x if value_name == "rank" else self.labels
        col = pa.array(vals, pa.float64() if value_name == "rank" else pa.int64())
        return pa.table({"v": pa.array(self.verts, pa.int64()), value_name: col})

    def save_checkpoint(self, ckpt_dir: str, epoch: int, value_name: str) -> dict:
        t0 = time.perf_counter()
        d = os.path.join(ckpt_dir, f"epoch={epoch}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"part-{self.pid:05d}.parquet")
        tmp = path + ".tmp"
        tbl = self.state_table(value_name)
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return {"pid": self.pid, "epoch": epoch, "rows": tbl.num_rows,
                "bytes": os.path.getsize(path), "edges": self.m,
                "seconds": time.perf_counter() - t0}

    def load_checkpoint(self, ckpt_dir: str, epoch: int, value_name: str) -> None:
        path = os.path.join(ckpt_dir, f"epoch={epoch}", f"part-{self.pid:05d}.parquet")
        t = pq.read_table(path)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v)
        assert (v[order] == self.verts).all(), "checkpoint/partition mismatch"
        vals = t[value_name].to_numpy(zero_copy_only=False)[order]
        if value_name == "rank":
            self.x = vals.astype(np.float64)
        else:
            self.labels = vals.astype(np.int64)
        self.epoch = epoch


CSRShardActor = ray.remote(CSRShard)
