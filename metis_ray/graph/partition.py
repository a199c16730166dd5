"""Graph partitioning: edge/vertex tables -> per-partition Parquet layout.

The reference partitions output by LOT_ID — one container per lot, all
records of a lot in the same file (``stdf2ph5.py:141``, README.md:29).
Metis-Ray's partition key is ``pid = vertex_id % P`` (vertex ids are uniform
64-bit hashes, so modulo is a uniform hash partition); edges live with their
*source* vertex, which makes every superstep scatter local to the shard.

Layout (a directory per partition => shard actors read only their slice, and
a re-run can skip finished partitions):

    <dir>/vertices/pid=J/*.parquet      (vertex_id)
    <dir>/edges/pid=J/*.parquet         (src, dst [, weight])
    <dir>/graph_meta.json               (P, directed, counts)

Built with Ray Data all the way: the partitioned write IS the shuffle.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd


def pid_of(ids: np.ndarray, P: int, mode: str, bound: int) -> np.ndarray:
    """Partition function. ``hash``: uniform modulo over the 63-bit hash id
    space. ``range``: contiguous id ranges of span ceil(bound/P) — used when
    vertex ids are community-ordered (e.g. files numbered by repo, or a
    clustering pass), so that most edges fall INSIDE their shard and never
    enter the per-superstep exchange. Locality is a property of the id
    assignment; the partitioner just preserves it."""
    if mode == "range":
        span = (bound + P - 1) // P
        return np.minimum(ids // span, P - 1).astype(np.int64)
    return (ids % np.int64(P)).astype(np.int64)


def _with_pid(col: str, P: int, mode: str = "hash", bound: int = 0):
    def add(batch: pa.Table) -> pa.Table:
        arr = pid_of(batch[col].to_numpy(zero_copy_only=False), P, mode, bound)
        return batch.append_column("pid", pa.array(arr, pa.int64()))
    return add


def canonical_edges(edges: rd.Dataset) -> rd.Dataset:
    """Distinct undirected edges as (src < dst) canonical pairs."""

    def canon(batch: pa.Table) -> pa.Table:
        a = batch["src"].to_numpy(zero_copy_only=False)
        b = batch["dst"].to_numpy(zero_copy_only=False)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        t = pa.table({"src": pa.array(lo, pa.int64()),
                      "dst": pa.array(hi, pa.int64())})
        return t.group_by(["src", "dst"]).aggregate([])

    from ray.data.aggregate import Count
    return (edges.map_batches(canon, batch_format="pyarrow")
            .groupby(["src", "dst"]).aggregate(Count(alias_name="_m"))
            .drop_columns(["_m"]))


def symmetrized(edges: rd.Dataset) -> rd.Dataset:
    """Undirected view: distinct canonical {a,b} pairs emitted in BOTH
    orientations (NetworkX ``to_undirected`` semantics — (a->b) and (b->a)
    collapse to one undirected edge). Used by CC / LPA / triangles."""

    canonical = canonical_edges(edges)

    def both(batch: pa.Table) -> pa.Table:
        a = batch["src"].to_numpy(zero_copy_only=False)
        b = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    return canonical.map_batches(both, batch_format="pyarrow")


def build_graph_dir(edges: rd.Dataset, vertices: rd.Dataset, out_dir: str,
                    P: int, *, directed: bool = True,
                    partition: str = "hash", id_bound: int = 0,
                    weight_col: str | None = None) -> str:
    """Write the partitioned graph layout. ``edges`` needs (src, dst) —
    extra columns are dropped; ``vertices`` needs (vertex_id,).

    ``directed=False`` symmetrizes first (CC / label propagation).
    ``partition='range'`` (with ``id_bound`` = max vertex id + 1) range-
    partitions a community-ordered id space — see ``pid_of``.
    ``weight_col`` keeps a per-edge weight (stored as ``w``; for
    ``directed=False`` it is summed over both directions per undirected
    pair, ``symmetrized_weighted``) — weighted PageRank / LPA shards read
    it from the persisted layout.

    Idempotent + atomic: a directory with a complete ``graph_meta.json`` is
    reused as-is; otherwise the layout is built in a ``.tmp`` sibling and
    renamed into place. (Ray's ``write_parquet`` APPENDS part files into an
    existing directory — rebuilding in place would silently duplicate every
    edge and vertex.)"""
    if os.path.exists(os.path.join(out_dir, "graph_meta.json")):
        return out_dir
    import time
    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    phases: dict[str, float] = {}
    t0 = time.perf_counter()
    if weight_col is None:
        e = edges.select_columns(["src", "dst"])
        if not directed:
            e = symmetrized(e)
    else:
        e = edges.select_columns(["src", "dst", weight_col])
        if weight_col != "w":
            e = e.map_batches(
                lambda t, _c=weight_col: t.rename_columns(
                    ["w" if n == _c else n for n in t.column_names]),
                batch_format="pyarrow")
        if not directed:
            e = symmetrized_weighted(e, "w")
    e = e.map_batches(_with_pid("src", P, partition, id_bound),
                      batch_format="pyarrow")
    e.write_parquet(os.path.join(tmp, "edges"), partition_cols=["pid"])
    phases["edges_write"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    v = vertices.select_columns(["vertex_id"]).map_batches(
        _with_pid("vertex_id", P, partition, id_bound), batch_format="pyarrow")
    v.write_parquet(os.path.join(tmp, "vertices"), partition_cols=["pid"])
    # zero-row partitions write NOTHING (not even the directory — measured
    # round 3); on small/skewed graphs some pids are empty, and the shard
    # reader requires every vertices/pid dir. Backfill typed empties.
    for pid in range(P):
        vdir = os.path.join(tmp, "vertices", f"pid={pid}")
        if not os.path.isdir(vdir):
            os.makedirs(vdir)
            pq.write_table(
                pa.schema([("vertex_id", pa.int64())]).empty_table(),
                os.path.join(vdir, "part-empty.parquet"))
    phases["vertices_write"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()

    # Persist the per-shard target-major CSR layout NOW, with one Ray task
    # per partition: shard-actor start becomes a column read instead of a
    # per-actor lexsort over the partition's edges (which cost 17x the
    # superstep compute at 320M edges, and again on every actor restart).
    build_layouts(tmp, P, partition, id_bound,
                  weighted=weight_col is not None)
    phases["layouts"] = round(time.perf_counter() - t0, 3)

    with open(os.path.join(tmp, "graph_meta.json"), "w") as fh:
        json.dump({"P": P, "directed": directed, "partition": partition,
                   "id_bound": id_bound, "layout": 1,
                   "weighted": weight_col is not None,
                   "build_seconds": phases}, fh)
    if os.path.exists(out_dir):
        import shutil
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return out_dir


def build_layouts(graph_dir: str, P: int, partition: str, id_bound: int,
                  *, num_cpus: float | None = None,
                  weighted: bool = False) -> None:
    """Compute + persist every partition's CSR layout in parallel (skipping
    partitions that already have a current one — idempotent, so pre-layout
    graph dirs can be migrated in place). The presence check reads only the
    npz header fields (version/P), not the arrays; a completed migration is
    stamped into ``graph_meta.json`` so later callers skip this entirely.

    Each task is a 10M+-row parquet decode + lexsort — memory-bandwidth
    bound, not CPU bound. Running one per core thrashes the host: measured
    at 320M edges / 32 cores, 32-way concurrency took 158 s (per-task times
    10x their serial cost) vs 60 s at 8-way with near-serial per-task times.
    Default ``num_cpus`` therefore reserves ~1/8 of a node's cores per task
    (≈8 concurrent per node — the measured bandwidth saturation point);
    pass an explicit value to override."""
    import ray

    from metis_ray.graph import shard as _shard

    if num_cpus is None:
        try:
            nodes = [n for n in ray.nodes() if n.get("Alive")]
            per_node = max(n.get("Resources", {}).get("CPU", 1.0)
                           for n in nodes) if nodes else 1.0
        except Exception:
            per_node = 1.0
        num_cpus = max(1.0, per_node / 8.0)

    @ray.remote(num_cpus=num_cpus)
    def _one(pid: int) -> int:
        if not _shard.layout_current(graph_dir, pid, P, weighted=weighted):
            _shard.build_layout(graph_dir, pid, P, partition, id_bound,
                                weighted=weighted, use_threads=False)
        return pid

    ray.get([_one.remote(pid) for pid in range(P)])
    meta_path = os.path.join(graph_dir, "graph_meta.json")
    if os.path.exists(meta_path):       # in-place migration: stamp the meta
        m = graph_meta(graph_dir)
        if not m.get("layout"):
            m["layout"] = 1
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(m, fh)
            os.replace(tmp, meta_path)


def graph_meta(graph_dir: str) -> dict:
    with open(os.path.join(graph_dir, "graph_meta.json")) as fh:
        return json.load(fh)


def symmetrized_weighted(edges: rd.Dataset, weight_col: str) -> rd.Dataset:
    """Undirected weighted view: canonical {a,b} pairs with ``weight_col``
    summed over BOTH directions (parallel edges collapse additively),
    emitted in both orientations. The weighted twin of ``symmetrized``."""
    from ray.data.aggregate import Sum

    def canon(batch: pa.Table) -> pa.Table:
        a = batch["src"].to_numpy(zero_copy_only=False)
        b = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch[weight_col].to_numpy(zero_copy_only=False)
        t = pa.table({"src": pa.array(np.minimum(a, b), pa.int64()),
                      "dst": pa.array(np.maximum(a, b), pa.int64()),
                      "w": pa.array(w.astype(np.float64), pa.float64())})
        g = t.group_by(["src", "dst"]).aggregate([("w", "sum")])
        return g.select(["src", "dst", "w_sum"]).rename_columns(
            ["src", "dst", "w"])

    canonical = (edges.map_batches(canon, batch_format="pyarrow")
                 .groupby(["src", "dst"]).aggregate(Sum("w", alias_name="w")))

    def both(batch: pa.Table) -> pa.Table:
        if "src" not in batch.column_names or batch.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64()),
                             "w": pa.array([], pa.float64())})
        a = batch["src"].to_numpy(zero_copy_only=False)
        b = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            "w": pa.array(np.concatenate([w, w]), pa.float64()),
        })

    return canonical.map_batches(both, batch_format="pyarrow")
