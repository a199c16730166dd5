"""Large synthetic edge tables for throughput benchmarking.

The corpus-derived graph exercises the full pipeline but tops out around
10^5..10^6 edges at test scale — superstep timing there is coordination-bound
and says nothing about 100 TB behavior.  This module generates a
deterministic power-law edge table big enough (10^7..10^8 edges) that
per-shard gather-scatter compute dominates, which is what the
supersteps/sec / edges/sec headline and the N-vs-4N scaling efficiency are
measured on (BASELINE.md targets).

Shape: 80% uniform destinations + 20% Zipf-ish hub destinations (u^3
concentration) — hubs stress the pre-combined scatter path exactly like the
corpus's hub repos do.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BENCH_ROOT = os.environ.get("METIS_RAY_BENCH_DIR", "/tmp/metis_ray_bench")

# sf dir basename -> (n_vertices, n_edges). sf0.1 is sized so per-superstep
# gather-scatter compute (~4ms per 10M edges per core) dominates the fixed
# per-superstep coordination floor (~40ms at P=32) — the regime where the
# N-vs-4N scaling criterion measures the engine, not the constant.
BENCH_SIZES = {
    "sf0.001": (50_000, 1_000_000),
    "sf0.01": (200_000, 5_000_000),
    "sf0.1": (2_000_000, 320_000_000),
}


def bench_size_for_sf(sf_dir: str) -> tuple[int, int]:
    base = os.path.basename(os.path.normpath(sf_dir))
    return BENCH_SIZES.get(base, BENCH_SIZES["sf0.01"])


def synth_edge_dir(n_vertices: int, n_edges: int, *, seed: int = 42,
                   root: str = BENCH_ROOT, chunk: int = 10_000_000) -> str:
    """Write (once) and return a directory holding edges/*.parquet and
    vertices/*.parquet for the synthetic graph. Deterministic in (V, E,
    seed); idempotent by manifest."""
    out = os.path.join(root, f"edges_v{n_vertices}_e{n_edges}_s{seed}_mod256")
    man = os.path.join(out, "manifest.json")
    if os.path.exists(man):
        return out
    tmp = out + ".tmp"
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(os.path.join(tmp, "edges"))
    os.makedirs(os.path.join(tmp, "vertices"))

    # community-modular shape: vertex ids are community-ordered (contiguous
    # blocks of C ids = one community, like files numbered by repo). 75% of
    # edges stay inside their community (range partitioning then keeps them
    # shard-local for any P <= n_communities); the rest split between
    # Zipf-ish global hubs and uniform noise — the cross-shard traffic.
    n_comm = 256
    csize = max(1, n_vertices // n_comm)
    rng = np.random.RandomState(seed)
    for i, lo in enumerate(range(0, n_edges, chunk)):
        n = min(chunk, n_edges - lo)
        src = rng.randint(0, n_vertices, size=n, dtype=np.int64)
        u = rng.random_sample(n)
        kind = rng.random_sample(n)
        local = np.minimum(
            (src // csize) * csize + rng.randint(0, csize, size=n, dtype=np.int64),
            n_vertices - 1)
        hubs = (n_vertices * u ** 3).astype(np.int64)
        uniform = rng.randint(0, n_vertices, size=n, dtype=np.int64)
        dst = np.where(kind < 0.75, local, np.where(kind < 0.90, hubs, uniform))
        keep = src != dst
        pq.write_table(
            pa.table({"src": pa.array(src[keep], pa.int64()),
                      "dst": pa.array(dst[keep], pa.int64())}),
            os.path.join(tmp, "edges", f"part-{i:05d}.parquet"),
            row_group_size=1 << 20)

    vchunk = 5_000_000
    for i, lo in enumerate(range(0, n_vertices, vchunk)):
        n = min(vchunk, n_vertices - lo)
        pq.write_table(
            pa.table({"vertex_id": pa.array(
                np.arange(lo, lo + n, dtype=np.int64), pa.int64())}),
            os.path.join(tmp, "vertices", f"part-{i:05d}.parquet"),
            row_group_size=1 << 20)

    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump({"n_vertices": n_vertices, "n_edges": n_edges,
                   "seed": seed}, fh)
    if os.path.exists(out):
        import shutil
        shutil.rmtree(out)
    os.replace(tmp, out)
    return out


def bench_graph_dir(sf_dir: str, P: int, *, root: str = BENCH_ROOT) -> str:
    """Partitioned graph layout for the bench graph at partition count P
    (built with the same Ray Data shuffle as the corpus graph; cached)."""
    import ray.data as rd

    from metis_ray.graph.partition import build_graph_dir, build_layouts, graph_meta

    V, E = bench_size_for_sf(sf_dir)
    src = synth_edge_dir(V, E)
    gdir = os.path.join(root, f"graph_v{V}_e{E}_P{P}_range")
    if os.path.exists(os.path.join(gdir, "graph_meta.json")):
        m = graph_meta(gdir)
        if not m.get("layout"):    # cached pre-layout dir: migrate in place
            build_layouts(gdir, P, m.get("partition", "hash"),
                          m.get("id_bound", 0))
        return gdir
    edges = rd.read_parquet(os.path.join(src, "edges"))
    verts = rd.read_parquet(os.path.join(src, "vertices"))
    return build_graph_dir(edges, verts, gdir, P, directed=True,
                           partition="range", id_bound=V)
