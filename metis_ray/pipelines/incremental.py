"""Incremental / arriving-input ingestion (reference S2/S3 analogue).

The reference tail-follows growing STDF files via inotify and lands each one
idempotently ("already imported => nothing to do",
``Metis/tools/HDF5Helper.py:53-69``; daemon spawn per new file,
``Metis/sinotify.py:82-87``).  Ray Data has no tail-follow; the equivalent
unit of arrival for a Parquet corpus is the FRAGMENT (part file).  Each call
to ``ingest_increment``:

1. lists fragments under ``<corpus_dir>/corpus``,
2. diffs against the state manifest (processed fragment name + size),
3. runs extract->resolve->dedup over ONLY the new fragments,
4. writes their edges to ``<state_dir>/edges/batch=<n>/`` atomically,
5. commits the manifest (write-temp + rename).

Re-running with nothing new is a no-op.  A crash between 4 and 5 leaves a
dangling batch dir that is ignored (not in the manifest) and overwritten on
retry — the same exactly-once landing contract as the reference.

The symbol table is global (imports may target any file ever seen), so it is
rebuilt each increment from the explicit list of landed + ready fragments —
a (repo, path)-only pass, cheap next to content scanning.  Statements that
do not resolve yet are landed as a carry-forward retry queue and re-resolved
against the refreshed symbol table every increment (retro-resolution), so
OUT-OF-ORDER arrival — an importer landing before its target — converges to
the batch-build edge set.  Edge dedup is per-increment; readers that need
global dedup apply the standard groupby over the union.
"""

from __future__ import annotations

import json
import os
import shutil

import ray
import ray.data as rd

from metis_ray.pipelines.linkgraph import dedup_edges, raw_resolved
from metis_ray.sources.parquet import read_corpus
from metis_ray.stages.resolve import build_symbol_table


def _manifest_path(state_dir: str) -> str:
    return os.path.join(state_dir, "ingested.json")


def _unresolved_so_far(state_dir: str, man: dict):
    """The still-unresolved statements (src, lang, module) carried by the
    LAST committed batch (each batch's unresolved dir is the full carry-
    forward state, not a delta). None when empty/absent (states written by
    a pre-retro-resolution version have no unresolved dirs — treated as
    empty, backward compatible)."""
    if not man["batches"]:
        return None
    last = man["batches"][-1]["batch"]
    d = os.path.join(state_dir, "unresolved", f"batch={last}")
    if not os.path.isdir(d):
        return None
    paths = [os.path.join(d, f) for f in sorted(os.listdir(d))
             if f.endswith(".parquet")]
    if not paths:
        return None
    ds = rd.read_parquet(paths)
    if ds.count() == 0:
        return None
    return ds


def _load_manifest(state_dir: str) -> dict:
    p = _manifest_path(state_dir)
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return {"fragments": {}, "batches": []}


def ingest_increment(corpus_dir: str, state_dir: str, *,
                     concurrency=None, pending_sizes: dict | None = None,
                     resolve_strategy: str = "broadcast") -> dict:
    """Process fragments not yet in the manifest. Returns an info dict
    {new_fragments, new_edges, batch_dir|None}.

    ``pending_sizes`` (used by ``watch``): a dict carried across polls; a
    new fragment is landed only once its size is UNCHANGED since the
    previous poll, so a file still being copied into the corpus dir is
    deferred instead of being read truncated (and then tripping the
    immutability check when it finishes growing). One-shot callers omit it —
    they own the arrival contract (fragments must be renamed into place)."""
    os.makedirs(state_dir, exist_ok=True)
    man = _load_manifest(state_dir)
    frag_dir = os.path.join(corpus_dir, "corpus")
    if not os.path.isdir(frag_dir):
        frag_dir = corpus_dir
    frags = {f: os.path.getsize(os.path.join(frag_dir, f))
             for f in sorted(os.listdir(frag_dir)) if f.endswith(".parquet")}
    # fragments are IMMUTABLE units of arrival: a size change means the old
    # batch's edges are already landed and cannot be retracted, so silently
    # reprocessing would double-count — fail loudly instead (the reference
    # likewise treats a re-imported name as "already there, skip", never as
    # "merge two versions": HDF5Helper.py:53-69)
    changed = [f for f, size in frags.items()
               if f in man["fragments"] and man["fragments"][f] != size]
    if changed:
        raise ValueError(
            f"fragments changed size after ingestion (immutable contract): "
            f"{changed[:5]}{'...' if len(changed) > 5 else ''}")
    new = [f for f in frags if f not in man["fragments"]]
    if pending_sizes is not None:
        def complete(f: str) -> bool:
            # a valid parquet file ends with the PAR1 magic — a fragment
            # mid-copy (size momentarily stable because the producer paused)
            # cannot pass this
            p = os.path.join(frag_dir, f)
            try:
                with open(p, "rb") as fh:
                    fh.seek(-4, os.SEEK_END)
                    return fh.read(4) == b"PAR1"
            except OSError:
                return False

        ready = [f for f in new
                 if pending_sizes.get(f) == frags[f] and complete(f)]
        for f in new:
            pending_sizes[f] = frags[f]    # candidate for the NEXT poll
        new = ready
    if not new:
        return {"new_fragments": 0, "new_edges": 0, "batch_dir": None}

    # the symbol table is global (imports may target any file ever seen):
    # rebuilt each increment from the EXPLICIT list of landed + ready
    # fragments — never by listing the whole dir, which would read a
    # fragment still being copied in and crash on the truncation
    # (ADVICE r3 medium). strategy='join' keeps it a Dataset end-to-end
    # (resolution + repo re-attach joins) — the driver-clean path for
    # symbol tables beyond one node, same switch as linkgraph.ingest().
    known_paths = [os.path.join(frag_dir, f)
                   for f in list(man["fragments"]) + new]
    known_ds = rd.read_parquet(known_paths, columns=["repo", "path"])
    if resolve_strategy == "join":
        from metis_ray.stages.resolve import (build_symbol_dataset,
                                              check_id_collisions_ds)
        symbols = build_symbol_dataset(known_ds).materialize()
        check_id_collisions_ds(symbols)
    else:
        symbols = ray.put(build_symbol_table(known_ds))
    new_ds = rd.read_parquet([os.path.join(frag_dir, f) for f in new])
    resolved = raw_resolved(new_ds, symbols, concurrency=concurrency,
                            strategy=resolve_strategy, keep_stmt=True)

    # retro-resolution: statements landed UNRESOLVED by earlier increments
    # are retried against the refreshed symbol table, so out-of-order
    # arrival (importer before target) converges to the batch-build edge
    # set. Newly-resolved retro statements join this batch's edges; the
    # rest carry forward in the unresolved state (landed below).
    prev_unres = _unresolved_so_far(state_dir, man)
    if prev_unres is not None:
        if resolve_strategy == "join":
            from metis_ray.stages.resolve import resolve_edges_join
            retro = resolve_edges_join(prev_unres, symbols, keep_stmt=True)
        else:
            from metis_ray.stages.resolve import ResolveEdges
            retro = prev_unres.map_batches(
                ResolveEdges(symbols, True), batch_format="pyarrow")
        resolved = resolved.union(retro)

    resolved = resolved.materialize()    # consumed by dedup AND unresolved
    edges = dedup_edges(resolved, symbols)

    batch_id = len(man["batches"])
    batch_dir = os.path.join(state_dir, "edges", f"batch={batch_id}")
    tmp = batch_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(batch_dir):           # crash-leftover: overwrite
        shutil.rmtree(batch_dir)
    edges.write_parquet(tmp)
    if not os.path.isdir(tmp):
        # a batch with no resolvable imports produces a zero-row dataset and
        # write_parquet then writes NOTHING (no dir) — land an explicit
        # empty table so the batch dir always exists with the edge schema
        # (edges_so_far unions every batch dir)
        import pyarrow as pa
        import pyarrow.parquet as pq
        os.makedirs(tmp)
        pq.write_table(pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()),
             ("src_repo", pa.string()), ("dst_repo", pa.string()),
             ("multiplicity", pa.int64())]).empty_table(),
            os.path.join(tmp, "part-00000.parquet"))
    n_edges = rd.read_parquet(tmp).count()
    os.replace(tmp, batch_dir)

    # land the batch's VERTEX set too (every non-quarantined file, including
    # zero-degree ones): edges alone under-count isolated vertices, which
    # shifts PageRank's (1-alpha)/N base and drops singleton components in
    # a graph built from this state (see build_incremental_graph)
    from metis_ray.pipelines.linkgraph import files_table, graph_vertices
    vdir = os.path.join(state_dir, "vertices", f"batch={batch_id}")
    vtmp = vdir + ".tmp"
    for p in (vtmp, vdir):
        if os.path.exists(p):
            shutil.rmtree(p)
    graph_vertices(files_table(new_ds)).write_parquet(vtmp)
    if not os.path.isdir(vtmp):            # all-quarantined batch
        import pyarrow as pa
        import pyarrow.parquet as pq
        os.makedirs(vtmp)
        pq.write_table(
            pa.schema([("vertex_id", pa.int64())]).empty_table(),
            os.path.join(vtmp, "part-00000.parquet"))
    os.replace(vtmp, vdir)

    # land the carry-forward UNRESOLVED statement set (this batch's new
    # unresolved + previous batches' retro rows that still missed) — the
    # retry queue for the next increment. Same .tmp+rename landing as edges
    # (a dangling dir not in the manifest is overwritten on retry).
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    udir = os.path.join(state_dir, "unresolved", f"batch={batch_id}")
    utmp = udir + ".tmp"
    for p in (utmp, udir):
        if os.path.exists(p):
            shutil.rmtree(p)
    (resolved.map_batches(
        lambda t: t.filter(pc.invert(t["resolved"]))
                   .select(["src", "lang", "module"]),
        batch_format="pyarrow").write_parquet(utmp))
    if not os.path.isdir(utmp):            # nothing unresolved
        os.makedirs(utmp)
        pq.write_table(pa.schema(
            [("src", pa.int64()), ("lang", pa.string()),
             ("module", pa.string())]).empty_table(),
            os.path.join(utmp, "part-00000.parquet"))
    os.replace(utmp, udir)

    for f in new:
        man["fragments"][f] = frags[f]
    man["batches"].append({"batch": batch_id, "fragments": new,
                           "edges": n_edges})
    mp = _manifest_path(state_dir)
    with open(mp + ".tmp", "w") as fh:
        json.dump(man, fh)
    os.replace(mp + ".tmp", mp)
    return {"new_fragments": len(new), "new_edges": n_edges,
            "batch_dir": batch_dir}


def watch(corpus_dir: str, state_dir: str, *, interval: float = 1.0,
          max_loops: int | None = None, stop_file: str | None = None,
          concurrency=None, on_batch=None,
          resolve_strategy: str = "broadcast") -> dict:
    """Arriving-input watcher (reference S2/S3: ``sinotify._main`` polls an
    ingest dir and spawns a pipeline per new file, with an ``exit.exit``
    sentinel to stop the daemon — ``/root/reference/Metis/sinotify.py:53-87``).

    Polls ``corpus_dir`` every ``interval`` seconds and lands each new batch
    of fragments through ``ingest_increment`` (idempotent, exactly-once).
    Stops when ``stop_file`` appears (sentinel; removed on exit) or after
    ``max_loops`` polls. ``on_batch(info)`` fires after each non-empty batch
    (the reference's update_progress hook). Returns totals."""
    import time

    if stop_file is None:
        stop_file = os.path.join(state_dir, "exit.exit")
    totals = {"loops": 0, "batches": 0, "fragments": 0, "edges": 0}
    # size-stability gate: land a fragment only after two consecutive polls
    # see it at the same size, so non-atomic producers (plain cp into the
    # corpus dir) don't get read truncated mid-copy
    pending: dict = {}
    while True:
        if os.path.exists(stop_file):
            os.remove(stop_file)
            break
        info = ingest_increment(corpus_dir, state_dir, concurrency=concurrency,
                                pending_sizes=pending,
                                resolve_strategy=resolve_strategy)
        totals["loops"] += 1
        if info["new_fragments"]:
            totals["batches"] += 1
            totals["fragments"] += info["new_fragments"]
            totals["edges"] += info["new_edges"]
            if on_batch is not None:
                on_batch(info)
        if max_loops is not None and totals["loops"] >= max_loops:
            break
        time.sleep(interval)
    return totals


def edges_so_far(state_dir: str) -> rd.Dataset:
    """Union of all committed edge batches (globally deduped)."""
    from ray.data.aggregate import Sum
    man = _load_manifest(state_dir)
    dirs = [os.path.join(state_dir, "edges", f"batch={b['batch']}")
            for b in man["batches"]]
    # pyarrow accepts ONE directory or a list of FILES, not a list of
    # directories — expand each batch dir to its part files
    paths = [os.path.join(d, f) for d in dirs
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not paths:
        import pyarrow as pa
        return rd.from_arrow(pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()),
             ("src_repo", pa.string()), ("dst_repo", pa.string()),
             ("multiplicity", pa.int64())]).empty_table())
    ds = rd.read_parquet(paths)
    return (ds.groupby(["src", "dst", "src_repo", "dst_repo"])
            .aggregate(Sum("multiplicity", alias_name="multiplicity")))


def build_incremental_graph(state_dir: str, workdir: str, P: int, *,
                            directed: bool = True) -> str:
    """Partitioned graph layout over everything landed so far — closes the
    arriving-input loop (reference S3's spawn-pipeline-per-file ends in the
    same analysis store as batch ingest, ``Metis/sinotify.py:82-87``):

        watch()/ingest_increment() -> edges_so_far() -> graph dir

    The union is globally deduped (per-increment multiplicities summed) and
    the vertex set is the union of the per-batch landed vertex tables
    (every non-quarantined file, so isolated files keep their PageRank
    share and singleton components) — the result is IDENTICAL to a batch
    build over the same corpus, INCLUDING under out-of-order arrival:
    statements whose target landed in a later increment were retro-resolved
    by ``ingest_increment`` (tested: importer-before-target graph equals
    the batch graph). The dir name carries the manifest's batch
    count: a new increment lands into a NEW graph dir (build_graph_dir is
    idempotent per dir and must not append), while re-running without new
    data reuses the existing one."""
    from ray.data.aggregate import Count

    from metis_ray.graph.partition import build_graph_dir

    man = _load_manifest(state_dir)
    edges = edges_so_far(state_dir)
    # vertex set = landed per-batch vertex tables UNION edge endpoints —
    # the union keeps batches landed by a pre-vertex-table version covered
    # (their isolated files are still missed, but never their edges)
    def rv(batch):
        import numpy as np
        import pyarrow as pa
        ids = np.concatenate([
            batch["src"].to_numpy(zero_copy_only=False),
            batch["dst"].to_numpy(zero_copy_only=False)])
        return pa.table({"vertex_id": pa.array(np.unique(ids), pa.int64())})

    verts = edges.map_batches(rv, batch_format="pyarrow")
    vdirs = [os.path.join(state_dir, "vertices", f"batch={b['batch']}")
             for b in man["batches"]]
    vpaths = [os.path.join(d, f) for d in vdirs if os.path.isdir(d)
              for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if vpaths:
        verts = verts.union(rd.read_parquet(vpaths))
    verts = (verts.groupby("vertex_id").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]))
    sub = (f"graph_incr_b{len(man['batches'])}_"
           f"{'dir' if directed else 'und'}_P{P}")
    return build_graph_dir(edges, verts, os.path.join(workdir, sub), P,
                           directed=directed)
