"""Ingest pipeline: corpus parquet -> validated files table + deduped edge tables.

End-to-end (SURVEY.md section 3.4):

    read_parquet(corpus)                                  [S1]
      -> map_batches(ValidateAndChecksum)                 [M1/M3 + sha256 invariant]
      -> map_batches(EdgeExtractor, actor pool)           [M5 type-dispatch parse]
      -> map_batches(ResolveEdges, broadcast symbol table)[section 2.4 join]
      -> local distinct -> groupby(src,dst).count()       [section 2.7 dedup]

Everything streams; ``content`` is projected away inside the extractor so
edge blocks are narrow.  The only all-to-all exchange in ingest is the final
dedup groupby, fed by per-batch pre-distinct partials.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from metis_ray.functions.hashing import hash64
from metis_ray.sources.parquet import read_corpus
from metis_ray.stages.extract import EdgeExtractor
from metis_ray.stages.resolve import (ResolveEdges, build_dense_ids,
                                      build_symbol_table)
from metis_ray.stages.validate import ValidateAndChecksum

EDGE_KEYS = ["src", "dst", "src_repo", "dst_repo"]

_REPO_MAP_CACHE: dict = {}


def _repo_map_cached(symbols_ref) -> dict:
    """vertex id -> repo name, built once per worker process from the
    broadcast symbol table (zero-copy plasma read)."""
    key = symbols_ref.hex() if hasattr(symbols_ref, "hex") else id(symbols_ref)
    m = _REPO_MAP_CACHE.get(key)
    if m is None:
        symbols: pa.Table = ray.get(symbols_ref)
        m = dict(zip(symbols["dst"].to_numpy(zero_copy_only=False),
                     symbols["dst_repo"].to_pylist()))
        _REPO_MAP_CACHE.clear()
        _REPO_MAP_CACHE[key] = m
    return m


def validated(corpus: rd.Dataset) -> rd.Dataset:
    """corpus + (sha256, quarantined) columns — one streaming pass."""
    return corpus.map_batches(ValidateAndChecksum(), batch_format="pyarrow",
                              zero_copy_batch=True)


def files_table(corpus: rd.Dataset) -> rd.Dataset:
    """The per-file metadata table (vertex table): everything except content.

    Analogue of the reference's per-record-type landed tables; ``sha256`` is
    the lossless-ingestion invariant column."""

    def project(batch: pa.Table) -> pa.Table:
        vid = hash64([f"{r}/{p}" for r, p in
                      zip(batch["repo"].to_pylist(), batch["path"].to_pylist())])
        return batch.drop_columns(["content"]).append_column(
            "vertex_id", pa.array(vid, pa.int64()))

    return validated(corpus).map_batches(project, batch_format="pyarrow")


def files_table_dense(corpus: rd.Dataset, dense: rd.Dataset) -> rd.Dataset:
    """``files_table`` under the dense-id scheme: ``vertex_id`` comes from
    the assignment table (join on the file key) instead of hash64."""
    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks

    def project(batch: pa.Table) -> pa.Table:
        keys = [f"{r}/{p}" for r, p in
                zip(batch["repo"].to_pylist(), batch["path"].to_pylist())]
        return batch.drop_columns(["content"]).append_column(
            "key", pa.array(keys, pa.string()))

    f = validated(corpus).map_batches(project, batch_format="pyarrow")
    f, n_rows = _nonempty_blocks(f)
    if f is None:
        # schema must match the non-empty path (downstream stats/writers
        # access quarantined etc.)
        return rd.from_arrow(pa.schema(
            [("repo", pa.string()), ("path", pa.string()),
             ("commit", pa.string()), ("lang", pa.string()),
             ("sha256", pa.string()), ("quarantined", pa.bool_()),
             ("vertex_id", pa.int64())]).empty_table())
    vmap, _ = _nonempty_blocks(
        dense.select_columns(["key", "dense_id"]).map_batches(
            lambda t: t.rename_columns(["key", "vertex_id"]),
            batch_format="pyarrow"))   # right side: joins choke on 0-row blocks
    if vmap is None:   # empty assignment table => inner join is empty
        return rd.from_arrow(pa.schema(
            [("repo", pa.string()), ("path", pa.string()),
             ("commit", pa.string()), ("lang", pa.string()),
             ("sha256", pa.string()), ("quarantined", pa.bool_()),
             ("vertex_id", pa.int64())]).empty_table())
    n = max(2, min(_join_parts(), n_rows // 50_000 + 2))
    j = f.join(vmap, join_type="inner", num_partitions=n, on=("key",))
    return j.drop_columns(["key"])


def raw_resolved_dense(corpus: rd.Dataset, dense: rd.Dataset, *,
                       concurrency=None) -> rd.Dataset:
    """validate -> extract -> dense resolution; output matches
    ``raw_resolved`` (src, dst, resolved) with ids from the dense table.

    Dense ids exist only in the assignment table, so BOTH endpoints join:
    src via the file key string, dst via the module key (the standard
    ``resolve_edges_join``). All shuffles are hash-partitioned Dataset
    joins; nothing funnels through the driver."""
    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks
    from metis_ray.stages.resolve import resolve_edges_join

    cpu = int(ray.cluster_resources().get("CPU", 8))
    if cpu < 4:
        # tiny cluster: an actor pool + read tasks starve each other
        ex = validated(corpus).map_batches(
            EdgeExtractor(), batch_format="pyarrow", zero_copy_batch=True)
    else:
        if concurrency is None:
            concurrency = _default_concurrency()
        ex = validated(corpus).map_batches(
            EdgeExtractor, batch_format="pyarrow", zero_copy_batch=True,
            concurrency=concurrency)

    def with_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch["src_repo"], batch["src_path"], "/")
        return pa.table({"src_key": key, "lang": batch["lang"],
                         "module": batch["module"]})

    exk = ex.map_batches(with_key, batch_format="pyarrow")
    exk, n_rows = _nonempty_blocks(exk)
    if exk is None:
        return rd.from_arrow(pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()),
             ("resolved", pa.bool_())]).empty_table())
    smap, _ = _nonempty_blocks(
        dense.select_columns(["key", "dense_id"]).map_batches(
            lambda t: t.rename_columns(["src_key", "src"]),
            batch_format="pyarrow"))   # right side: joins choke on 0-row blocks
    if smap is None:   # empty assignment table => inner join is empty
        return rd.from_arrow(pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()),
             ("resolved", pa.bool_())]).empty_table())
    n = max(2, min(_join_parts(), n_rows // 50_000 + 2))
    # inner join is exact: every extracted row's source file is in the
    # corpus, hence in the assignment table
    j = exk.join(smap, join_type="inner", num_partitions=n, on=("src_key",))
    j = j.select_columns(["src", "lang", "module"])
    from metis_ray.stages.resolve import dense_symbol_dataset
    return resolve_edges_join(j, dense_symbol_dataset(dense))


def _local_counts(batch: pa.Table) -> pa.Table:
    """Per-batch partial duplicate counts (combiner before the shuffle).

    Emitting (src, dst, n) partials instead of a plain distinct keeps
    ``multiplicity`` the TRUE duplicate-import count — a pure function of the
    data, identical at any parallelism — while still collapsing each block
    before the all-to-all exchange."""
    g = batch.group_by(["src", "dst"]).aggregate([([], "count_all")])
    return g.select(["src", "dst", "count_all"]).rename_columns(
        ["src", "dst", "n"])


def _default_concurrency() -> int:
    """Size actor pools off the cluster: the extract pool plus the resolve
    pool (half this size) must leave CPUs free for the read tasks and the
    dedup shuffle — two pools that together reserve every CPU deadlock the
    pipeline (read tasks never get a slot)."""
    cpu = int(ray.cluster_resources().get("CPU", 8))
    return max(1, (cpu - 2) // 2)


def raw_resolved(corpus: rd.Dataset, symbols_ref, *, concurrency=None,
                 strategy: str = "broadcast",
                 keep_stmt: bool = False) -> rd.Dataset:
    """validate -> extract -> resolve; rows carry a ``resolved`` flag.

    ``strategy='broadcast'`` (default): the symbol table ships once via
    ``ray.put`` and is probed per batch — right whenever it fits one node.
    ``strategy='join'``: hash-shuffle ``Dataset.join`` on module — the path
    for symbol tables too big to broadcast; ``symbols_ref`` may then be a
    symbol Dataset (``build_symbol_dataset``) or the usual ref/table.

    Extraction (regex scanning over content) dominates; resolution is a dict
    probe — its pool is half the size. ``keep_stmt`` carries (module, lang)
    through resolution so unresolved statements can be landed and retried
    (the incremental retro-resolution path)."""
    if strategy == "join":
        from metis_ray.stages.resolve import resolve_edges_join
        ex = validated(corpus).map_batches(
            EdgeExtractor(), batch_format="pyarrow", zero_copy_batch=True)
        symbols_ds = symbols_ref
        if not isinstance(symbols_ds, rd.Dataset):
            tbl = (ray.get(symbols_ref)
                   if isinstance(symbols_ref, ray.ObjectRef) else symbols_ref)
            symbols_ds = rd.from_arrow(tbl)
        return resolve_edges_join(ex, symbols_ds, keep_stmt=keep_stmt)
    cpu = int(ray.cluster_resources().get("CPU", 8))
    if cpu < 4:
        # tiny cluster: two actor pools + read tasks would starve each other
        # (pool CPUs are reserved); fall back to stateless task stages —
        # state is rebuilt per task, acceptable at tiny scale by definition
        ex = validated(corpus).map_batches(
            EdgeExtractor(), batch_format="pyarrow", zero_copy_batch=True)
        return ex.map_batches(
            ResolveEdges(symbols_ref, keep_stmt), batch_format="pyarrow",
            zero_copy_batch=True)
    if concurrency is None:
        concurrency = _default_concurrency()
    ex = validated(corpus).map_batches(
        EdgeExtractor, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)
    return ex.map_batches(
        ResolveEdges, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=((symbols_ref,), keep_stmt),  # boxed ref: see ResolveEdges
        concurrency=max(1, concurrency // 2))


def _attach_repos_join(deduped: rd.Dataset, symbols_ds: rd.Dataset) -> rd.Dataset:
    """Repo-name re-attach for the shuffle-join path: two hash-partitioned
    ``Dataset.join``s against the (vertex id -> repo) projection of the
    symbol Dataset — the symbol table never funnels through the driver."""
    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks

    vmap = symbols_ds.select_columns(["dst", "dst_repo"])
    deduped, n_rows = _nonempty_blocks(deduped)
    if deduped is None:
        return rd.from_arrow(pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()),
             ("src_repo", pa.string()), ("dst_repo", pa.string()),
             ("multiplicity", pa.int64())]).empty_table())
    n = max(2, min(_join_parts(), n_rows // 50_000 + 2))
    j1 = deduped.join(vmap, join_type="inner", num_partitions=n, on=("dst",))
    j1, _ = _nonempty_blocks(j1)   # joins can emit empty partitions
    smap = vmap.rename_columns({"dst": "src", "dst_repo": "src_repo"})
    j2 = j1.join(smap, join_type="inner", num_partitions=n, on=("src",))
    return j2.select_columns(
        ["src", "dst", "src_repo", "dst_repo", "multiplicity"])


def dedup_edges(resolved: rd.Dataset, symbols_ref=None) -> rd.Dataset:
    """Exact dedup = hash-partition by (src,dst) + per-group count.

    Output: src, dst, src_repo, dst_repo, multiplicity — multiplicity is the
    exact number of resolved import statements mapping to the edge (the
    duplicate-import count), computed as per-batch partial counts summed in
    the shuffle so the value is parallelism-independent. Per-batch partials
    cut shuffle volume (the reference dedups imports by exact name,
    ``HDF5Helper.py:53-69``; here the key is the edge identity). The
    shuffle is int-keyed only; repo name strings re-attach afterwards —
    from the broadcast vertex->repo map when ``symbols_ref`` is a
    table/ObjectRef, or via two hash-partitioned joins when it is a symbol
    *Dataset* (the driver-clean ``strategy='join'`` path)."""
    kept = resolved.map_batches(
        lambda t: t.filter(t["resolved"]).select(["src", "dst"]),
        batch_format="pyarrow")
    pre = kept.map_batches(_local_counts, batch_format="pyarrow")
    deduped = pre.groupby(["src", "dst"]).aggregate(
        Sum("n", alias_name="multiplicity"))
    if symbols_ref is None:
        return deduped
    if isinstance(symbols_ref, rd.Dataset):
        return _attach_repos_join(deduped, symbols_ref)

    # stateless tasks (NOT another actor pool — a third pool would starve
    # small clusters) with a per-worker-process cache of the vertex->repo map
    def attach(batch: pa.Table) -> pa.Table:
        rp = _repo_map_cached(symbols_ref)
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": batch["src"], "dst": batch["dst"],
            "src_repo": pa.array([rp[x] for x in s], pa.string()),
            "dst_repo": pa.array([rp[x] for x in d], pa.string()),
            "multiplicity": batch["multiplicity"],
        })

    return deduped.map_batches(attach, batch_format="pyarrow")


def backup_corpus(corpus_dir: str, out_dir: str) -> dict:
    """Lossless raw backup: land the VERBATIM corpus rows (content included)
    plus their sha256 next to the parsed tables — the reference's
    ``/backup`` group contract ("without the loss of ANY information",
    README.md:27-31; raw import at ``Metis/tools/HDF5Helper.py:71-80``).

    Idempotent: an existing ``_MANIFEST.json`` short-circuits (the
    "already imported => nothing to do" check, ``HDF5Helper.py:53-69``).
    Streaming ``write_parquet`` with zstd — the analogue of the reference's
    complevel=9 HDF5 — one file per input block, resumable layout."""
    import json
    import os
    man_path = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(man_path):
        with open(man_path) as fh:
            return json.load(fh)
    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    ds = validated(read_corpus(corpus_dir))
    ds.write_parquet(tmp, compression="zstd")
    rows = rd.read_parquet(tmp).count()
    info = {"rows": rows, "corpus_dir": corpus_dir}
    with open(os.path.join(tmp, "_MANIFEST.json"), "w") as fh:
        json.dump(info, fh)
    if os.path.exists(out_dir):
        import shutil
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return info


def repo_edges(edges_file: rd.Dataset) -> rd.Dataset:
    """repo->repo rollup: distinct cross-repo pairs with repo-id vertices.

    ``multiplicity`` = number of distinct file-level edges between the repo
    pair (edges_file is already one row per (src,dst)), computed as per-batch
    partial counts + Sum so the value is parallelism-independent."""

    def project(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.invert(pc.equal(batch["src_repo"], batch["dst_repo"])))
        srepo = t["src_repo"].to_pylist()
        drepo = t["dst_repo"].to_pylist()
        out = pa.table({
            "src": pa.array(hash64(srepo), pa.int64()),
            "dst": pa.array(hash64(drepo), pa.int64()),
            "src_repo": pa.array(srepo, pa.string()),
            "dst_repo": pa.array(drepo, pa.string()),
        })
        g = out.group_by(EDGE_KEYS).aggregate([([], "count_all")])
        return g.select(EDGE_KEYS + ["count_all"]).rename_columns(
            EDGE_KEYS + ["n"])

    pre = edges_file.map_batches(project, batch_format="pyarrow")
    return pre.groupby(EDGE_KEYS).aggregate(Sum("n", alias_name="multiplicity"))


def graph_vertices(files: rd.Dataset) -> rd.Dataset:
    """Vertex table for the graph: every non-quarantined file."""
    return files.map_batches(
        lambda t: t.filter(pc.invert(t["quarantined"])).select(["vertex_id"]),
        batch_format="pyarrow")


def build_linkgraph(corpus_dir: str, workdir: str, P: int, *,
                    directed: bool = True, level: str = "file",
                    concurrency=None, weight_col: str | None = None) -> str:
    """corpus -> ingest -> partitioned graph layout; returns the graph dir.

    ``level='repo'`` builds the repo->repo rollup graph instead of the
    file->file graph. ``weight_col`` (e.g. ``'multiplicity'``) persists a
    per-edge weight in the layout for weighted PageRank / LPA on the
    shard engine."""
    from metis_ray.graph.partition import build_graph_dir

    res = ingest(corpus_dir, concurrency=concurrency)
    if level == "repo":
        edges = res.edges_repo

        def rv(batch: pa.Table) -> pa.Table:
            import numpy as np
            ids = np.concatenate([batch["src"].to_numpy(zero_copy_only=False),
                                  batch["dst"].to_numpy(zero_copy_only=False)])
            return pa.table({"vertex_id": pa.array(np.unique(ids), pa.int64())})

        verts = edges.map_batches(rv, batch_format="pyarrow").groupby(
            "vertex_id").aggregate(Count(alias_name="_c")).drop_columns(["_c"])
    else:
        edges = res.edges_file
        verts = graph_vertices(res.files)
    sub = (f"graph_{level}_{'dir' if directed else 'und'}"
           f"{'_w' if weight_col else ''}_P{P}")
    return build_graph_dir(edges, verts, f"{workdir}/{sub}", P,
                           directed=directed, weight_col=weight_col)


def _ingest_stats(resolved: rd.Dataset, files: rd.Dataset) -> dict:
    """Counting aggregations over MATERIALIZED resolved/files datasets
    (rows, quarantined, import statements, unresolved) — the F6
    count-reconciliation oracle; shared by both id schemes."""

    def partials(batch: pa.Table) -> pa.Table:
        res = pc.sum(pc.cast(batch["resolved"], pa.int64())).as_py() or 0
        return pa.table({"stmts": pa.array([batch.num_rows], pa.int64()),
                         "resolved": pa.array([res], pa.int64())})

    agg = (resolved.map_batches(partials, batch_format="pyarrow")
           .aggregate(Sum("stmts", alias_name="stmts"),
                      Sum("resolved", alias_name="resolved")))
    q = files.map_batches(
        lambda t: pa.table({
            "rows": pa.array([t.num_rows], pa.int64()),
            "quarantined": pa.array(
                [pc.sum(pc.cast(t["quarantined"], pa.int64())).as_py() or 0],
                pa.int64())}),
        batch_format="pyarrow").aggregate(
            Sum("rows", alias_name="rows"),
            Sum("quarantined", alias_name="quarantined"))
    stmts = agg.get("stmts") or 0      # None when zero edge candidates
    res = agg.get("resolved") or 0
    return {
        "rows": q.get("rows") or 0,
        "quarantined": q.get("quarantined") or 0,
        "import_stmts_emitted": stmts,
        "resolved": res,
        "unresolved_or_self": stmts - res,
    }


@dataclass
class IngestResult:
    files: rd.Dataset        # repo, path, commit, lang, sha256, quarantined, vertex_id
    edges_file: rd.Dataset   # src, dst, src_repo, dst_repo, multiplicity
    edges_repo: rd.Dataset   # src, dst, src_repo, dst_repo, multiplicity
    symbols_ref: "ray.ObjectRef"
    stats: dict
    dense_ids: rd.Dataset | None = None   # (key, module, repo, dense_id)
    #                                       when id_scheme='dense'


def ingest(corpus_dir: str, *, concurrency=None, collect_stats: bool = False,
           resolve_strategy: str = "broadcast",
           id_scheme: str = "hash") -> IngestResult:
    """Build the full ingest DAG over a corpus directory (lazy Datasets).

    ``collect_stats=True`` additionally executes the counting aggregations
    (rows, quarantined, import statements, unresolved) — extra passes, for
    tests/reporting only (F6 count-reconciliation oracle).

    ``id_scheme='dense'``: vertex ids come from the dictionary-encoded
    assignment pass (``resolve.build_dense_ids``) instead of 63-bit content
    hashes — the collision-free path past the ~3e9-file birthday bound.
    Implies shuffle-join resolution (dense ids are not recomputable from
    the key alone); ``resolve_strategy`` is ignored.
    """
    corpus = read_corpus(corpus_dir)
    if id_scheme == "dense":
        from metis_ray.stages.resolve import dense_symbol_dataset
        dense = build_dense_ids(
            read_corpus(corpus_dir, columns=["repo", "path"])).materialize()
        resolved = raw_resolved_dense(corpus, dense, concurrency=concurrency)
        files = files_table_dense(corpus, dense)
        symbols = dense_symbol_dataset(dense).materialize()
        stats: dict = {}
        if collect_stats:
            resolved = resolved.materialize()
            files = files.materialize()
            stats = _ingest_stats(resolved, files)
        edges = dedup_edges(resolved, symbols)
        return IngestResult(files=files, edges_file=edges,
                            edges_repo=repo_edges(edges), symbols_ref=None,
                            stats=stats, dense_ids=dense)
    if resolve_strategy == "join":
        # driver-clean scale path: the symbol table stays a Dataset end to
        # end (resolution joins + repo re-attach joins); the driver never
        # concatenates it. materialize() pins blocks in the OBJECT STORE
        # (they are consumed by four joins), not on the driver.
        from metis_ray.stages.resolve import (build_symbol_dataset,
                                              check_id_collisions_ds)
        symbols = build_symbol_dataset(
            read_corpus(corpus_dir, columns=["repo", "path"])).materialize()
        check_id_collisions_ds(symbols)
        symbols_ref = None
    else:
        symbols = symbols_ref = ray.put(build_symbol_table(
            read_corpus(corpus_dir, columns=["repo", "path"])))
    resolved = raw_resolved(corpus, symbols, concurrency=concurrency,
                            strategy=resolve_strategy)
    files = files_table(corpus)

    stats = {}
    if collect_stats:
        # ONE extraction pass: the resolved statement table is materialized
        # (narrow int/flag rows, content already projected away) and both
        # the stats aggregate and the dedup shuffle read those blocks —
        # previously the stats path re-ran the whole validate+extract+resolve
        # chain a second time. Quarantine counts likewise come from the
        # (content-free) files table instead of a second sha256 pass.
        resolved = resolved.materialize()
        files = files.materialize()
        stats = _ingest_stats(resolved, files)

    edges = dedup_edges(resolved, symbols)
    redges = repo_edges(edges)
    return IngestResult(files=files, edges_file=edges,
                        edges_repo=redges, symbols_ref=symbols_ref, stats=stats)
