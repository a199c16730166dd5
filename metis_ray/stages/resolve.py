"""Symbol resolution: import string -> destination vertex id.

This is the engine's join layer (SURVEY.md section 2.4).  The reference's only
join-shaped operations are broadcast/as-of lookups (WIR->WRR enrichment,
``stdf2ph5.py:501-509``; existence anti-join ``HDF5Helper.py:53-69``); here
the small side is the (module -> file) symbol table derived from the corpus
itself by the same naming convention used at extraction.

Two physical strategies, chosen by size:

* **broadcast** (default when the table fits): the symbol table is built
  once, ``ray.put`` once, and probed inside ``map_batches`` actors — no
  shuffle.  One object-store copy per node, NOT one per batch.
* **shuffle join** (``strategy="join"``): ``Dataset.join`` hash-partitioned
  on ``module`` for symbol tables too big to broadcast (the 10^12-file
  path).

Unresolvable imports (ghost modules, system includes) are dropped AND
counted, mirroring the reference's tolerated-unknown-record path
(``stdf2csv.py:178-182``).  Python's ``from pkg import symbol`` ambiguity is
handled by a parent-module fallback probe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from metis_ray.functions.hashing import hash64
from metis_ray.stages.extract import module_key_for_path


class VertexIdCollision(RuntimeError):
    """Two distinct files hashed to the same 63-bit vertex id.

    63-bit content-derived ids birthday-collide around ~3e9 keys
    (``functions/hashing.py`` documents the envelope); past that scale the
    id contract must widen to 128 bits — two int64 columns ``(vertex_hi,
    vertex_lo)`` from a blake2b(digest_size=16) split, carried together
    through every shuffle key. The guard below makes the failure loud at
    build time instead of silently merging two files' edges."""


def check_id_collisions(symbols: pa.Table) -> None:
    """Fail fast if any vertex id is claimed by more than one module key."""
    if symbols.num_rows == 0:
        return
    g = symbols.group_by("dst").aggregate([("module", "count_distinct")])
    worst = pc.max(g["module_count_distinct"]).as_py() or 0
    if worst > 1:
        n = pc.sum(pc.greater(g["module_count_distinct"], 1)).as_py()
        raise VertexIdCollision(
            f"{n} vertex id(s) map to multiple modules — 63-bit id space "
            "exhausted for this corpus; switch to 128-bit ids "
            "(see functions/hashing.py)")


def build_symbol_dataset(corpus):
    """The symbol table as a lazy Dataset (module, dst, dst_repo) — the
    shuffle-join resolution side for symbol tables too big to broadcast."""

    def to_symbols(batch: pa.Table) -> pa.Table:
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        mods = [module_key_for_path(r, p) for r, p in zip(repos, paths)]
        dst = hash64([f"{r}/{p}" for r, p in zip(repos, paths)])
        return pa.table({
            "module": pa.array(mods, pa.string()),
            "dst": pa.array(dst, pa.int64()),
            "dst_repo": pa.array(repos, pa.string()),
        })

    return corpus.select_columns(["repo", "path"]).map_batches(
        to_symbols, batch_format="pyarrow")


def check_id_collisions_ds(symbols_ds) -> None:
    """Distributed collision guard for the shuffle-join path — the same
    predicate as ``check_id_collisions`` (count of DISTINCT modules per
    vertex id > 1) as two int-keyed shuffles; nothing but per-batch partial
    counts reaches the driver."""
    from ray.data.aggregate import Count, Sum

    pairs = symbols_ds.groupby(["dst", "module"]).aggregate(
        Count(alias_name="_c"))
    perdst = pairs.groupby("dst").aggregate(Count(alias_name="modules"))

    def partial(t: pa.Table) -> pa.Table:
        bad = pc.sum(pc.cast(pc.greater(t["modules"], 1), pa.int64())).as_py()
        return pa.table({"bad": pa.array([bad or 0], pa.int64())})

    bad = (perdst.map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("bad", alias_name="bad")).get("bad") or 0)
    if bad:
        raise VertexIdCollision(
            f"{bad} vertex id(s) map to multiple modules — 63-bit id space "
            "exhausted for this corpus; switch to 128-bit ids "
            "(see functions/hashing.py)")


def build_symbol_table(corpus) -> pa.Table:
    """(module, dst, dst_repo) for every corpus file.

    ``corpus`` is a Dataset with at least (repo, path) — column-pruned read.
    The result is ~#files rows of short strings (tiny next to content), built
    with one streaming pass. Raises ``VertexIdCollision`` if the 63-bit id
    space collided (distinct modules sharing a vertex id)."""
    schema = pa.schema([("module", pa.string()), ("dst", pa.int64()),
                        ("dst_repo", pa.string())])
    parts = build_symbol_dataset(corpus).to_arrow_refs()
    tables = [t for t in (ray.get(r) for r in parts)
              if t.num_rows > 0 and t.column_names]  # zero-row blocks can be schema-less
    if not tables:
        return schema.empty_table()
    tbl = pa.concat_tables(tables)
    check_id_collisions(tbl)
    return tbl


class ResolveEdges:
    """Actor-pool probe stage: edge candidates -> resolved edges.

    The symbol table arrives as an ``ObjectRef`` and is fetched ONCE per
    actor in ``__init__`` (zero-copy plasma read), then probed per batch with
    a dict lookup; the python parent-module fallback handles
    ``from pkg import symbol``.  Output: (src, dst, src_repo, dst_repo)
    resolved rows plus a ``resolved`` flag so unresolved counts survive.
    """

    def __init__(self, symbols_ref, keep_stmt: bool = False) -> None:
        # the ref arrives BOXED in a tuple: a bare ObjectRef constructor arg
        # makes Ray keep restart-capable pool actors alive after the dataset
        # completes (ray issue #53727) — the leaked actors pin their CPU
        # reservations and starve every later shuffle into deadlock
        if isinstance(symbols_ref, tuple):
            symbols_ref = symbols_ref[0]
        symbols: pa.Table = (ray.get(symbols_ref)
                             if isinstance(symbols_ref, ray.ObjectRef)
                             else symbols_ref)
        mods = symbols["module"].to_pylist()
        dsts = symbols["dst"].to_numpy(zero_copy_only=False)
        repos = symbols["dst_repo"].to_pylist()
        self._table = {m: (int(d), r) for m, d, r in zip(mods, dsts, repos)}
        # keep_stmt: carry (module, lang) through, so unresolved statements
        # can be landed and retried against a later symbol table (the
        # incremental retro-resolution path)
        self._keep_stmt = keep_stmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        table = self._table
        mods = batch["module"].to_pylist()
        langs = batch["lang"].to_pylist()
        srcs = batch["src"].to_numpy(zero_copy_only=False)

        n = len(mods)
        o_dst = np.zeros(n, dtype=np.int64)
        resolved = np.zeros(n, dtype=bool)
        for i, (src, lang, mod) in enumerate(zip(srcs, langs, mods)):
            hit = table.get(mod)
            if hit is None and lang == "python" and "." in mod:
                hit = table.get(mod.rsplit(".", 1)[0])
            if hit is None:
                continue
            dst, _ = hit
            if dst == src:      # self-edge: dropped (M9 row-filter analogue)
                continue
            o_dst[i] = dst
            resolved[i] = True

        # repos are NOT carried here: the dedup shuffle stays (src, dst)
        # int-keyed; repo names re-attach after dedup from the broadcast
        # vertex->repo map (strings never enter the wide shuffle)
        cols = {
            "src": pa.array(srcs, pa.int64()),
            "dst": pa.array(o_dst, pa.int64()),
            "resolved": pa.array(resolved),
        }
        if self._keep_stmt:
            cols["module"] = batch["module"]
            cols["lang"] = batch["lang"]
        return pa.table(cols)


def resolve_edges_join(extracted, symbols_ds, *,
                       num_partitions: int | None = None,
                       keep_stmt: bool = False):
    """Shuffle-join resolution (``strategy='join'``): the 10^12-file path
    where the symbol table does not fit one node.

    Same semantics as ``ResolveEdges`` — exact-module left join, then the
    python parent-module fallback as a second left join over only the rows
    the first pass missed, self-edges dropped — expressed as two
    hash-partitioned ``Dataset.join``s on ``module``. Output schema matches
    the broadcast path exactly: (src, dst, resolved). Assumes module keys
    are unique in the symbol table (true by construction: one key per
    (repo, path)); duplicate keys would multiply edges here and collapse
    arbitrarily in the broadcast dict."""
    import ray as _ray
    import ray.data as rd

    from metis_ray.pipelines.dedup import _nonempty_blocks
    if num_partitions is None:
        num_partitions = max(2, min(8, int(
            _ray.cluster_resources().get("CPU", 8)) - 2))
    # compact the RIGHT side too: the symbol Dataset can carry zero-row
    # blocks and the per-partition join raises on either side
    sym, n_sym = _nonempty_blocks(symbols_ds.select_columns(["module", "dst"]))
    ext = extracted.select_columns(["src", "lang", "module"])
    if keep_stmt:
        # carry the ORIGINAL statement module through both joins (the
        # fallback join rewrites `module` to the parent key) so unresolved
        # rows can be landed and retried later with full fallback semantics
        ext = ext.map_batches(
            lambda t: t.append_column("module0", t["module"]),
            batch_format="pyarrow")
    # compact: zero-row left blocks (files with no imports) break
    # Dataset.join (schema-less partition builder)
    ext, n_ext = _nonempty_blocks(ext)
    if ext is None:
        fields = [("src", pa.int64()), ("dst", pa.int64()),
                  ("resolved", pa.bool_())]
        if keep_stmt:
            fields += [("module", pa.string()), ("lang", pa.string())]
        return rd.from_arrow(pa.schema(fields).empty_table())
    def null_dst(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "dst", pa.nulls(batch.num_rows, pa.int64()))

    if sym is None:      # empty symbol table: every statement unresolved
        j1 = ext.map_batches(null_dst, batch_format="pyarrow")
    else:
        j1 = ext.join(sym, join_type="left_outer",
                      num_partitions=num_partitions, on=("module",))

    def finish(batch: pa.Table) -> pa.Table:
        # fill nulls ARROW-side: int64-with-nulls round-trips through numpy
        # as float64 and silently corrupts 63-bit ids past 2^53
        dst = pc.fill_null(pc.cast(batch["dst"], pa.int64()),
                           0).to_numpy(zero_copy_only=False)
        src = batch["src"].to_numpy(zero_copy_only=False)
        hit = pc.is_valid(batch["dst"]).to_numpy(zero_copy_only=False)
        ok = hit & (dst != src)
        cols = {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(np.where(ok, dst, 0), pa.int64()),
            "resolved": pa.array(ok),
        }
        if keep_stmt:
            cols["module"] = batch["module0"]
            cols["lang"] = batch["lang"]
        return pa.table(cols)

    def needs_fallback(batch: pa.Table) -> pa.Table:
        miss = pc.and_(pc.invert(pc.is_valid(batch["dst"])),
                       pc.and_(pc.equal(batch["lang"], pa.scalar("python")),
                               pc.match_substring(batch["module"], ".")))
        t = batch.filter(miss)
        parents = [m.rsplit(".", 1)[0] for m in t["module"].to_pylist()]
        cols = {
            "src": t["src"],
            "lang": t["lang"],
            "module": pa.array(parents, pa.string()),
        }
        if keep_stmt:
            cols["module0"] = t["module0"]
        return pa.table(cols)

    def no_fallback(batch: pa.Table) -> pa.Table:
        miss = pc.and_(pc.invert(pc.is_valid(batch["dst"])),
                       pc.invert(pc.and_(
                           pc.equal(batch["lang"], pa.scalar("python")),
                           pc.match_substring(batch["module"], "."))))
        keep = pc.or_(pc.is_valid(batch["dst"]), miss)
        return batch.filter(keep)

    j1 = j1.materialize()   # consumed twice (hits+hard-misses, fallback rows)
    first = j1.map_batches(no_fallback, batch_format="pyarrow").map_batches(
        finish, batch_format="pyarrow")
    retry = j1.map_batches(needs_fallback, batch_format="pyarrow")
    # most blocks carry no fallback rows — compact before the second join
    retry, _ = _nonempty_blocks(retry)
    if retry is None:
        return first
    if sym is None:
        j2 = retry.map_batches(null_dst, batch_format="pyarrow")
    else:
        j2 = retry.join(sym, join_type="left_outer",
                        num_partitions=num_partitions, on=("module",))
    second = j2.map_batches(finish, batch_format="pyarrow")
    return first.union(second)


# ---------------------------------------------------------------------------
# Dense-id assignment: the 128-bit scale path
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=0.25)
def _rank_rows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote(num_cpus=0.25)
def _attach_rank(tbl: pa.Table, offset: int) -> pa.Table:
    rank = pa.array(offset + np.arange(tbl.num_rows, dtype=np.int64),
                    pa.int64())
    return tbl.drop_columns(["hi", "lo"]).append_column("dense_id", rank)


def build_dense_ids(corpus, *, num_partitions: int | None = None):
    """Dictionary-encoded vertex-id assignment: (key, module, repo,
    dense_id) with dense_id = rank of the file's 128-bit content digest in
    sorted order — consecutive ids in ``[0, n_files)``.

    This is the documented migration path past the 63-bit hash-id birthday
    bound (``functions/hashing.py``): ids stay int64 (the engine's safe
    shuffle/CSR key type) but are collision-free BY CONSTRUCTION — ranks are
    unique even in the astronomically unlikely event of a 128-bit digest
    collision. The assignment is a pure function of the file SET (order-
    and parallelism-independent): blake2b-128 of "repo/path", distributed
    sort by the digest, global rank from per-block offsets. Only per-block
    row counts (ints) visit the driver; rows never do.

    Trade-off vs hash ids: resolution must JOIN on the key string for the
    src side too (hash ids are recomputable anywhere, dense ids only exist
    in this table), so the dense scheme always uses the shuffle-join
    resolution strategy. The sort is one extra all-to-all over ~#files
    short rows — tiny next to content extraction."""
    import ray.data as rd

    def keyed(batch: pa.Table) -> pa.Table:
        from metis_ray.functions.hashing import hash128
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        keys = [f"{r}/{p}" for r, p in zip(repos, paths)]
        mods = [module_key_for_path(r, p) for r, p in zip(repos, paths)]
        hi, lo = hash128(keys)
        return pa.table({
            "key": pa.array(keys, pa.string()),
            "module": pa.array(mods, pa.string()),
            "repo": pa.array(repos, pa.string()),
            "hi": pa.array(hi, pa.int64()),
            "lo": pa.array(lo, pa.int64()),
        })

    ds = (corpus.select_columns(["repo", "path"])
          .map_batches(keyed, batch_format="pyarrow")
          .sort(["hi", "lo"]))
    # Ray's sort emits range-partitioned blocks in global order, so block
    # offsets ARE global ranks. to_arrow_refs keeps every row in the object
    # store; the driver sees only the per-block counts.
    refs = ds.to_arrow_refs()
    counts = ray.get([_rank_rows.remote(r) for r in refs])
    blocks, off = [], 0
    for r, n in zip(refs, counts):
        if n:
            blocks.append(_attach_rank.remote(r, off))
            off += n
    if not blocks:
        return rd.from_arrow(pa.schema(
            [("key", pa.string()), ("module", pa.string()),
             ("repo", pa.string()), ("dense_id", pa.int64())]).empty_table())
    return rd.from_arrow_refs(blocks)


def dense_symbol_dataset(dense):
    """The (module, dst, dst_repo) symbol Dataset over dense ids — the
    drop-in symbol side for ``resolve_edges_join`` / repo re-attach."""
    return dense.select_columns(["module", "dense_id", "repo"]).map_batches(
        lambda t: t.rename_columns(["module", "dst", "dst_repo"]),
        batch_format="pyarrow")
