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


def build_symbol_table(corpus) -> pa.Table:
    """(module, dst, dst_repo) for every corpus file.

    ``corpus`` is a Dataset with at least (repo, path) — column-pruned read.
    The result is ~#files rows of short strings (tiny next to content), built
    with one streaming pass.
    """

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

    schema = pa.schema([("module", pa.string()), ("dst", pa.int64()),
                        ("dst_repo", pa.string())])
    parts = corpus.select_columns(["repo", "path"]).map_batches(
        to_symbols, batch_format="pyarrow").to_arrow_refs()
    tables = [t for t in (ray.get(r) for r in parts)
              if t.num_rows > 0 and t.column_names]  # zero-row blocks can be schema-less
    if not tables:
        return schema.empty_table()
    return pa.concat_tables(tables)


class ResolveEdges:
    """Actor-pool probe stage: edge candidates -> resolved edges.

    The symbol table arrives as an ``ObjectRef`` and is fetched ONCE per
    actor in ``__init__`` (zero-copy plasma read), then probed per batch with
    a dict lookup; the python parent-module fallback handles
    ``from pkg import symbol``.  Output: (src, dst, src_repo, dst_repo)
    resolved rows plus a ``resolved`` flag so unresolved counts survive.
    """

    def __init__(self, symbols_ref) -> None:
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
        return pa.table({
            "src": pa.array(srcs, pa.int64()),
            "dst": pa.array(o_dst, pa.int64()),
            "resolved": pa.array(resolved),
        })
