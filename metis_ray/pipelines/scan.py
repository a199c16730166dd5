"""Distributed prefix-scan (cumulative / running aggregates) and
token-budget shard packing over the ``documents`` table.

The reference's running counters (``part_index`` / ``rec_count``,
``Metis/tools/stdf2ph5.py:316,409-420``) are sequential by construction;
the scale-safe re-expression is the classic two-phase parallel scan:

1. range-partition by the order key (``Dataset.sort`` — blocks come out in
   global order),
2. one tiny reduction: per-block partial sums (one int per block visits the
   driver, never rows),
3. per-block vectorized cumsum + broadcast offset.

This is also the packing primitive a training-data pipeline needs: "split a
corpus into shards of ~N tokens each" is ``floor(exclusive_cumsum /
budget)`` over any deterministic document order — each shard draws a
contiguous token range, reproducible at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from metis_ray.sources.parquet import read_table


@ray.remote(num_cpus=0.25)
def _block_sum(tbl: pa.Table, col: str) -> int:
    import pyarrow.compute as pc
    return pc.sum(tbl[col]).as_py() or 0


@ray.remote(num_cpus=0.25)
def _block_cumsum(tbl: pa.Table, col: str, out_col: str,
                  offset: int) -> pa.Table:
    v = tbl[col].to_numpy(zero_copy_only=False)
    return tbl.append_column(out_col,
                             pa.array(offset + np.cumsum(v), pa.int64()))


def distributed_cumsum(ds: rd.Dataset, order_cols: list[str], val_col: str,
                       out_col: str = "cum") -> rd.Dataset:
    """``out_col`` = inclusive running sum of ``val_col`` in ``order_cols``
    order (ties: ``order_cols`` must be a unique key for a deterministic
    result — pass the full key). Two-phase scan; only per-block partial
    sums (ints) visit the driver."""
    ds = ds.sort(order_cols)
    refs = ds.to_arrow_refs()
    sums = ray.get([_block_sum.remote(r, val_col) for r in refs])
    blocks, off = [], 0
    for r, s in zip(refs, sums):
        blocks.append(_block_cumsum.remote(r, val_col, out_col, off))
        off += s
    if not blocks:
        return ds
    return rd.from_arrow_refs(blocks)


def cum_tokens(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_tokens, cum_tokens): running corpus token total in doc_id
    order — the running-counter analogue, SQL-twinned by a window sum."""
    from metis_ray.pipelines.textstats import token_counts
    return distributed_cumsum(token_counts(sf_dir), ["doc_id"], "n_tokens",
                              "cum_tokens")


def pack_bins(sf_dir: str, *, budget: int = 4096) -> rd.Dataset:
    """(doc_id, n_tokens, bin_id): token-budget shard packing — documents
    are laid out in doc_id order and each shard (bin) covers a contiguous
    ~``budget``-token range; a document belongs to the bin where it starts
    (``floor(exclusive_cumsum / budget)``). Deterministic at any
    parallelism; a resumable export writes one output partition per bin."""
    ds = cum_tokens(sf_dir)

    def stage(batch: pa.Table) -> pa.Table:
        cum = batch["cum_tokens"].to_numpy(zero_copy_only=False)
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": batch["n_tokens"],
            "bin_id": pa.array((cum - n) // budget, pa.int64()),
        })

    return ds.map_batches(stage, batch_format="pyarrow")


def export_packed(sf_dir: str, out_dir: str, *,
                  budget: int = 4096) -> "pd.DataFrame":
    """Resumable partitioned training-data export: pack documents into
    token-budget bins (``pack_bins``), attach text by a hash-partitioned
    join, and write ONE Hive-style partition per bin
    (``out_dir/bin_id=N/part-0.parquet``) — never one giant file.

    Per-partition atomic + resumable: each bin's file is written to a tmp
    name and ``os.replace``d into place inside the worker, so a crashed
    run leaves either a complete partition or an invisible tmp; a re-run
    SKIPS every bin whose final file already exists and writes only the
    missing ones. The layout is plain Hive partitioning —
    ``read_parquet(out_dir)`` (Ray, DuckDB, Spark) reads it back with
    ``bin_id`` reconstructed. On a multi-node cluster ``out_dir`` must be
    shared storage (the same contract as every distributed sink).

    Returns the export manifest as a DataFrame: one row per bin with
    ``rows`` written, or ``rows = -1`` for bins skipped as already
    complete."""
    import os

    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks

    os.makedirs(out_dir, exist_ok=True)
    done = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(out_dir)
        if d.startswith("bin_id=")
        and os.path.exists(os.path.join(out_dir, d, "part-0.parquet")))

    bins, _ = _nonempty_blocks(pack_bins(sf_dir, budget=budget))
    skipped = pd.DataFrame({"bin_id": pd.Series(done, dtype="int64"),
                            "rows": pd.Series([-1] * len(done),
                                              dtype="int64")})
    if bins is None:
        return skipped
    if done:
        done_arr = pa.array(done, pa.int64())
        bins, _ = _nonempty_blocks(bins.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t["bin_id"],
                                                  value_set=done_arr))),
            batch_format="pyarrow"))
        if bins is None:
            return skipped

    from metis_ray.sources.parquet import read_table as _rt
    docs, _ = _nonempty_blocks(_rt(sf_dir, "documents",
                                   columns=["doc_id", "text"]))
    j = bins.join(docs, join_type="inner", num_partitions=_join_parts(),
                  on=("doc_id",))
    j, _ = _nonempty_blocks(j)
    if j is None:
        return skipped

    def write_bin(group: pa.Table) -> pa.Table:
        bid = group["bin_id"][0].as_py()
        d = os.path.join(out_dir, f"bin_id={bid}")
        os.makedirs(d, exist_ok=True)
        final = os.path.join(d, "part-0.parquet")
        tmp = os.path.join(d, ".part-0.parquet.tmp")
        tbl = (group.sort_by("doc_id")
               .select(["doc_id", "n_tokens", "text"]))
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)
        return pa.table({"bin_id": pa.array([bid], pa.int64()),
                         "rows": pa.array([group.num_rows], pa.int64())})

    written = (j.groupby("bin_id").map_groups(write_bin,
                                              batch_format="pyarrow")
               .to_pandas())
    return (pd.concat([written, skipped], ignore_index=True)
            .sort_values("bin_id").reset_index(drop=True))
