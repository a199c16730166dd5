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
