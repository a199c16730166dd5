"""GROUPING SETS / ROLLUP / CUBE grouped aggregation.

The multi-level summary-report shape (ANSI SQL `GROUP BY ROLLUP`): one
pass produces the per-(k1,k2) totals, the per-k1 subtotals and the grand
total, each row tagged with the standard GROUPING bitmask (bit i set —
MSB = first key — when key i is rolled up / NULL in that row). The
reference's per-run summary tallies nest exactly this way (per-part →
per-lot → per-run rec_count rollups, SURVEY.md §2.5).

Ray-Data shape: one `groupby().aggregate()` per grouping set, unioned —
each is an independent hash-shuffle aggregate with Ray's per-block
partial combine, so the union streams and nothing materializes on the
driver. For R rollup levels over the same input the scan cost is R
passes; at 100 TB prefer `sets=` with only the levels you need (the
classic alternative — aggregate the finest level once, then re-aggregate
driver-side — breaks for non-reaggregable measures and for high-cardinality
finest levels, so we pay the honest extra scans instead).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum


def _key_types(ds: rd.Dataset, keys: list[str]) -> dict[str, pa.DataType]:
    sch = ds.schema()
    m = dict(zip(sch.names, sch.types))
    missing = [k for k in keys if k not in m]
    if missing:
        raise KeyError(f"rollup keys not in dataset: {missing}")
    return {k: m[k] for k in keys}


def grouping_sets(ds: rd.Dataset, keys: list[str],
                  sets: list[tuple[str, ...]], *,
                  sum_cols: dict[str, str],
                  count_alias: str | None = None) -> rd.Dataset:
    """Aggregate ``ds`` once per grouping set and union the levels.

    ``keys`` fixes the output key columns and the GROUPING bit order;
    every set must be a subset of ``keys``. ``sum_cols`` maps source
    column -> output alias (Sum); ``count_alias`` adds a row count.
    Output columns: *keys (typed NULL where rolled up), ``grouping_id``
    (int64 bitmask, MSB = keys[0]), then the aggregates — identical
    column set at every level, so the union is schema-stable."""
    ktypes = _key_types(ds, keys)
    for s in sets:
        bad = [k for k in s if k not in ktypes]
        if bad:
            raise KeyError(f"grouping set {s} has unknown keys {bad}")

    aggs = [Sum(src, alias_name=alias) for src, alias in sum_cols.items()]
    if count_alias:
        aggs.append(Count(alias_name=count_alias))
    out_aliases = list(sum_cols.values()) + (
        [count_alias] if count_alias else [])

    levels = []
    for s in sets:
        present = [k for k in keys if k in s]     # keep the keys order
        gid = sum(1 << (len(keys) - 1 - i)
                  for i, k in enumerate(keys) if k not in s)
        if present:
            g = ds.groupby(present).aggregate(*aggs)
        else:
            # grand total: constant-key groupby (Ray has no zero-key
            # aggregate that returns a Dataset)
            g = (ds.map_batches(
                lambda t: t.append_column(
                    "__all", pa.array(np.zeros(t.num_rows, np.int8))),
                batch_format="pyarrow")
                .groupby("__all").aggregate(*aggs))

        def finish(batch: pa.Table, _present=tuple(present),
                   _gid=gid) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for k in keys:
                cols[k] = (batch[k] if k in _present
                           else pa.nulls(n, ktypes[k]))
            cols["grouping_id"] = pa.array(
                np.full(n, _gid, np.int64), pa.int64())
            for a in out_aliases:
                cols[a] = batch[a]
            return pa.table(cols)

        levels.append(g.map_batches(finish, batch_format="pyarrow"))

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def rollup(ds: rd.Dataset, keys: list[str], *,
           sum_cols: dict[str, str],
           count_alias: str | None = None) -> rd.Dataset:
    """`GROUP BY ROLLUP (keys...)`: the prefix hierarchy
    (k1..kn), (k1..kn-1), ..., (k1), () — n+1 levels."""
    sets = [tuple(keys[:i]) for i in range(len(keys), -1, -1)]
    return grouping_sets(ds, keys, sets, sum_cols=sum_cols,
                         count_alias=count_alias)


def cube(ds: rd.Dataset, keys: list[str], *,
         sum_cols: dict[str, str],
         count_alias: str | None = None) -> rd.Dataset:
    """`GROUP BY CUBE (keys...)`: all 2^n subsets. n is bounded by the
    caller's key list (2^n aggregate passes — keep n small)."""
    n = len(keys)
    sets = [tuple(k for i, k in enumerate(keys) if mask & (1 << i))
            for mask in range(2 ** n - 1, -1, -1)]
    return grouping_sets(ds, keys, sets, sum_cols=sum_cols,
                         count_alias=count_alias)


def pivot_counts(ds: rd.Dataset, row_key: str, col_key: str,
                 col_values: list[str], *,
                 prefix: str = "n_") -> rd.Dataset:
    """PIVOT by counting: one output row per ``row_key`` value, one int64
    count column per entry of ``col_values`` (rows of ``col_key`` outside
    the list are ignored). The column set is EXPLICIT so the Arrow schema
    is static — at scale, enumerate the distinct ``col_key`` values with
    a cheap groupby first, exactly like SQL PIVOT's IN list.

    Scale shape: one map_batches pass adds the |col_values| indicator
    columns (vectorized equality casts, no Python loop over rows), then a
    single groupby(row_key).sum shuffle — the exchange carries one int64
    per indicator per batch-group, independent of row count."""
    if not col_values:
        raise ValueError("col_values must be non-empty")

    def indicators(t: pa.Table) -> pa.Table:
        cols = {row_key: t[row_key]}
        arr = t[col_key]
        f = pa.scalar(False)
        for v in col_values:
            cols[prefix + v] = pc.cast(
                pc.coalesce(pc.equal(arr, pa.scalar(v)), f), pa.int64())
        return pa.table(cols)

    aggs = [Sum(prefix + v, alias_name=prefix + v) for v in col_values]
    return (ds.select_columns([row_key, col_key])
            .map_batches(indicators, batch_format="pyarrow")
            .groupby(row_key).aggregate(*aggs))


def melt(ds: rd.Dataset, id_cols: list[str], value_cols: list[str], *,
         var_name: str = "variable",
         value_name: str = "value") -> rd.Dataset:
    """UNPIVOT: one output row per (input row x value column) — the
    inverse of ``pivot_counts``. Pure per-batch flat transform (column
    slicing + concat, no shuffle, no Python loop over rows); the value
    columns must share one Arrow type."""
    if not value_cols:
        raise ValueError("value_cols must be non-empty")

    def unpivot(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {k: t[k] for k in id_cols}
            cols[var_name] = pa.array([c] * t.num_rows, pa.string())
            cols[value_name] = t[c]
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.select_columns(id_cols + value_cols).map_batches(
        unpivot, batch_format="pyarrow")
