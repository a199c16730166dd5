"""Relational operator matrix over the driver's TPC-H-ish tables.

Each pipeline is the Ray-Data-first expression of a classic operator shape
(grouped aggregate, hash join, broadcast join, anti-join, sort/top-k,
distinct, windowed aggregate, per-key ordered lag) with a DuckDB SQL twin in
``__ray_entry__.oracle_sql``.  Float aggregates are rounded identically on
both sides (2 decimals) so summation order can't flip the value-hash.

Scale notes per operator are in each docstring; the common rules: prune
columns at the read, pre-aggregate inside map_batches before any groupby,
broadcast dimension tables instead of shuffling fact tables.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from metis_ray.sources.parquet import read_table


def _round2(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    def r(batch: pa.Table) -> pa.Table:
        for c in cols:
            batch = batch.set_column(
                batch.column_names.index(c), c,
                pc.round(batch[c], ndigits=2))
        return batch
    return ds.map_batches(r, batch_format="pyarrow")


# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1 shape: filtered grouped aggregate over lineitem.
    Pre-aggregation happens inside Ray's hash-shuffle aggregate (per-block
    partial combine); read is column-pruned to the 7 needed columns."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount", "l_tax",
                             "l_shipdate"])

    def prep(batch: pa.Table) -> pa.Table:
        m = pc.less_equal(batch["l_shipdate"],
                          pa.scalar(pd.Timestamp("1998-09-02")))
        t = batch.filter(m)
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        charge = pc.multiply(disc, pc.add(pa.scalar(1.0), t["l_tax"]))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "l_quantity": t["l_quantity"],
            "l_extendedprice": t["l_extendedprice"],
            "disc_price": disc,
            "charge": charge,
        })

    agg = (li.map_batches(prep, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Sum("l_extendedprice", alias_name="sum_base_price"),
                      Sum("disc_price", alias_name="sum_disc_price"),
                      Sum("charge", alias_name="sum_charge"),
                      Mean("l_quantity", alias_name="avg_qty"),
                      Count(alias_name="count_order")))
    return _round2(agg, ["sum_qty", "sum_base_price", "sum_disc_price",
                         "sum_charge", "avg_qty"])


def q3_top_orders(sf_dir: str, *, segment: str = "BUILDING",
                  k: int = 10) -> pd.DataFrame:
    """TPC-H Q3 shape: 3-way hash join + grouped revenue + top-k.
    customer/orders joined via Dataset.join (hash-partitioned); top-k via
    sort+limit on the small aggregate."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], pa.scalar(segment)))
        .select(["c_custkey"]),
        batch_format="pyarrow")
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])

    from metis_ray.pipelines.dedup import _nonempty_blocks
    cust, _ = _nonempty_blocks(cust)   # filtered: blocks with no match are
    if cust is None:                   # schema-less and break the join
        return pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                             "o_orderdate": pd.Series([], dtype="object"),
                             "revenue": pd.Series([], dtype="float64")})
    co = orders.join(cust.rename_columns({"c_custkey": "o_custkey"}),
                     join_type="inner", num_partitions=max(2, min(8, int(ray.cluster_resources().get("CPU", 8)) - 2)), on=("o_custkey",))
    col = li.join(co.rename_columns({"o_orderkey": "l_orderkey"}),
                  join_type="inner", num_partitions=max(2, min(8, int(ray.cluster_resources().get("CPU", 8)) - 2)), on=("l_orderkey",))

    def rev(batch: pa.Table) -> pa.Table:
        r = pc.multiply(batch["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({"o_orderkey": batch["l_orderkey"],
                         "o_orderdate": batch["o_orderdate"],
                         "revenue": r})

    agg = (col.map_batches(rev, batch_format="pyarrow")
           .groupby(["o_orderkey", "o_orderdate"])
           .aggregate(Sum("revenue", alias_name="revenue")))
    # top-k via distributed sort+limit — the aggregate is one row per
    # qualifying order, unbounded at scale, so it must NOT be collected
    # whole. Revenue is rounded ARROW-side BEFORE the sort so the
    # distributed ordering is exactly the SQL twin's (ORDER BY rounded
    # revenue DESC, o_orderkey) — no tie-margin heuristic.
    top = (_round2(agg, ["revenue"])
           .sort(["revenue", "o_orderkey"], descending=[True, False])
           .limit(k).to_pandas())
    return top[["o_orderkey", "o_orderdate", "revenue"]]


def revenue_per_nation(sf_dir: str) -> rd.Dataset:
    """Fact-fact joins + one TRUE broadcast dim. lineitem joins orders, then
    per-batch partial revenue per customer joins CUSTOMER — both as
    hash-partitioned ``Dataset.join``s, because customer is fact-scale (it
    grows linearly with SF and does not fit one node at 100 TB). Only the
    25-row nation table is broadcast (``ray.put`` once, guarded
    ``np.searchsorted`` probe per batch). Output (n_name, revenue)."""
    nation = read_table(sf_dir, "nation",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    nkeys = nation["n_nationkey"].to_numpy(np.int64)
    order_n = np.argsort(nkeys)
    nref = ray.put((nkeys[order_n], nation["n_name"].to_numpy()[order_n]))

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])
    nparts = max(2, min(8, int(ray.cluster_resources().get("CPU", 8)) - 2))
    j = li.join(orders.rename_columns({"o_orderkey": "l_orderkey"}),
                join_type="inner", num_partitions=nparts, on=("l_orderkey",))

    def per_cust(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"o_custkey": batch["o_custkey"].to_numpy(
            zero_copy_only=False), "revenue": price * (1.0 - disc)})
        g = df.groupby("o_custkey", as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from metis_ray.pipelines.dedup import _nonempty_blocks
    partial = j.map_batches(per_cust, batch_format="pyarrow")
    partial, _ = _nonempty_blocks(partial)   # joins can emit empty blocks
    if partial is None:
        return rd.from_arrow(pa.schema([("n_name", pa.string()),
                                        ("revenue", pa.float64())])
                             .empty_table())
    j2 = partial.join(cust.rename_columns({"c_custkey": "o_custkey"}),
                      join_type="inner", num_partitions=nparts,
                      on=("o_custkey",))

    def stage(batch: pa.Table) -> pa.Table:
        nk, nm = ray.get(nref)
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(nk, cn)
        idx = np.minimum(idx, len(nk) - 1)
        if not (nk[idx] == cn).all():       # broken referential integrity
            raise KeyError("c_nationkey not present in nation table")
        df = pd.DataFrame({"n_name": nm[idx],
                           "revenue": batch["revenue"].to_numpy(
                               zero_copy_only=False)})
        g = df.groupby("n_name", as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (j2.map_batches(stage, batch_format="pyarrow")
           .groupby("n_name").aggregate(Sum("revenue", alias_name="revenue")))
    return _round2(agg, ["revenue"])


def nations_per_region(sf_dir: str) -> rd.Dataset:
    """Small-dim join: nation x region -> (r_name, n_nations)."""
    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    region = read_table(sf_dir, "region", columns=["r_regionkey", "r_name"])
    j = nation.join(region.rename_columns({"r_regionkey": "n_regionkey"}),
                    join_type="inner", num_partitions=2, on=("n_regionkey",))
    return j.groupby("r_name").aggregate(Count(alias_name="n_nations"))


def top_parts(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """sort + limit: k most expensive parts."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_retailprice"])
    df = part.sort(["p_retailprice", "p_partkey"],
                   descending=[True, False]).limit(k).to_pandas()
    df["p_retailprice"] = df["p_retailprice"].round(2)
    return df


def distinct_segments(sf_dir: str) -> pd.DataFrame:
    """distinct: customer market segments, sorted."""
    cust = read_table(sf_dir, "customer", columns=["c_mktsegment"])
    vals = sorted(cust.unique("c_mktsegment"))
    return pd.DataFrame({"c_mktsegment": vals})


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Hash-shuffle ANTI-join (``left_anti``): customers with no order.
    The shuffle shape — neither side is collected or broadcast, so it holds
    when the distinct-customer set outgrows one node (the broadcast-set
    variant caps there). Output (c_custkey), returned as a typed DataFrame
    so an empty result keeps its schema (zero-row Ray datasets can be
    schema-less)."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    okeys = read_table(sf_dir, "orders", columns=["o_custkey"]).rename_columns(
        {"o_custkey": "c_custkey"})
    nparts = max(2, min(8, int(ray.cluster_resources().get("CPU", 8)) - 2))
    res = cust.join(okeys, join_type="left_anti", num_partitions=nparts,
                    on=("c_custkey",))
    df = res.to_pandas()
    if "c_custkey" not in df.columns:
        df = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return df


def customers_with_orders(sf_dir: str) -> pd.DataFrame:
    """Hash-shuffle SEMI-join (``left_semi`` — the EXISTS shape, completing
    the join family next to the anti above): customers that placed at
    least one order, each emitted once regardless of order count — the
    property an inner join + dedup would need a second shuffle for.
    Output (c_custkey)."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    okeys = read_table(sf_dir, "orders", columns=["o_custkey"]).rename_columns(
        {"o_custkey": "c_custkey"})
    nparts = max(2, min(8, int(ray.cluster_resources().get("CPU", 8)) - 2))
    res = cust.join(okeys, join_type="left_semi", num_partitions=nparts,
                    on=("c_custkey",))
    df = res.to_pandas()
    if "c_custkey" not in df.columns:
        df = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return df


def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling-window aggregate (streaming-shaped): events bucketed to the
    hour per event_type. (event_type, hour, n_events, sum_value). ``hour`` is
    epoch-hours (int) so the SQL twin is exact."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])
    return _events_hourly_agg(ev)


_EVENTS_SCHEMA = pa.schema([
    ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
    ("user_id", pa.int64()), ("event_type", pa.string()),
    ("value", pa.float64()), ("props", pa.string())])


def events_hourly_csv(sf_dir: str) -> rd.Dataset:
    """The S8/S9 CSV interchange proof: land the events table as CSV,
    read it back with the explicit schema (``sources/csvio.py``), run the
    hourly aggregate with EXACT integer-cent sums — the DuckDB twin runs
    over the PARQUET view, so a hash match certifies the CSV round trip
    lost nothing (timestamps to the microsecond, doubles to the bit;
    integer sums are block-order-free, unlike the float sums of
    ``events_hourly`` whose bit pattern would depend on the CSV block
    split)."""
    from metis_ray.sources.csvio import csv_roundtrip_table
    ev = csv_roundtrip_table(sf_dir, "events", _EVENTS_SCHEMA)

    def prep(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000))
        cents = pc.cast(pc.round(pc.multiply(batch["value"],
                                             pa.scalar(100.0))),
                        pa.int64())
        return pa.table({"event_type": batch["event_type"],
                         "hour": pc.cast(hour, pa.int64()),
                         "cents": cents})

    return (ev.select_columns(["ts", "event_type", "value"])
            .map_batches(prep, batch_format="pyarrow")
            .groupby(["event_type", "hour"])
            .aggregate(Count(alias_name="n_events"),
                       Sum("cents", alias_name="sum_cents")))


def _events_hourly_agg(ev: rd.Dataset) -> rd.Dataset:
    def prep(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())       # microseconds since epoch
        hour = pc.divide(us, pa.scalar(3_600_000_000))
        return pa.table({"event_type": batch["event_type"],
                         "hour": pc.cast(hour, pa.int64()),
                         "value": batch["value"]})

    agg = (ev.map_batches(prep, batch_format="pyarrow")
           .groupby(["event_type", "hour"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("value", alias_name="sum_value")))
    return _round2(agg, ["sum_value"])


def events_sliding(sf_dir: str, *, size_hours: int = 2,
                   hop_hours: int = 1) -> rd.Dataset:
    """HOPPING (sliding) window aggregate: windows of ``size_hours`` every
    ``hop_hours``; each event fans out to the size/hop windows covering it
    inside map_batches (the replication IS the window assignment — no
    self-join), then one grouped aggregate.
    (event_type, window_start_hour, n_events, sum_value)."""
    ev = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])
    # ceil: when hop does not divide size (size=3, hop=2) the extra
    # candidate window is still generated; the `keep` mask trims windows
    # that don't actually cover the event
    n_win = -(-size_hours // hop_hours)

    def fanout(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        base = (hour // hop_hours) * hop_hours
        reps = np.repeat(np.arange(batch.num_rows), n_win)
        offs = np.tile(np.arange(n_win, dtype=np.int64) * hop_hours,
                       batch.num_rows)
        starts = base[reps] - offs
        # a window starting at s covers [s, s+size): keep rows where true
        keep = (hour[reps] >= starts) & (hour[reps] < starts + size_hours)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": pa.array(et[reps][keep]),
            "window_start_hour": pa.array(starts[keep], pa.int64()),
            "value": pa.array(val[reps][keep], pa.float64()),
        })

    agg = (ev.map_batches(fanout, batch_format="pyarrow")
           .groupby(["event_type", "window_start_hour"])
           .aggregate(Count(alias_name="n_events"),
                      Sum("value", alias_name="sum_value")))
    return _round2(agg, ["sum_value"])


def events_with_prev(sf_dir: str) -> rd.Dataset:
    """Per-key ordered LAG (as-of/window shape): for each event, the previous
    value of the same user by ts. Expressed as groupby(user).map_groups over
    ts-sorted groups — the documented ordering assumption is 'ts unique per
    user', which holds for the generated events table.
    Output (event_id, user_id, prev_value) with -1.0 for the first event."""
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "value"])

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        out = pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "prev_value": g["value"].shift(1).fillna(-1.0).round(2),
        })
        return out

    return ev.groupby("user_id").map_groups(lag, batch_format="pandas")


def events_running_total(sf_dir: str) -> rd.Dataset:
    """Per-key CUMULATIVE window (SUM OVER PARTITION BY key ORDER BY ts):
    each user's running cent total in time order — the unbounded-preceding
    frame completing the window family (tumbling/sliding/session/lag).
    Hash-partition by user, per-group vectorized cumsum over the ts-sorted
    group — no global sort, no driver state; cents keep the running sums
    integer-exact against the HUGEINT window twin.
    Output (event_id, user_id, cum_cents)."""
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "value"])

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        cents = np.rint(g["value"].to_numpy(np.float64) * 100
                        ).astype(np.int64)
        return pd.DataFrame({
            "event_id": g["event_id"],
            "user_id": g["user_id"],
            "cum_cents": np.cumsum(cents),
        })

    return ev.groupby("user_id").map_groups(cum, batch_format="pandas")


def orders_recent_status(sf_dir: str, *, since: str = "2000-01-01",
                         ) -> rd.Dataset:
    """Status counts + cent-exact totals over orders at or after
    ``since`` — with the predicate pushed INTO the parquet scan
    (``filter=`` rides pyarrow's dataset scanner, so row groups whose
    min/max statistics exclude the range never leave storage; the
    SURVEY "prune at the read" rule applied to ROWS, not just columns).
    Output (o_orderstatus, n_orders, sum_cents)."""
    import datetime as _dt

    import pyarrow.dataset as _pads

    cutoff = _dt.datetime.fromisoformat(since)
    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderstatus", "o_totalprice", "o_orderdate"],
        filter=_pads.field("o_orderdate") >= pa.scalar(
            cutoff, pa.timestamp("us")))

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderstatus": batch["o_orderstatus"],
            "cents": pc.cast(pc.round(pc.multiply(
                batch["o_totalprice"], pa.scalar(100.0))), pa.int64())})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("o_orderstatus")
            .aggregate(Count(alias_name="n_orders"),
                       Sum("cents", alias_name="sum_cents")))


def events_retention(sf_dir: str, *, cohort_type: str = "signup",
                     ) -> rd.Dataset:
    """Cohort retention: users are cohorted by the epoch-WEEK of their
    first ``cohort_type`` event; for each (cohort_week, week_offset k)
    count the distinct cohort members active (any event) in week
    cohort+k. The classic product-analytics retention triangle. Output
    (cohort_week, week_offset, users), k >= 0.

    Scale shape: the cohort table is one groupby(user).min over the
    FILTERED signup pass; attaching cohorts to events is one hash join;
    distinct-user counting is a (cohort, k, user) dedup groupby followed
    by a (cohort, k) count — the same two-shuffle shape as exact
    count-distinct everywhere else. Nothing visits the driver."""
    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks

    ev = read_table(sf_dir, "events",
                    columns=["ts", "user_id", "event_type"])
    wk = 7 * 24 * 3_600_000_000          # a week in microseconds

    def first_touch(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["event_type"],
                                  pa.scalar(cohort_type)))
        return pa.table({"user_id": t["user_id"], "_ts": t["ts"]})

    cohorts = (ev.map_batches(first_touch, batch_format="pyarrow")
               .groupby("user_id").aggregate(Min("_ts", alias_name="_t0")))
    cohorts, n = _nonempty_blocks(cohorts)
    if cohorts is None or n == 0:
        return rd.from_arrow(pa.table({
            "cohort_week": pa.array([], pa.int64()),
            "week_offset": pa.array([], pa.int64()),
            "users": pa.array([], pa.int64())}))

    j = ev.select_columns(["ts", "user_id"]).join(
        cohorts, join_type="inner", num_partitions=_join_parts(),
        on=("user_id",))

    def weeks(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())
        t0 = pc.cast(batch["_t0"], pa.int64())
        cw = pc.divide(t0, pa.scalar(wk))
        k = pc.subtract(pc.divide(us, pa.scalar(wk)), cw)
        t = pa.table({"cohort_week": pc.cast(cw, pa.int64()),
                      "week_offset": pc.cast(k, pa.int64()),
                      "user_id": batch["user_id"]})
        t = t.filter(pc.greater_equal(t["week_offset"], 0))
        return t.group_by(
            ["cohort_week", "week_offset", "user_id"]).aggregate([])

    distinct = (j.map_batches(weeks, batch_format="pyarrow")
                .groupby(["cohort_week", "week_offset", "user_id"])
                .aggregate(Count(alias_name="_n")))
    return (distinct.groupby(["cohort_week", "week_offset"])
            .aggregate(Count(alias_name="users")))


def events_transitions(sf_dir: str) -> rd.Dataset:
    """Markov transition matrix of the event stream: global counts of
    consecutive (prev_type -> event_type) pairs within each user's
    ts-ordered sequence — the sequence-mining twin of the funnel (which
    counts a FIXED path; this counts every adjacent pair). Output
    (prev_type, event_type, n).

    Scale shape: per-user pair extraction is a ``groupby(user)``
    ``map_groups`` that emits PARTIAL (prev, type) counts (<= |types|^2
    rows per user, usually far fewer), then one tiny
    ``groupby(prev, type).sum`` — the second shuffle moves at most
    |types|^2 * blocks rows regardless of event count. Ordering
    assumption: ts unique per user (same contract as
    ``events_with_prev``). Reference analogue: the expected-record-
    sequence checks of the reference's per-stream state machines
    (SURVEY.md §2.3 T5) — here the transition structure is LEARNED by
    counting instead of asserted."""
    ev = read_table(sf_dir, "events",
                    columns=["ts", "user_id", "event_type"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        t = g["event_type"].to_numpy()
        if len(t) < 2:
            return pd.DataFrame({"prev_type": pd.Series([], dtype=str),
                                 "event_type": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        out = (pd.DataFrame({"prev_type": t[:-1], "event_type": t[1:]})
               .groupby(["prev_type", "event_type"], as_index=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return out

    partial = ev.groupby("user_id").map_groups(pairs, batch_format="pandas")
    return (partial.groupby(["prev_type", "event_type"])
            .aggregate(Sum("n", alias_name="n")))


def events_sessionize(sf_dir: str, *, gap_minutes: int = 30) -> rd.Dataset:
    """Session windows (streaming-shaped): per user, a new session starts
    when the gap to the previous event exceeds ``gap_minutes``. Grouped
    per-session rollup (user_id, session_id, n_events, sum_value).
    Ordering assumption: ts strictly increasing per user within the table
    (holds for the generated events). The reference's positional brackets
    (PIR..PRR part windows, ``stdf2ph5.py:390-420``) are the analogous
    'window by ordered scan' semantics."""
    ev = read_table(sf_dir, "events", columns=["ts", "user_id", "value"])
    gap_us = gap_minutes * 60_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        us = g["ts"].astype("int64")
        brk = (us.diff().fillna(gap_us + 1) > gap_us).astype("int64")
        sid = brk.cumsum()
        out = pd.DataFrame({"user_id": g["user_id"], "session_id": sid,
                            "value": g["value"]})
        return out.groupby(["user_id", "session_id"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))

    # rounding happens in a FINAL Arrow pass (pc.round, like every green
    # aggregate) — pandas .round inside map_groups is ULP-different from the
    # oracle's round() on boundary values
    grouped = ev.groupby("user_id").map_groups(sessions, batch_format="pandas")
    return _round2(grouped, ["sum_value"])


def orders_last_event(sf_dir: str) -> rd.Dataset:
    """AS-OF JOIN: for each order, the user's latest event at or before the
    order date. The portable Ray Data shape (per the as-of pattern): tag both
    sides, union on a common schema, hash-partition by key, per-key ordered
    merge inside map_groups (events processed before orders at equal ts so
    ties count). Output (o_orderkey, last_event_ts, last_event_value) with
    -1 sentinels when no prior event exists (keeps the column non-null so the
    SQL twin hashes identically)."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    events = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t["o_custkey"], pa.int64()),
            "ts": pc.cast(t["o_orderdate"], pa.int64()),
            "tag": pa.array(np.ones(t.num_rows, np.int8)),
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "value": pa.array(np.full(t.num_rows, np.nan), pa.float64()),
        })

    def tag_events(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t["user_id"], pa.int64()),
            "ts": pc.cast(t["ts"], pa.int64()),
            "tag": pa.array(np.zeros(t.num_rows, np.int8)),
            "o_orderkey": pa.array(np.full(t.num_rows, -1), pa.int64()),
            "value": t["value"],
        })

    u = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        events.map_batches(tag_events, batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized as-of: per key, the order's match is the last event at
        # or before its ts — np.searchsorted(right)-1 over ts-sorted events
        tag = g["tag"].to_numpy()
        ts = g["ts"].to_numpy(np.int64)
        ev_ts = np.sort(ts[tag == 0])
        ev_val = g["value"].to_numpy()[tag == 0][np.argsort(ts[tag == 0],
                                                            kind="stable")]
        o_ts = ts[tag == 1]
        o_key = g["o_orderkey"].to_numpy(np.int64)[tag == 1]
        if len(ev_ts) == 0:     # key has orders but no events: all sentinels
            out_ts = np.full(len(o_ts), -1, np.int64)
            out_val = np.full(len(o_ts), -1.0)
        else:
            idx = np.searchsorted(ev_ts, o_ts, side="right") - 1
            hit = idx >= 0
            out_ts = np.where(hit, ev_ts[np.maximum(idx, 0)], -1)
            out_val = np.where(hit, np.round(ev_val[np.maximum(idx, 0)], 2), -1.0)
        return pd.DataFrame({"o_orderkey": o_key,
                             "last_event_ts": out_ts.astype(np.int64),
                             "last_event_value": out_val})

    return u.groupby("key").map_groups(merge, batch_format="pandas")


def events_last_order(sf_dir: str) -> rd.Dataset:
    """AS-OF JOIN, positive direction for this dataset: for each event, the
    user's most recent order at or before the event time (events are dated
    after the orders, so nearly every event has a match — exercises the
    carry-forward branch the other direction can't). Output
    (event_id, last_order_key, last_order_total)."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate",
                                 "o_totalprice"])
    events = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t["o_custkey"], pa.int64()),
            "ts": pc.cast(t["o_orderdate"], pa.int64()),
            "tag": pa.array(np.zeros(t.num_rows, np.int8)),
            "rid": pc.cast(t["o_orderkey"], pa.int64()),
            "val": t["o_totalprice"],
        })

    def tag_events(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t["user_id"], pa.int64()),
            "ts": pc.cast(t["ts"], pa.int64()),
            "tag": pa.array(np.ones(t.num_rows, np.int8)),
            "rid": pc.cast(t["event_id"], pa.int64()),
            "val": pa.array(np.full(t.num_rows, np.nan), pa.float64()),
        })

    u = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        events.map_batches(tag_events, batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized as-of, <= semantics: orders sorted by (ts, o_orderkey)
        # so searchsorted(right)-1 lands on the largest o_orderkey among
        # equal-ts orders (the SQL twin's ORDER BY ts DESC, o_orderkey DESC
        # LIMIT 1)
        tag = g["tag"].to_numpy()
        ts = g["ts"].to_numpy(np.int64)
        rid = g["rid"].to_numpy(np.int64)
        o_ts, o_key = ts[tag == 0], rid[tag == 0]
        order = np.lexsort((o_key, o_ts))
        o_ts, o_key = o_ts[order], o_key[order]
        o_val = g["val"].to_numpy()[tag == 0][order]
        e_ts, e_id = ts[tag == 1], rid[tag == 1]
        if len(o_ts) == 0:      # key has events but no orders: all sentinels
            out_k = np.full(len(e_ts), -1, np.int64)
            out_v = np.full(len(e_ts), -1.0)
        else:
            idx = np.searchsorted(o_ts, e_ts, side="right") - 1
            hit = idx >= 0
            out_k = np.where(hit, o_key[np.maximum(idx, 0)], -1)
            out_v = np.where(hit, np.round(o_val[np.maximum(idx, 0)], 2), -1.0)
        return pd.DataFrame({"event_id": e_id,
                             "last_order_key": out_k.astype(np.int64),
                             "last_order_total": out_v})

    return u.groupby("key").map_groups(merge, batch_format="pandas")


def events_approx_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct users per event type via a mergeable HLL sketch:
    one 4KB register array per (batch, type) partial, merged per type —
    shuffle bytes independent of cardinality (the sketch pattern for 100 TB
    aggregation). Output (event_type, approx_users). Accuracy ~2% at
    2^12 registers (tested vs exact within 5%)."""
    from metis_ray.functions.sketch import (hll_add_values, hll_estimate,
                                            hll_merge, hll_new)
    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-side group split: sort by type once, slice register runs
        idx = pc.sort_indices(batch["event_type"])
        et = batch["event_type"].take(idx).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].take(idx).to_numpy(zero_copy_only=False)
        cuts = np.flatnonzero(np.concatenate(([True], et[1:] != et[:-1])))
        bounds = np.append(cuts, len(et))
        types = [str(et[c]) for c in cuts]
        regs = [hll_add_values(hll_new(), uid[lo:hi]).tobytes()
                for lo, hi in zip(bounds[:-1], bounds[1:])]
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "reg": pa.array(regs, pa.large_binary())})

    def final(g: pa.Table) -> pa.Table:
        reg = hll_new()
        for b in g["reg"].to_pylist():
            reg = hll_merge(reg, np.frombuffer(b, dtype=np.uint8))
        return pa.table({
            "event_type": pa.array([g["event_type"][0].as_py()], pa.string()),
            "approx_users": pa.array([int(round(hll_estimate(reg)))],
                                     pa.int64())})

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type").map_groups(final, batch_format="pyarrow")
            .to_pandas().sort_values("event_type").reset_index(drop=True))


def orders_status_counts(sf_dir: str) -> rd.Dataset:
    """Grouped counting (the reference's rec_count per record type,
    ``stdf2ph5.py:385-388``): orders per status. (o_orderstatus, n)."""
    orders = read_table(sf_dir, "orders", columns=["o_orderstatus"])
    return orders.groupby("o_orderstatus").aggregate(Count(alias_name="n"))


def part_brand_stats(sf_dir: str) -> rd.Dataset:
    """Multi-aggregate: per brand min/max/avg retail price + count."""
    part = read_table(sf_dir, "part", columns=["p_brand", "p_retailprice"])
    agg = part.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Min("p_retailprice", alias_name="min_price"),
        Max("p_retailprice", alias_name="max_price"),
        Mean("p_retailprice", alias_name="avg_price"))
    return _round2(agg, ["min_price", "max_price", "avg_price"])


def part_top2_per_brand(sf_dir: str, *, k: int = 2) -> rd.Dataset:
    """Windowed top-k per group (ROW_NUMBER shape): the k most expensive
    parts per brand, ties by partkey ascending. Hash-partition by brand,
    per-group vectorized sort+head — no global sort, no driver collect.
    (p_brand, p_partkey, p_retailprice, rnk)."""
    part = read_table(sf_dir, "part",
                      columns=["p_brand", "p_partkey", "p_retailprice"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_retailprice", "p_partkey"],
                          ascending=[False, True]).head(k).copy()
        g["p_retailprice"] = g["p_retailprice"].round(2)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return part.groupby("p_brand").map_groups(topk, batch_format="pandas")


def part_brand_median(sf_dir: str) -> rd.Dataset:
    """Grouped exact median (the holistic aggregate a combiner can't
    pre-reduce — hash-partition by key, per-group exact computation).
    (p_brand, median_price)."""
    part = read_table(sf_dir, "part", columns=["p_brand", "p_retailprice"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_brand": [g["p_brand"].iloc[0]],
            "median_price": [round(float(g["p_retailprice"].median()), 2)],
        })

    return part.groupby("p_brand").map_groups(med, batch_format="pandas")


def lineitem_corr_stats(sf_dir: str) -> pd.DataFrame:
    """Grouped SECOND-ORDER aggregates (SURVEY §2.5 widened past
    sum/mean): Pearson correlation, sample covariance and the
    least-squares slope/intercept of quantity vs extended price per
    return flag. (l_returnflag, n_rows, corr_qty_price, covar_qty_price,
    regr_slope, regr_intercept); price in cents.

    Exactness contract: x = quantity (int), y = price cents (int);
    per-batch partials accumulate the six moments (n, Σx, Σy, Σx²,
    Σy², Σxy) with int64 ``np.add.at`` (no float summation path), the
    Σy² lane split into 1e9 hi/lo halves so neither a batch partial nor
    the groupby-Sum total can overflow int64 (per-row y² ≤ 1e14; the
    unsplit corpus total passes 2^63 near sf1). One tiny groupby
    shuffle over k×batches moment rows; the driver reassembles exact
    Python-int moments and evaluates the SAME double expression as the
    DuckDB twin (which sums the identical integers in HUGEINT), so the
    6-dp rounding hashes identically."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])
    split = 1_000_000_000

    def partial(t: pa.Table) -> pa.Table:
        flags = np.asarray(t["l_returnflag"].to_pylist())
        x = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
        y = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * 100).astype(np.int64)
        uniq, codes = np.unique(flags, return_inverse=True)
        k = len(uniq)
        yy = y * y
        lanes = {"n": np.ones(len(x), np.int64), "sx": x, "sy": y,
                 "sxx": x * x, "syy_hi": yy // split, "syy_lo": yy % split,
                 "sxy": x * y}
        cols: dict = {"l_returnflag": pa.array(uniq.tolist(), pa.string())}
        for name, v in lanes.items():
            acc = np.zeros(k, np.int64)
            np.add.at(acc, codes, v)
            cols[name] = pa.array(acc, pa.int64())
        return pa.table(cols)

    agg = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("l_returnflag")
           .aggregate(*[Sum(c, alias_name=c) for c in
                        ("n", "sx", "sy", "sxx", "syy_hi", "syy_lo",
                         "sxy")]))
    rows = []
    for r in agg.to_pandas().itertuples():
        n, sx, sy = int(r.n), int(r.sx), int(r.sy)
        sxx, sxy = int(r.sxx), int(r.sxy)
        syy = int(r.syy_hi) * split + int(r.syy_lo)   # exact Python int
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if n < 2 or vx == 0 or vy == 0:
            corr = covar = slope = icept = float("nan")
        else:
            # mirror the twin's double expression term for term
            corr = float(num) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
            covar = float(num) / float(n * (n - 1))
            slope = float(num) / float(vx)
            icept = ((float(sy) * float(vx) - float(num) * float(sx))
                     / (float(n) * float(vx)))
        rows.append({"l_returnflag": r.l_returnflag, "n_rows": n,
                     "corr_qty_price": round(corr, 6),
                     "covar_qty_price": round(covar, 6),
                     "regr_slope": round(slope, 6),
                     "regr_intercept": round(icept, 6)})
    return (pd.DataFrame(rows).sort_values("l_returnflag")
            .reset_index(drop=True))


def supplier_customer_nation_union(sf_dir: str) -> rd.Dataset:
    """Set op (union + distinct): nation keys that appear as a supplier
    nation OR a customer nation. (nationkey,)."""
    sup = read_table(sf_dir, "supplier", columns=["s_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": pc.cast(t["s_nationkey"], pa.int64())}),
        batch_format="pyarrow")
    cus = read_table(sf_dir, "customer", columns=["c_nationkey"]).map_batches(
        lambda t: pa.table({"nationkey": pc.cast(t["c_nationkey"], pa.int64())}),
        batch_format="pyarrow")
    u = sup.union(cus)
    return (u.groupby("nationkey").aggregate(Count(alias_name="_n"))
            .drop_columns(["_n"]))


def events_value_quantiles(sf_dir: str, *, k: int = 256,
                           qs: tuple = (0.25, 0.5, 0.9, 0.99)) -> pd.DataFrame:
    """Approximate value quantiles per event type via a MERGEABLE quantile
    summary (deterministic weighted compress-merge, rank error <= levels/k):
    per-batch per-type partials of <= k (value, weight) points, merged and
    recompressed per type — the holistic-aggregate-at-scale twin of the HLL
    sketch (shuffle bytes independent of row count; partials fold in any
    tree shape). Output (event_type, p25, p50, p90, p99). Accuracy +
    merge-invariance tested in tests/test_sketch_asof.py."""
    from metis_ray.functions.sketch import (qsketch_compress, qsketch_merge,
                                            qsketch_query)
    ev = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:       # empty blocks: cuts=[0] would index et[0]
            return pa.table({"event_type": pa.array([], pa.string()),
                             "sk": pa.array([], pa.large_binary())})
        idx = pc.sort_indices(batch["event_type"])
        et = batch["event_type"].take(idx).to_numpy(zero_copy_only=False)
        val = batch["value"].take(idx).to_numpy(zero_copy_only=False)
        cuts = np.flatnonzero(np.concatenate(([True], et[1:] != et[:-1])))
        bounds = np.append(cuts, len(et))
        types, blobs = [], []
        for c, (lo, hi) in zip(cuts, zip(bounds[:-1], bounds[1:])):
            v, w = qsketch_compress(val[lo:hi], k=k)
            types.append(str(et[c]))
            blobs.append(np.concatenate([v, w]).tobytes())
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "sk": pa.array(blobs, pa.large_binary())})

    def final(g: pa.Table) -> pa.Table:
        sk = (np.empty(0), np.empty(0))
        for b in g["sk"].to_pylist():
            arr = np.frombuffer(b, dtype=np.float64)
            half = len(arr) // 2
            sk = qsketch_merge(sk, (arr[:half], arr[half:]), k)
        row = {"event_type": pa.array([g["event_type"][0].as_py()],
                                      pa.string())}
        for q in qs:
            row[f"p{int(q * 100)}"] = pa.array(
                [round(qsketch_query(sk, q), 6)], pa.float64())
        return pa.table(row)

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type").map_groups(final, batch_format="pyarrow")
            .to_pandas().sort_values("event_type").reset_index(drop=True))


def events_props_stats(sf_dir: str) -> rd.Dataset:
    """Semi-structured JSON extraction (SURVEY §2.2 M7 — the reference
    infers python types out of string columns at load): pull the integer
    field ``k`` out of the ``events.props`` JSON-object column and
    aggregate it per event type.

    The extraction is ONE C++ NDJSON parse per batch
    (``functions.json.json_field`` — no per-row ``json.loads``); the
    aggregate is Ray's partial-combine hash shuffle over 5 groups. All
    outputs are exact int64, so the DuckDB ``json_extract`` twin hashes
    identically."""
    from metis_ray.functions.json import json_field

    ev = read_table(sf_dir, "events", columns=["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "k": pa.array([], pa.int64())})
        return pa.table({
            "event_type": batch["event_type"],
            "k": json_field(batch["props"], "k", type=pa.int64())})

    out = (ev.map_batches(extract, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Count(alias_name="n"),
                      Sum("k", alias_name="sum_k"),
                      Min("k", alias_name="min_k"),
                      Max("k", alias_name="max_k")))

    def cast64(batch: pa.Table) -> pa.Table:
        if "n" not in batch.column_names:   # schema-less zero-row block
            return pa.schema(
                [("event_type", pa.string()), ("n", pa.int64()),
                 ("sum_k", pa.int64()), ("min_k", pa.int64()),
                 ("max_k", pa.int64())]).empty_table()
        for c in ("n", "sum_k", "min_k", "max_k"):
            batch = batch.set_column(batch.column_names.index(c), c,
                                     pc.cast(batch[c], pa.int64()))
        return batch

    return out.map_batches(cast64, batch_format="pyarrow")


def events_followup_window(sf_dir: str, *, minutes: int = 60) -> rd.Dataset:
    """RANGE (interval) JOIN: for each event, aggregate the SAME user's
    strictly-later events within ``(ts, ts + minutes]`` — the
    follow-up-activity burst. Output (event_id, n_follow, value_sum);
    events with no follow-up get (0, 0.0) — LEFT JOIN semantics.

    The portable Ray Data shape for inequality joins (same family as the
    as-of joins above): ONE hash partition by the equi-key (user), then a
    vectorized per-key interval probe inside ``map_groups`` — events
    ts-sorted once per key, each probe's window is two ``searchsorted``
    cuts, sums via ``np.add.reduceat`` over the sorted slice (both sides
    round to 2dp). Never an O(n²) per-user cross product in Python, and
    the only shuffle is the one groupby — at 100 TB the window inequality
    rides the equi-key partitioning for free. (Here probe and build side
    are the same table; a two-table range join tags + unions the sides
    first, exactly like ``orders_last_event``.)"""
    events = read_table(sf_dir, "events",
                        columns=["event_id", "user_id", "ts", "value"])
    span = np.int64(minutes) * 60_000_000           # timestamp[us] window

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["ts"].to_numpy(np.int64), kind="stable")
        ts = g["ts"].to_numpy(np.int64)[order]
        eid = g["event_id"].to_numpy(np.int64)[order]
        val = g["value"].to_numpy(np.float64)[order]
        lo = np.searchsorted(ts, ts, side="right")       # strictly later
        hi = np.searchsorted(ts, ts + span, side="right")  # inclusive end
        n = (hi - lo).astype(np.int64)
        sums = np.zeros(len(ts), np.float64)
        nz = n > 0
        if nz.any():
            # reduceat over [lo, hi) slices of the ts-sorted values; a
            # trailing 0-pad keeps hi == len(val) a valid index without
            # clipping the last event out of the window
            cuts = np.stack([lo[nz], hi[nz]], axis=1).ravel()
            seg = np.add.reduceat(np.append(val, 0.0), cuts)
            sums[nz] = seg[::2]
        return pd.DataFrame({"event_id": eid,
                             "n_follow": n,
                             "value_sum": np.round(sums, 2)})

    return events.groupby("user_id").map_groups(merge, batch_format="pandas")
