"""Ordered funnel analysis over an event stream.

The classic product-analytics / sequence-mining query: of the users who
did step 1, how many went on to do step 2 AFTER it, then step 3 after
that — optionally all within a time window of the first step. First-touch
semantics (the standard, and the one that is order-free to compute):
t1 = the user's EARLIEST step-1 event; t_k = the earliest step-k event
STRICTLY after t_{k-1} (and <= t1 + within, when a window is given).

Reference analogue: the reference's per-record state machines advance
through an expected record sequence per stream (SURVEY.md §2.3 scope
brackets / T5 stream state); here the "stream" is each user's event
subsequence and the state is the funnel stage reached.

Scale shape (the 100 TB contract): NO per-user loop and NO whole-user
grouping — step k is one filtered column-pruned pass over the event
table (only step-k events survive the filter) hash-joined against the
step-(k-1) frontier (user_id, t_{k-1}[, t1]) followed by a
groupby(user).min, so each stage is a filter + join + aggregate over
ONLY the relevant events; the frontier shrinks monotonically. K stages
= K such passes, K is small and fixed. Nothing visits the driver but
the final per-step counts.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Min


def funnel(events: rd.Dataset, steps: list[str], *,
           within_seconds: float | None = None,
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts") -> pa.Table:
    """Count users reaching each funnel stage (see module docstring for
    the exact first-touch rule). Returns (step_idx, step, users) with one
    row per step, step_idx 0-based. ``within_seconds`` bounds every later
    step to t1 + window (inclusive); steps must be non-empty and each
    user's events may hold duplicates/ties freely — strict ``>`` ordering
    means a tie at the same timestamp does NOT advance the funnel."""
    from metis_ray.pipelines.dedup import _join_parts, _nonempty_blocks

    if not steps:
        raise ValueError("steps must be non-empty")
    parts = _join_parts()
    ev = events.select_columns([user_col, type_col, ts_col])

    counts: list[int] = []
    frontier = None          # Dataset (user_id, t_prev[, t1]) or None
    for k, step in enumerate(steps):

        def only(batch: pa.Table, _s=step) -> pa.Table:
            t = batch.filter(pc.equal(batch[type_col], _s))
            return pa.table({user_col: t[user_col], "_ts": t[ts_col]})

        stage = ev.map_batches(only, batch_format="pyarrow")
        stage, _ = _nonempty_blocks(stage)
        if k == 0:
            if stage is None:
                counts.extend([0] * len(steps))
                break
            frontier = (stage.groupby(user_col)
                        .aggregate(Min("_ts", alias_name="_t")))
            if within_seconds is not None:
                frontier = frontier.map_batches(
                    lambda t: t.append_column("_t1", t["_t"]),
                    batch_format="pyarrow")
        else:
            if stage is None or frontier is None:
                counts.extend([0] * (len(steps) - k))
                frontier = None
                break
            j = stage.join(frontier, join_type="inner",
                           num_partitions=parts, on=(user_col,))
            j, _ = _nonempty_blocks(j)
            if j is None:
                counts.extend([0] * (len(steps) - k))
                frontier = None
                break

            def advance(batch: pa.Table,
                        _w=within_seconds) -> pa.Table:
                m = pc.greater(batch["_ts"], batch["_t"])
                if _w is not None:
                    lim = pc.add(batch["_t1"],
                                 pa.scalar(int(_w * 1_000_000),
                                           pa.duration("us")))
                    m = pc.and_(m, pc.less_equal(batch["_ts"], lim))
                t = batch.filter(m)
                cols = {user_col: t[user_col], "_ts": t["_ts"]}
                if _w is not None:
                    cols["_t1"] = t["_t1"]
                return pa.table(cols)

            nxt = j.map_batches(advance, batch_format="pyarrow")
            nxt, _ = _nonempty_blocks(nxt)
            if nxt is None:
                counts.extend([0] * (len(steps) - k))
                frontier = None
                break
            if within_seconds is not None:
                # _t1 is constant per user: Min() re-carries it through
                # the aggregate without a composite timestamp group key
                frontier = (nxt.groupby(user_col)
                            .aggregate(Min("_ts", alias_name="_t"),
                                       Min("_t1", alias_name="_t1")))
            else:
                frontier = (nxt.groupby(user_col)
                            .aggregate(Min("_ts", alias_name="_t")))
        counts.append(frontier.count())
        frontier, _ = _nonempty_blocks(frontier)

    return pa.table({
        "step_idx": pa.array(list(range(len(steps))), pa.int64()),
        "step": pa.array(list(steps), pa.string()),
        "users": pa.array(counts, pa.int64())})


def funnel_reference(rows: list[tuple], steps: list[str], *,
                     within_seconds: float | None = None) -> list[tuple]:
    """Sequential transcription over (user, type, ts_micros) tuples (the
    pytest golden): same first-touch / strict-after / inclusive-window
    rule. Returns [(step_idx, step, users)]."""
    by_user: dict = {}
    for u, ty, ts in rows:
        by_user.setdefault(u, []).append((int(ts), ty))
    counts = [0] * len(steps)
    for u, evs in by_user.items():
        evs.sort()
        t_prev = None
        t1 = None
        for k, step in enumerate(steps):
            cand = [t for t, ty in evs if ty == step
                    and (t_prev is None or t > t_prev)
                    and (within_seconds is None or k == 0
                         or t <= t1 + within_seconds * 1_000_000)]
            if not cand:
                break
            t_prev = min(cand)
            if k == 0:
                t1 = t_prev
            counts[k] += 1
    return [(i, s, counts[i]) for i, s in enumerate(steps)]
