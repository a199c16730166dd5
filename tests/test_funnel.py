"""Ordered funnel (pipelines/funnel.py) vs the sequential transcription
and a DuckDB step-join twin, plus hand-checked edge cases."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _mk_events(n=3000, seed=21, types=("view", "click", "purchase",
                                       "signup", "error")):
    rng = np.random.RandomState(seed)
    ts = np.sort(rng.randint(0, 10_000_000, n)).astype("datetime64[us]")
    return pa.table({
        "user_id": pa.array(rng.randint(0, 120, n).astype(np.int64)),
        "event_type": pa.array([types[i] for i in
                                rng.randint(0, len(types), n)]),
        "ts": pa.array(ts, pa.timestamp("us"))})


def _got(t, steps, within_seconds=None):
    import ray.data as rd
    from metis_ray.pipelines.funnel import funnel
    out = funnel(rd.from_arrow(t), steps, within_seconds=within_seconds)
    d = out.to_pydict()
    return list(zip(d["step_idx"], d["step"], d["users"]))


def _ref(t, steps, within_seconds=None):
    from metis_ray.pipelines.funnel import funnel_reference
    rows = list(zip(t["user_id"].to_pylist(), t["event_type"].to_pylist(),
                    [int(x.value) for x in t["ts"]]))
    return funnel_reference(rows, steps, within_seconds=within_seconds)


def test_funnel_matches_reference():
    t = _mk_events()
    for steps, w in [(["view", "click", "purchase"], None),
                     (["signup", "view", "click", "purchase"], None),
                     (["view", "click", "purchase"], 3.0),
                     (["view", "view", "view"], None),
                     (["view", "nosuch", "click"], None)]:
        assert _got(t, steps, w) == _ref(t, steps, w), (steps, w)


def test_funnel_matches_duckdb():
    t = _mk_events(seed=8)
    got = _got(t, ["view", "click", "purchase"])
    con = duckdb.connect()
    con.register("e", t)
    (c1, c2, c3), = con.execute("""
        WITH s1 AS (
            SELECT user_id, min(ts) AS t1 FROM e
            WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, min(e.ts) AS t2 FROM e
            JOIN s1 USING (user_id)
            WHERE e.event_type = 'click' AND e.ts > s1.t1
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, min(e.ts) AS t3 FROM e
            JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM s1),
               (SELECT count(*) FROM s2),
               (SELECT count(*) FROM s3)""").fetchall()
    con.close()
    assert got == [(0, "view", c1), (1, "click", c2), (2, "purchase", c3)]


def test_funnel_strict_order_and_window():
    def ev(u, ty, sec):
        return (u, ty, sec * 1_000_000)
    rows = [
        # user 1: full funnel in order (c at 24 <= t1 + 15 = 25)
        ev(1, "a", 10), ev(1, "b", 20), ev(1, "c", 24),
        # user 2: b BEFORE a only -> stops after a
        ev(2, "b", 5), ev(2, "a", 10),
        # user 3: a and b at the SAME ts -> tie does not advance
        ev(3, "a", 10), ev(3, "b", 10),
        # user 4: b inside but c outside the 15 s window from t1
        ev(4, "a", 0), ev(4, "b", 5), ev(4, "c", 100),
        # user 5: picks the EARLIEST a (t1 = 0), so the later a at 50
        # can't rescue b/c at 55/60 under the window
        ev(5, "a", 0), ev(5, "a", 50), ev(5, "b", 55), ev(5, "c", 60),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array(np.array([r[2] for r in rows],
                                dtype="datetime64[us]"), pa.timestamp("us"))})
    # unwindowed: b reached by users 1, 4, 5 (user 3's tie blocked);
    # c by the same three
    assert _got(t, ["a", "b", "c"]) == [(0, "a", 5), (1, "b", 3),
                                        (2, "c", 3)]
    # 15 s window: b = users 1 (20 <= 25) and 4 (5 <= 15); c = user 1 only
    assert _got(t, ["a", "b", "c"], within_seconds=15.0) == \
        [(0, "a", 5), (1, "b", 2), (2, "c", 1)]
    assert _ref(t, ["a", "b", "c"], within_seconds=15.0) == \
        [(0, "a", 5), (1, "b", 2), (2, "c", 1)]


def test_funnel_empty_and_errors():
    import ray.data as rd
    from metis_ray.pipelines.funnel import funnel
    t = _mk_events(n=50)
    assert _got(t, ["nosuch", "view"]) == [(0, "nosuch", 0), (1, "view", 0)]
    with pytest.raises(ValueError, match="non-empty"):
        funnel(rd.from_arrow(t), [])


def test_retention_matches_sequential(ray_session):
    """Cohort retention vs a sequential per-user transcription."""
    import pyarrow.parquet as pq

    from metis_ray.pipelines.relational import events_retention
    SF = "/root/testdata/sf0.001"
    got = {(int(r.cohort_week), int(r.week_offset)): int(r.users)
           for r in events_retention(SF).to_pandas().itertuples()}

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "user_id", "event_type"]).to_pandas()
    ev["week"] = ev["ts"].astype("int64") // (7 * 24 * 3_600_000_000)
    first = (ev[ev["event_type"] == "signup"]
             .groupby("user_id")["week"].min())
    want: dict = {}
    for u, wk, in ev[["user_id", "week"]].itertuples(index=False):
        if u not in first.index:
            continue
        k = int(wk - first[u])
        if k < 0:
            continue
        want.setdefault((int(first[u]), k), set()).add(int(u))
    want = {key: len(s) for key, s in want.items()}
    assert got == want
    # retention never exceeds the cohort size (k=0 row)
    for (cw, k), n in got.items():
        assert n <= got[(cw, 0)]
