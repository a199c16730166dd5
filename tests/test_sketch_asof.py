"""HLL sketch accuracy + as-of join vs an independent pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from metis_ray.functions.sketch import (hll_add_values, hll_estimate,
                                        hll_merge, hll_new)
from metis_ray.pipelines.relational import events_approx_users, orders_last_event

SF = "/root/testdata/sf0.001"


def test_hll_accuracy_and_mergeability():
    rng = np.random.RandomState(3)
    for true_n in (50, 1_000, 20_000):
        vals = rng.randint(0, 1 << 60, size=true_n * 3) % (1 << 59)
        vals = np.unique(vals)[:true_n]
        # split across 4 "batches", merge the partials
        regs = [hll_add_values(hll_new(), chunk)
                for chunk in np.array_split(vals, 4)]
        merged = regs[0]
        for r in regs[1:]:
            merged = hll_merge(merged, r)
        est = hll_estimate(merged)
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)
        # merge order must not matter
        alt = regs[3]
        for r in regs[:3]:
            alt = hll_merge(alt, r)
        assert (alt == merged).all()


def test_events_approx_users_vs_exact():
    got = events_approx_users(SF).set_index("event_type")["approx_users"]
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    exact = ev.groupby("event_type")["user_id"].nunique()
    for et, n in exact.items():
        assert abs(got[et] - n) / max(1, n) < 0.05, (et, n, got[et])


def test_orders_last_event_vs_pandas_oracle():
    got = orders_last_event(SF).to_pandas().set_index("o_orderkey")
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    events = pq.read_table(f"{SF}/events.parquet").to_pandas()
    events["ts_us"] = events["ts"].astype("int64")
    by_user = {u: g.sort_values("ts_us") for u, g in events.groupby("user_id")}
    for _, o in orders.sample(200, random_state=1).iterrows():
        cutoff = pd.Timestamp(o["o_orderdate"]).value // 1000
        g = by_user.get(o["o_custkey"])
        prior = g[g["ts_us"] <= cutoff] if g is not None else None
        row = got.loc[o["o_orderkey"]]
        if prior is None or len(prior) == 0:
            assert row["last_event_ts"] == -1
        else:
            assert row["last_event_ts"] == prior["ts_us"].iloc[-1]
            assert row["last_event_value"] == round(prior["value"].iloc[-1], 2)


def test_asof_positive_branch_planted(tmp_path):
    """Constructed overlapping-time tables so the carry-forward branch is
    exercised with known answers (pandas merge_asof oracle)."""
    import os
    import pyarrow as pa
    rng = np.random.RandomState(5)
    n_o, n_e = 200, 300
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_o),
        "o_custkey": rng.randint(0, 20, n_o),
        "o_orderdate": pd.to_datetime(rng.randint(0, 10**6, n_o), unit="s"),
        "o_totalprice": np.round(rng.uniform(10, 500, n_o), 2),
        "o_orderstatus": ["O"] * n_o,
        "o_orderpriority": ["1"] * n_o,
    })
    events = pd.DataFrame({
        "event_id": np.arange(n_e),
        "user_id": rng.randint(0, 20, n_e),
        "ts": pd.to_datetime(rng.randint(0, 10**6, n_e), unit="s"),
        "event_type": ["x"] * n_e,
        "value": np.round(rng.uniform(0, 10, n_e), 2),
        "props": ["{}"] * n_e,
    })
    d = str(tmp_path)
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   os.path.join(d, "orders.parquet"))
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                   os.path.join(d, "events.parquet"))

    from metis_ray.pipelines.relational import events_last_order
    got = events_last_order(d).to_pandas().set_index("event_id").sort_index()
    assert (got["last_order_key"] != -1).sum() > 100  # positive branch fires

    o = orders.sort_values(["o_orderdate", "o_orderkey"])
    for _, e in events.iterrows():
        cand = o[(o["o_custkey"] == e["user_id"]) &
                 (o["o_orderdate"] <= e["ts"])]
        row = got.loc[e["event_id"]]
        if len(cand) == 0:
            assert row["last_order_key"] == -1
        else:
            assert row["last_order_key"] == cand["o_orderkey"].iloc[-1]
            assert row["last_order_total"] == round(cand["o_totalprice"].iloc[-1], 2)


def test_qsketch_accuracy_and_merge_invariance():
    """Mergeable quantile summary: rank error <= ~1% at k=256 across any
    merge tree; merge order does not change the summary's answers beyond
    the same bound."""
    import numpy as np
    from metis_ray.functions.sketch import (qsketch_compress, qsketch_merge,
                                            qsketch_query)

    rng = np.random.RandomState(3)
    x = np.concatenate([rng.normal(size=120_000),
                        rng.exponential(size=30_000) * 10])
    rng.shuffle(x)

    def fold(chunks):
        sk = (np.empty(0), np.empty(0))
        for c in chunks:
            sk = qsketch_merge(sk, qsketch_compress(c))
        return sk

    linear = fold(np.array_split(x, 41))
    other = fold(np.array_split(x, 7)[::-1])
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        for sk in (linear, other):
            approx = qsketch_query(sk, q)
            rank_err = abs((x <= approx).mean() - q)
            assert rank_err < 0.015, (q, rank_err)


def test_events_value_quantiles_close_to_exact():
    """Pipeline answers within 2% rank error of exact per-type quantiles."""
    import numpy as np
    import pandas as pd
    from metis_ray.pipelines.relational import events_value_quantiles

    sf = "/root/testdata/sf0.001"
    got = events_value_quantiles(sf)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_type", "value"])
    for _, row in got.iterrows():
        vals = ev.loc[ev["event_type"] == row["event_type"], "value"].to_numpy()
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            rank_err = abs((vals <= row[col]).mean() - q)
            assert rank_err < 0.02, (row["event_type"], col, rank_err)
