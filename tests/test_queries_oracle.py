"""Driver-contract conformance: every oracle_sql() key has a queries() twin,
and the SQL twins match the Ray results at sf0.001 (the full sf0.01 sweep is
the driver's job; tools/parity.py runs it standalone)."""

import os

import duckdb
import pytest

import __ray_entry__ as entrymod
from tools.parity import TABLES, compare, to_pandas

SF = "/root/testdata/sf0.001"
os.environ["METIS_RAY_ORACLE_SF"] = SF   # golden-parquet oracles follow scale

SQL_KEYS = sorted(entrymod.oracle_sql())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_every_oracle_key_has_a_query():
    qs = entrymod.queries()
    missing = [k for k in SQL_KEYS if k not in qs]
    assert not missing


@pytest.mark.parametrize("name", SQL_KEYS)
def test_sql_parity(name, con):
    rdf = to_pandas(entrymod.queries()[name](SF))
    sdf = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    verdict = compare(name, rdf, sdf)
    # OK-INEXACT (allclose but not bit-equal floats) is tolerated here at
    # sf0.001; tools/parity.py at sf0.01 is where exactness is chased
    assert verdict.startswith("OK"), verdict


def test_q3_exact_under_adversarial_ties(tmp_path):
    """>50 orders tied at the k-th ROUNDED revenue: the distributed
    sort+limit must order by rounded revenue (no candidate-margin
    heuristic) and break ties by o_orderkey exactly like the SQL twin."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from metis_ray.pipelines.relational import q3_top_orders

    d = str(tmp_path)
    n = 120
    keys = list(range(1, n + 1))
    ts = pd.Timestamp("1995-01-01")
    pq.write_table(pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "c_mktsegment": pa.array(["BUILDING"] * n)}),
        os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(keys, pa.int64()),
        "o_custkey": pa.array(keys, pa.int64()),
        "o_orderdate": pa.array([ts] * n, pa.timestamp("us"))}),
        os.path.join(d, "orders.parquet"))
    # every order: identical revenue -> all 120 rows tie at the 10th value
    pq.write_table(pa.table({
        "l_orderkey": pa.array(keys, pa.int64()),
        "l_extendedprice": pa.array([100.0] * n, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64())}),
        os.path.join(d, "lineitem.parquet"))

    got = q3_top_orders(d, k=10)
    c = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{d}/{t}.parquet')")
    want = c.execute(entrymod.oracle_sql()["q3_top_orders"]).fetchdf()
    assert list(got["o_orderkey"]) == list(want["o_orderkey"]) == list(range(1, 11))
    assert compare("q3_ties", got, want).startswith("OK")


def test_events_sliding_non_divisible_hop():
    """size=3, hop=2 (hop does not divide size): every covering window must
    be emitted — ceil(size/hop) candidate windows per event, trimmed by the
    coverage mask. Brute-force oracle over the raw events table."""
    from collections import defaultdict

    import pandas as pd

    from metis_ray.pipelines.relational import events_sliding

    size, hop = 3, 2
    got = events_sliding(SF, size_hours=size, hop_hours=hop).to_pandas()
    ev = pd.read_parquet(os.path.join(SF, "events.parquet"),
                         columns=["ts", "event_type", "value"])
    hours = ev["ts"].astype("int64") // 3_600_000_000
    want = defaultdict(lambda: [0, 0.0])
    for h, et, v in zip(hours, ev["event_type"], ev["value"]):
        s = (h // hop) * hop
        while s > h - size:
            if s <= h < s + size:
                cell = want[(et, s)]
                cell[0] += 1
                cell[1] += v
            s -= hop
    gmap = {(et, int(w)): (int(n), round(sv, 2)) for et, w, n, sv in
            zip(got["event_type"], got["window_start_hour"],
                got["n_events"], got["sum_value"])}
    wmap = {k: (n, round(sv, 2)) for k, (n, sv) in want.items()}
    assert gmap == wmap
