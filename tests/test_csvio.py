"""Lossless CSV source/sink (sources/csvio.py): bit-exact round trip of
the events table vs the parquet original."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_bit_exact(ray_session, tmp_path):
    from metis_ray.pipelines.relational import _EVENTS_SCHEMA
    from metis_ray.sources.csvio import csv_roundtrip_table
    got = (csv_roundtrip_table(SF, "events", _EVENTS_SCHEMA,
                               root=str(tmp_path))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    want = (pq.read_table(f"{SF}/events.parquet").to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    assert list(got.columns) == list(want.columns)
    for c in want.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(b.dtype, np.floating):
            assert np.array_equal(a, b, equal_nan=True), c   # bit-exact
        else:
            assert (a == b).all(), c


def test_csv_hourly_equals_parquet_recomputation(ray_session):
    """The CSV-path aggregate equals the same integer-cents aggregate
    recomputed straight from the parquet original (sequential pandas)."""
    from metis_ray.pipelines.relational import events_hourly_csv
    got = (events_hourly_csv(SF).to_pandas()
           .sort_values(["event_type", "hour"]).reset_index(drop=True))
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type", "value"]).to_pandas()
    ev["hour"] = ev["ts"].astype("int64") // 3_600_000_000
    ev["cents"] = np.round(ev["value"].to_numpy() * 100.0).astype(np.int64)
    want = (ev.groupby(["event_type", "hour"], as_index=False)
            .agg(n_events=("cents", "size"), sum_cents=("cents", "sum"))
            .sort_values(["event_type", "hour"]).reset_index(drop=True))
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["sum_cents"].tolist() == want["sum_cents"].tolist()
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["hour"].tolist() == want["hour"].tolist()


def test_csv_quoting_adversarial_roundtrip(ray_session, tmp_path):
    """M13 evidence: quotes, commas, newlines, unicode and empty strings
    survive the CSV round trip verbatim."""
    import ray.data as rd

    from metis_ray.sources.csvio import read_table_csv, write_table_csv
    vals = ['plain', 'comma, inside', 'quote " inside', "new\nline",
            '", tricky ""csv"" case\n,"', 'ünïcodé → 終わり', '',
            ' leading and trailing ']
    t = pa.table({"id": pa.array(list(range(len(vals))), pa.int64()),
                  "s": pa.array(vals, pa.string())})
    out = str(tmp_path / "adv")
    write_table_csv(rd.from_arrow(t), out)
    got = (read_table_csv(out, t.schema).to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert got["s"].tolist() == vals
