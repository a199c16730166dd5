"""Exact distributed quantiles (pipelines/quantiles.py) vs numpy
percentile and DuckDB quantile_cont."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _got(vals, qs, repartition=7):
    import ray.data as rd
    from metis_ray.pipelines.quantiles import exact_quantiles
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(repartition)
    t = exact_quantiles(ds, "x", qs)
    return dict(zip(t["q"].to_pylist(), t["value"].to_pylist()))


def test_quantiles_match_numpy_and_duckdb():
    rng = np.random.RandomState(77)
    v = np.round(rng.normal(50, 20, 5000), 3)
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    got = _got(pa.array(v, pa.float64()), qs)
    for q in qs:
        assert got[q] == pytest.approx(
            float(np.percentile(v, q * 100)), rel=1e-12), q
    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(v, pa.float64())}))
    for q in qs:
        (want,) = con.execute(
            f"SELECT quantile_cont(x, {q}) FROM t").fetchone()
        assert got[q] == pytest.approx(want, rel=1e-12), q
    con.close()


def test_quantiles_drop_nulls_and_nans():
    v = [1.0, None, 2.0, float("nan"), 3.0, 4.0, None]
    got = _got(pa.array(v, pa.float64()), [0.5], repartition=3)
    assert got[0.5] == pytest.approx(2.5)     # median of 1,2,3,4


def test_quantiles_int_column_and_ties():
    v = pa.array([5, 5, 5, 1, 9, 5, 5], pa.int64())
    got = _got(v, [0.0, 0.5, 1.0], repartition=4)
    assert (got[0.0], got[0.5], got[1.0]) == (1.0, 5.0, 9.0)


def test_quantiles_empty_and_errors():
    import ray.data as rd
    from metis_ray.pipelines.quantiles import exact_quantiles
    got = _got(pa.array([], pa.float64()), [0.25, 0.75], repartition=2)
    assert got == {0.25: None, 0.75: None}
    ds = rd.from_arrow(pa.table({"x": pa.array([1.0])}))
    with pytest.raises(ValueError, match="non-empty"):
        exact_quantiles(ds, "x", [])
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        exact_quantiles(ds, "x", [1.5])
