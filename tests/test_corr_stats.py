"""Grouped second-order aggregates (relational.lineitem_corr_stats) vs an
independent pandas/numpy oracle — corr via DataFrame.corr, covariance via
DataFrame.cov, slope/intercept via np.polyfit — on the sf0.001 lineitem
table. The DuckDB-twin hash equality is covered by test_queries_oracle /
tools/parity.py; this oracle is deliberately a different code path."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_corr_stats_matches_pandas(ray_session):
    from metis_ray.pipelines.relational import lineitem_corr_stats

    got = lineitem_corr_stats(SF).set_index("l_returnflag")

    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    ).to_pandas()
    li["x"] = np.rint(li["l_quantity"]).astype(np.int64)
    li["y"] = np.rint(li["l_extendedprice"] * 100).astype(np.int64)

    for flag, g in li.groupby("l_returnflag"):
        row = got.loc[flag]
        assert int(row["n_rows"]) == len(g)
        assert row["corr_qty_price"] == pytest.approx(
            g["x"].corr(g["y"]), abs=1e-5)
        assert row["covar_qty_price"] == pytest.approx(
            g["x"].cov(g["y"]), rel=1e-9, abs=1e-5)
        slope, icept = np.polyfit(g["x"].to_numpy(np.float64),
                                  g["y"].to_numpy(np.float64), 1)
        assert row["regr_slope"] == pytest.approx(slope, abs=1e-4)
        assert row["regr_intercept"] == pytest.approx(icept, rel=1e-6,
                                                      abs=1e-2)


def test_corr_stats_moment_lanes_are_exact(ray_session, tmp_path):
    """Adversarial magnitude probe: a synthetic lineitem whose Σy² passes
    2^63 (the reason the y² lane is hi/lo-split). The float64 shortcut
    would drift; the lanes must stay exact."""
    n = 50_000
    rng = np.random.RandomState(11)
    x = rng.randint(1, 51, n).astype(np.int64)
    # y near the 1e7-cent ceiling so sum(y^2) ~ n * 1e14 = 5e18 > 2^53
    y_cents = (9_900_000 + rng.randint(0, 100_000, n)).astype(np.int64)
    df = pd.DataFrame({
        "l_returnflag": np.where(rng.rand(n) < 0.5, "A", "B"),
        "l_quantity": x.astype(np.float64),
        "l_extendedprice": y_cents / 100.0,
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(sf / "lineitem.parquet"))

    from metis_ray.pipelines.relational import lineitem_corr_stats
    got = lineitem_corr_stats(str(sf)).set_index("l_returnflag")

    for flag, g in df.groupby("l_returnflag"):
        gx = np.rint(g["l_quantity"]).astype(object)      # python ints
        gy = np.rint(g["l_extendedprice"] * 100).astype(object)
        nn = len(g)
        sx, sy = int(gx.sum()), int(gy.sum())
        sxx = int((gx * gx).sum())
        syy = int((gy * gy).sum())
        sxy = int((gx * gy).sum())
        assert syy > 2**53                                # probe is honest
        num = nn * sxy - sx * sy
        vx, vy = nn * sxx - sx * sx, nn * syy - sy * sy
        want_corr = float(num) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
        row = got.loc[flag]
        assert int(row["n_rows"]) == nn
        assert row["corr_qty_price"] == pytest.approx(want_corr, abs=2e-6)
