"""ROLLUP / CUBE / GROUPING SETS (pipelines/rollup.py) vs DuckDB's ANSI
GROUP BY ROLLUP/CUBE/GROUPING SETS with GROUPING() bitmasks."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _mk_table(seed=7, n=500):
    rng = np.random.RandomState(seed)
    return pa.table({
        "k1": pa.array([f"g{int(x)}" for x in rng.randint(0, 4, n)]),
        "k2": pa.array([f"h{int(x)}" for x in rng.randint(0, 3, n)]),
        "k3": pa.array(rng.randint(0, 2, n).astype(np.int64), pa.int64()),
        "val": pa.array(np.round(rng.uniform(0, 100, n), 2), pa.float64()),
        "qty": pa.array(rng.randint(1, 50, n).astype(np.int64), pa.int64()),
    })


def _got(ds):
    df = ds.to_pandas()
    rows = []
    for r in df.itertuples(index=False):
        rows.append(tuple(
            None if (isinstance(x, float) and np.isnan(x)) or x is None
            else (round(x, 4) if isinstance(x, float) else x)
            for x in r))
    return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))


def _want(t: pa.Table, sql: str):
    con = duckdb.connect()
    con.register("t", t)
    rows = [tuple(round(x, 4) if isinstance(x, float) else x for x in r)
            for r in con.execute(sql).fetchall()]
    con.close()
    return sorted(rows, key=lambda r: tuple((x is None, x) for x in r))


def test_rollup_matches_duckdb():
    import ray.data as rd
    from metis_ray.pipelines.rollup import rollup
    t = _mk_table()
    out = rollup(rd.from_arrow(t), ["k1", "k2"],
                 sum_cols={"val": "sum_val", "qty": "sum_qty"},
                 count_alias="n")
    got = _got(out.map_batches(
        lambda b: b.set_column(
            b.column_names.index("sum_val"), "sum_val",
            pa.array(np.round(b["sum_val"].to_numpy(zero_copy_only=False),
                              4))),
        batch_format="pyarrow"))
    want = _want(t, """
        SELECT k1, k2, CAST(grouping(k1, k2) AS BIGINT) AS grouping_id,
               round(sum(val), 4) AS sum_val,
               CAST(sum(qty) AS BIGINT) AS sum_qty,
               count(*) AS n
        FROM t GROUP BY ROLLUP (k1, k2)""")
    assert got == want


def test_cube_matches_duckdb():
    import ray.data as rd
    from metis_ray.pipelines.rollup import cube
    t = _mk_table(seed=3, n=300)
    out = cube(rd.from_arrow(t), ["k1", "k3"], sum_cols={"qty": "sum_qty"})
    got = _got(out)
    want = _want(t, """
        SELECT k1, k3, CAST(grouping(k1, k3) AS BIGINT) AS grouping_id,
               CAST(sum(qty) AS BIGINT) AS sum_qty
        FROM t GROUP BY CUBE (k1, k3)""")
    assert got == want


def test_grouping_sets_matches_duckdb():
    import ray.data as rd
    from metis_ray.pipelines.rollup import grouping_sets
    t = _mk_table(seed=9, n=400)
    out = grouping_sets(rd.from_arrow(t), ["k1", "k2", "k3"],
                        [("k1", "k3"), ("k2",), ()],
                        sum_cols={"qty": "sum_qty"}, count_alias="n")
    got = _got(out)
    want = _want(t, """
        SELECT k1, k2, k3,
               CAST(grouping(k1, k2, k3) AS BIGINT) AS grouping_id,
               CAST(sum(qty) AS BIGINT) AS sum_qty, count(*) AS n
        FROM t GROUP BY GROUPING SETS ((k1, k3), (k2), ())""")
    assert got == want


def test_rollup_rejects_unknown_keys():
    import ray.data as rd
    from metis_ray.pipelines.rollup import grouping_sets, rollup
    ds = rd.from_arrow(_mk_table(n=10))
    with pytest.raises(KeyError, match="not in dataset"):
        rollup(ds, ["k1", "nope"], sum_cols={"qty": "s"})
    with pytest.raises(KeyError, match="unknown keys"):
        grouping_sets(ds, ["k1"], [("k2",)], sum_cols={"qty": "s"})


def test_pivot_counts_matches_pandas(ray_session):
    import pandas as pd

    import ray.data as rd

    from metis_ray.pipelines.rollup import pivot_counts
    rng = np.random.RandomState(5)
    rows = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 500),
        "s": rng.choice(["x", "y", "z", "w"], 500)})
    ds = rd.from_pandas(rows)
    got = (pivot_counts(ds, "k", "s", ["x", "y", "z"]).to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = (rows[rows["s"].isin(["x", "y", "z"])]
            .pivot_table(index="k", columns="s", aggfunc="size",
                         fill_value=0).reset_index())
    for v in ["x", "y", "z"]:
        assert got[f"n_{v}"].tolist() == want[v].tolist()
    assert got["k"].tolist() == want["k"].tolist()
    # a row-key whose rows are all outside the IN list still appears
    ds2 = rd.from_pandas(pd.DataFrame({"k": ["q"] * 3, "s": ["w"] * 3}))
    g2 = pivot_counts(ds2, "k", "s", ["x"]).to_pandas()
    assert g2["n_x"].tolist() == [0]


def test_melt_inverts_pivot(ray_session):
    import pandas as pd

    import ray.data as rd

    from metis_ray.pipelines.rollup import melt, pivot_counts
    rng = np.random.RandomState(9)
    rows = pd.DataFrame({
        "k": rng.choice(["a", "b"], 200),
        "s": rng.choice(["x", "y"], 200)})
    wide = pivot_counts(rd.from_pandas(rows), "k", "s", ["x", "y"])
    long = (melt(wide, ["k"], ["n_x", "n_y"], var_name="s",
                 value_name="n").to_pandas()
            .sort_values(["k", "s"]).reset_index(drop=True))
    want = (rows.groupby(["k", "s"], as_index=False).size()
            .rename(columns={"size": "n"}))
    want["s"] = "n_" + want["s"]
    want = want.sort_values(["k", "s"]).reset_index(drop=True)
    assert long["n"].tolist() == want["n"].tolist()
    assert long["k"].tolist() == want["k"].tolist()
    assert long["s"].tolist() == want["s"].tolist()
