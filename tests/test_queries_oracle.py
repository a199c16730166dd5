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
