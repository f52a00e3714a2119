"""Every registered query must hash-match its DuckDB oracle (the same check
the correctness driver runs at sf0.01; here at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from analytics_data_platform_spark.oracle import check_query, duckdb_connection
from analytics_data_platform_spark.queries import all_queries

NAMES = sorted(all_queries())


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_connection(sf_dir)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, con, sf_dir, name):
    res = check_query(spark, con, name, sf_dir)
    assert res.ok, f"{name}: {res.detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema.fieldNames()


def test_registry_contract(spark):
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip().upper().startswith(("SELECT", "WITH")) for s in o.values())
