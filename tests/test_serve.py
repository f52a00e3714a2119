"""Interactive SQL surface tests."""

from __future__ import annotations

import uuid

import pytest

from analytics_data_platform_spark import serve
from analytics_data_platform_spark.tables.io import TableIO


@pytest.fixture()
def ns(spark):
    io = TableIO(spark)
    name = f"t_{uuid.uuid4().hex[:8]}"
    io.ensure_namespace(name)
    yield name
    io.drop_namespace(name)


def test_register_corpus_and_adhoc_sql(spark, sf_dir):
    views = serve.register_corpus(spark, sf_dir)
    assert len(views) == 10
    out = spark.sql(
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY 1 ORDER BY 1"
    ).collect()
    assert len(out) == 5

    joined = serve.sql(
        spark,
        """
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_customers DESC LIMIT 3
        """,
        sf_dir,
    ).collect()
    assert len(joined) == 3 and joined[0]["n_customers"] >= joined[-1]["n_customers"]


def test_events_view_has_us_timestamps(spark, sf_dir):
    serve.register_corpus(spark, sf_dir)
    row = spark.sql("SELECT max(ts) AS m FROM events").collect()[0]
    assert row["m"].year == 2024  # ns parquet surfaced as usable timestamps


def test_thrift_server_jdbc_client_queries(spark, ns):
    """§3.3 interactive layer: start the HiveServer2-protocol endpoint on
    the live session and query a catalog table through the hive-jdbc
    beeline client shipped in pyspark's jars — a real wire-protocol
    round-trip, the Spark stand-in for the reference's Trino surface."""
    import subprocess

    t = f"{ns}.thrift_smoke"
    TableIO(spark).write_table(
        spark.range(7).selectExpr("id", "id * 2 AS doubled"), t, mode="append"
    )
    server = serve.start_thrift_server(spark, port=10911)
    try:
        r = subprocess.run(
            serve.beeline_argv(f"SELECT COUNT(*) AS n FROM {t}", port=10911),
            capture_output=True,
            text=True,
            timeout=180,
        )
        assert r.returncode == 0, r.stderr[-500:]
        assert "| 7 " in r.stdout or "| 7  |" in r.stdout, r.stdout[-500:]
    finally:
        server.stop()
