"""Spark Connect client surface (SURVEY §3.3 — modern-client parity).

End-to-end: start an in-process Spark application with the Connect
server plugin (serve.connect_server_conf — the server jar ships in the
Spark distribution), attach a `sc://` gRPC client session, and run a
registry query through the CLIENT session, asserting it matches the
server-side result.

Env-gated: the gRPC CLIENT needs the grpcio wheel, which this container
does not ship (`import grpc` fails) — the gate skips rather than fakes.
The conf contract itself is covered unconditionally below.
"""

from __future__ import annotations

import pytest

from analytics_data_platform_spark.serve import connect_server_conf


def _grpc_available() -> bool:
    try:
        import grpc  # noqa: F401

        return True
    except Exception:
        return False


def test_connect_server_conf_contract():
    conf = connect_server_conf(port=15999)
    assert conf["spark.plugins"] == "org.apache.spark.sql.connect.SparkConnectPlugin"
    assert conf["spark.connect.grpc.binding.port"] == "15999"


@pytest.mark.skipif(
    not _grpc_available(), reason="grpcio wheel absent — Connect client cannot run"
)
def test_registry_query_via_connect_client(tmp_path):
    from pyspark.sql import SparkSession

    from analytics_data_platform_spark.queries import all_queries
    from analytics_data_platform_spark.session import get_spark

    server = get_spark(
        app_name="adps-connect-server",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            **connect_server_conf(port=15099),
            "spark.sql.warehouse.dir": str(tmp_path / "wh"),
        },
    )
    try:
        client = SparkSession.builder.remote("sc://localhost:15099").getOrCreate()
        spec = all_queries()["q1_pricing_summary"]
        got = spec.fn(client, "/root/testdata/sf0.001").collect()
        want = spec.fn(server, "/root/testdata/sf0.001").collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
        client.stop()
    finally:
        server.stop()
