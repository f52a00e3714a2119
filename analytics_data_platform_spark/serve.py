"""Interactive SQL surface (SURVEY §3.3 parity).

The reference serves analysts through Trino (Superset/DBeaver); in this
engine the same surface is Spark SQL: ``register_corpus`` exposes the
testdata tables as temp views, so any query in the registry — and any
ad-hoc analyst SQL — runs via ``spark.sql(...)``. On a cluster the same
function backs a Spark Thrift Server / Spark Connect endpoint; a durable
deployment points the views at catalog tables instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from analytics_data_platform_spark.sources.testdata import TABLES, load_table


def register_corpus(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Create temp views for every corpus table; returns the view names."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, query: str, sf_dir: str) -> DataFrame:
    """One-shot ad-hoc SQL over the corpus (views registered on demand)."""
    register_corpus(spark, sf_dir)
    return spark.sql(query)


def start_thrift_server(spark: SparkSession, port: int = 10000):
    """Expose this session's catalog over the HiveServer2 wire protocol.

    Any JDBC client (DBeaver, Superset via pyhive, beeline) connects with
    ``jdbc:hive2://host:<port>`` — the exact surface the reference serves
    through Trino (reference: warehouses/ superset/DBeaver docs §3.3).
    Catalog (saved) tables are visible to every JDBC session; temp views
    require ``spark.sql.hive.thriftServer.singleSession=true`` at session
    build time. Returns the server handle — call ``.stop()`` to shut down.
    """
    spark.conf.set("hive.server2.thrift.port", str(port))
    jvm = spark.sparkContext._jvm
    return jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
        spark._jsparkSession.sqlContext()
    )


def beeline_argv(sql_text: str, port: int = 10000, user: str = "anon") -> list[str]:
    """argv for the beeline JDBC client shipped inside pyspark's jars —
    a zero-extra-dependency smoke client for :func:`start_thrift_server`."""
    import os

    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars", "*")
    return [
        "java",
        "-cp",
        jars,
        "org.apache.hive.beeline.BeeLine",
        "-u",
        f"jdbc:hive2://localhost:{port}",
        "-n",
        user,
        "-e",
        sql_text,
    ]


def connect_server_conf(port: int = 15002) -> dict[str, str]:
    """Builder confs that turn a Spark application into a Spark Connect
    endpoint (the modern gRPC twin of :func:`start_thrift_server` — the
    §3.3 interactive surface for connect-native clients like recent
    DBeaver, VS Code, or `pyspark --remote`).

    The server plugin ships inside the Spark distribution
    (spark-connect_2.13 jar — verified present in this image); clients
    additionally need the grpcio wheel, which this container does NOT
    ship, so the end-to-end test (tests/test_connect_surface.py) is
    env-gated on `import grpc`. Usage::

        spark = get_spark(extra_conf=connect_server_conf())
        # then from any client: SparkSession.builder \
        #     .remote("sc://host:15002").getOrCreate()
    """
    return {
        "spark.plugins": "org.apache.spark.sql.connect.SparkConnectPlugin",
        "spark.connect.grpc.binding.port": str(port),
    }
