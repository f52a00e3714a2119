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
