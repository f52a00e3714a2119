"""Bucketed-join co-location: same-key same-count bucketed tables join
without any Exchange (shuffle) in the physical plan."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
import pytest

from analytics_data_platform_spark.tables.io import TableIO


@pytest.fixture()
def ns(spark):
    io = TableIO(spark)
    name = f"bkt_{uuid.uuid4().hex[:6]}"
    io.ensure_namespace(name)
    yield name
    io.drop_namespace(name)


def test_bucketed_join_has_no_shuffle(spark, ns):
    io = TableIO(spark)
    orders = spark.range(10000).select(
        F.col("id").alias("order_id"), (F.col("id") % 997).alias("cust_id")
    )
    items = spark.range(30000).select(
        (F.col("id") % 10000).alias("order_id"), (F.col("id") % 13).cast("double").alias("qty")
    )
    io.write_bucketed(orders, f"{ns}.orders_b", ["order_id"], 8, sort_cols=["order_id"])
    io.write_bucketed(items, f"{ns}.items_b", ["order_id"], 8, sort_cols=["order_id"])

    # disable broadcast + AQE so the static plan proves co-location
    with_conf = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.enabled", "false"),
    ]
    old = {k: spark.conf.get(k) for k, _ in with_conf}
    try:
        for k, v in with_conf:
            spark.conf.set(k, v)
        joined = spark.table(f"{ns}.orders_b").join(spark.table(f"{ns}.items_b"), "order_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:800]}"
        assert joined.count() == 30000

        # control: the same join on unbucketed data DOES shuffle
        plain = orders.join(items, "order_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_bucketed_aggregation_avoids_shuffle(spark, ns):
    io = TableIO(spark)
    df = spark.range(5000).select((F.col("id") % 500).alias("k"), F.col("id").alias("v"))
    io.write_bucketed(df, f"{ns}.agg_b", ["k"], 4)
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        agg = spark.table(f"{ns}.agg_b").groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert agg.count() == 500
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
