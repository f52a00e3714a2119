"""Env-gated REAL Iceberg runtime e2e (r4 verdict item #4).

Probe results this round (2026-08-15): no ``iceberg-spark-runtime`` jar in
the image (``/opt/spark/jars`` has none, no ivy cache) and no network
(repo1.maven.org unresolvable), so ``spark.jars.packages`` cannot resolve.
The contract tests in ``tests/test_iceberg_contract.py`` remain the floor.

The moment a jar IS available, point ``SPARK_GRAFT_ICEBERG_JAR`` at it and
this module runs the reference's two real flows end-to-end on a hadoop
catalog (reference ``elt-common/src/elt_common/iceberg/io.py:95-106`` MERGE
semantics; ``iceberg/maintenance/__init__.py:34-51`` rewrite_data_files):

1. ``MERGE INTO ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
   INSERT *`` — the exact statement ``TableIO._merge`` submits;
2. ``CALL <cat>.system.rewrite_data_files(table => ...)``.

A dedicated session is built here (the shared fixture session has no
extensions conf), so the test is opt-in via the env var to avoid a second
JVM in normal runs.
"""

from __future__ import annotations

import os

import pytest

JAR = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")

pytestmark = pytest.mark.skipif(
    not (JAR and os.path.exists(JAR)),
    reason="no iceberg-spark-runtime jar in image and no network to resolve "
    "spark.jars.packages (probed 2026-08-15); set SPARK_GRAFT_ICEBERG_JAR to run",
)


def test_real_iceberg_merge_and_rewrite(tmp_path):
    from pyspark.sql import SparkSession

    warehouse = str(tmp_path / "wh")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-runtime-e2e")
        .config("spark.jars", JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.ice.type", "hadoop")
        .config("spark.sql.catalog.ice.warehouse", warehouse)
        .getOrCreate()
    )
    try:
        spark.sql("CREATE TABLE ice.db.t (id INT, v STRING) USING iceberg")
        spark.sql("INSERT INTO ice.db.t VALUES (1, 'a'), (2, 'b')")
        src = spark.createDataFrame([(2, "B"), (3, "c")], "id INT, v STRING")
        src.createOrReplaceTempView("src")

        from analytics_data_platform_spark.tables.io import merge_into_sql

        spark.sql(merge_into_sql("ice.db.t", "src", ["id"]))
        got = {(r.id, r.v) for r in spark.table("ice.db.t").collect()}
        assert got == {(1, "a"), (2, "B"), (3, "c")}

        from analytics_data_platform_spark.tables.maintenance import (
            iceberg_maintenance_sql,
        )

        stmts = iceberg_maintenance_sql("ice", "db.t")
        rewrite = next(s for s in stmts if "rewrite_data_files" in s)
        spark.sql(rewrite)
        # still the same rows after compaction
        assert {(r.id, r.v) for r in spark.table("ice.db.t").collect()} == got
    finally:
        spark.stop()
