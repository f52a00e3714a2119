"""Interactive SQL surface tests."""

from __future__ import annotations

from analytics_data_platform_spark import serve


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
