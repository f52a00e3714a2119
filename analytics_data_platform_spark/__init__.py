"""analytics_data_platform_spark — a PySpark-native lakehouse analytics engine.

Re-implements the query and data-processing capabilities of the reference
lakehouse ELT platform (ISISNeutronMuon/analytics-data-platform, surveyed in
SURVEY.md) as an idiomatic Spark SQL engine, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB operation.

Layout
------
- ``session``   : SparkSession builders tuned for local tests and clusters.
- ``sources``   : readers (parquet testdata, JDBC incremental, REST/JSON,
                  multi-section CSV, archive listings).
- ``tables``    : lakehouse table IO — append/merge/replace write modes,
                  strict additive schema evolution, partition/sort DSL,
                  table-property state store (watermarks).
- ``elt``       : extract framework + incremental runner (watermark
                  lifecycle, replace-first-chunk rule).
- ``plans``     : mini model-DAG runner (dbt-style ref()/materialization).
- ``queries``   : the operator-parity query registry used by
                  ``__spark_entry__`` / bench / tests.
- ``functions`` : column-expression helpers (Trino-dialect translations,
                  text analysis, vector math).
- ``operators`` : large-scale operators (dedup families, similarity search,
                  multimodal plumbing).
"""

__version__ = "0.1.0"
