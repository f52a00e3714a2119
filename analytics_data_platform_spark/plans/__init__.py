"""Transform layer: a mini model-DAG runner (dbt-style) + the facility_ops
model chain re-expressed as Spark DataFrame models."""
