"""Incremental IVF index maintenance (queries/scale_ops.py::
ivf_index_incremental_topk): pinned-centroid append must equal the
one-shot build, and the serving join must dynamic-partition-prune the
cell directories."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F

from analytics_data_platform_spark.operators import similarity
from analytics_data_platform_spark.plans.audit import audit
from analytics_data_platform_spark.queries.scale_ops import (
    _IVF_NLIST,
    _IVF_NPROBE,
    _DirIvfIndex,
)
from analytics_data_platform_spark.sources.testdata import load_table


def _pinned_centroids(e):
    rows = (
        e.where(F.col("vec_id") < _IVF_NLIST)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def test_incremental_append_equals_one_shot_index(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cents = _pinned_centroids(e)
    cell = similarity.assign_centroid_col("embedding", cents).cast("int")
    d = tempfile.mkdtemp(prefix="adps-ivf-test-")
    try:
        t0 = e.where((F.col("vec_id") % 2 == 0) | (F.col("vec_id") < _IVF_NLIST))
        t0.withColumn("_cell", cell).write.partitionBy("_cell").mode(
            "overwrite"
        ).parquet(d)
        t1 = e.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") >= _IVF_NLIST))
        t1.withColumn("_cell", cell).write.partitionBy("_cell").mode(
            "append"
        ).parquet(d)

        built = spark.read.parquet(d).select(
            "vec_id", F.col("_cell").cast("int").alias("_cell")
        )
        one_shot = e.select("vec_id", cell.alias("_cell"))
        assert built.count() == e.count()
        assert built.exceptAll(one_shot).isEmpty()
        assert one_shot.exceptAll(built).isEmpty()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_serving_join_dynamic_partition_prunes(spark, sf_dir):
    """The probe join against the appended index must reach the scan as a
    dynamic partition-pruning filter on _cell — at scale this is what
    turns a probe into nprobe/nlist directory reads instead of a full
    index scan."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = _pinned_centroids(e)
    cell = similarity.assign_centroid_col("embedding", cents).cast("int")
    d = tempfile.mkdtemp(prefix="adps-ivf-test-")
    try:
        e.withColumn("_cell", cell).write.partitionBy("_cell").mode(
            "overwrite"
        ).parquet(d)
        q = e.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
        out = similarity.ivf_table_topk(
            _DirIvfIndex(spark, d), "t", q, cents, k=10, nprobe=_IVF_NPROBE,
            score_round=4,
        )
        out.collect()  # finalize the AQE plan before asserting on it
        rep = audit(out)
        pruned = any(
            "dynamicpruning" in " ".join(s.partition_filters).lower()
            for s in rep.scans
        ) or "dynamicpruning" in rep.formatted.lower()
        assert pruned, "probe join must dynamic-partition-prune the cell dirs"
    finally:
        shutil.rmtree(d, ignore_errors=True)
