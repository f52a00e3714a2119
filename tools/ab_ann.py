#!/usr/bin/env python
"""Isolated A/B of ann_cosine_topk variants (guide §1.4: noop sink,
min-of-N, fresh frames per run). Diagnostic only."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from analytics_data_platform_spark.functions import vectors as V
from analytics_data_platform_spark.functions.expr import spread
from analytics_data_platform_spark.operators.similarity import topk_per_query
from analytics_data_platform_spark.session import get_spark
from analytics_data_platform_spark.sources.testdata import load_table


def build(spark, sf_dir, variant):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        V.norm("embedding").alias("q_nrm"),
    )
    if variant == "spread_pre_norm":  # r10 shape: norm before the exchange
        cand = spread(e.select("vec_id", "embedding", V.norm("embedding").alias("c_nrm")))
    elif variant == "no_spread":  # r9 shape
        cand = e.select("vec_id", "embedding", V.norm("embedding").alias("c_nrm"))
    elif variant == "spread_post_norm":  # exchange raw rows, compute norm wide
        cand = spread(e.select("vec_id", "embedding")).select(
            "vec_id", "embedding", V.norm("embedding").alias("c_nrm")
        )
    else:
        raise ValueError(variant)
    cos = F.when(
        (F.col("q_nrm") > 0) & (F.col("c_nrm") > 0),
        V.dot("q_emb", "embedding") / (F.col("q_nrm") * F.col("c_nrm")),
    )
    scored = cand.join(F.broadcast(q), F.col("vec_id") != F.col("q_id")).select(
        "q_id", "vec_id", F.round(cos, 4).alias("cos_sim")
    )
    return topk_per_query(scored, 10, "q_id", "vec_id", "cos_sim").select(
        "q_id", "vec_id", "cos_sim", "rank"
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="ab-ann")
    variants = ["spread_pre_norm", "no_spread", "spread_post_norm"]
    # warm codegen with one run of each shape first
    for v in variants:
        build(spark, sf_dir, v).write.format("noop").mode("overwrite").save()
    for v in variants:
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            build(spark, sf_dir, v).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(f"{v}: min {min(ts):.3f}s runs {ts}")


if __name__ == "__main__":
    main()
