"""Physical-plan guards: the scale properties the engine promises must be
visible in the optimized plans (pushdown, pruning, broadcast choices) —
regressions here silently cost 10-100× at 100 TB even when results stay
correct."""

from __future__ import annotations

import re

import pytest

from analytics_data_platform_spark.queries import all_queries


def plan_of(spark, name: str, sf_dir: str, mode: str = "formatted") -> str:
    df = all_queries()[name].fn(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_q6_filter_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, "q6_forecast_revenue", sf_dir)
    assert "PushedFilters:" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan
    # column pruning: only the 4 needed columns reach the scan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_q1_projection_pruning(spark, sf_dir):
    plan = plan_of(spark, "q1_pricing_summary", sf_dir)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # 6 used columns, not all 11
    assert "l_orderkey" not in cols and "l_partkey" not in cols


def test_joins_broadcast_small_dims(spark, sf_dir):
    plan = plan_of(spark, "q5_local_supplier_volume", sf_dir, "simple")
    assert "BroadcastHashJoin" in plan
    plan3 = plan_of(spark, "q3_shipping_priority", sf_dir, "simple")
    assert "BroadcastHashJoin" in plan3


def test_interval_join_is_broadcast_nested_loop(spark, sf_dir):
    plan = plan_of(spark, "interval_join_tiers", sf_dir, "simple")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_anti_and_semi_joins_planned(spark, sf_dir):
    anti = plan_of(spark, "customers_without_orders", sf_dir, "simple")
    assert "LeftAnti" in anti
    semi = plan_of(spark, "active_customers_per_nation", sf_dir, "simple")
    assert "LeftSemi" in semi


def test_no_python_udfs_in_relational_plans(spark, sf_dir):
    """Hot-path queries must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython stages)."""
    for name in [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "text_token_stats",
        "dedup_exact_stats",
        "ann_cosine_topk",
        "window_lag_events",
    ]:
        plan = plan_of(spark, name, sf_dir, "simple")
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_portable_dedup_queries_stay_jvm_side(spark, sf_dir):
    """The portable md5-family MinHash/SimHash registry queries must be
    pure JVM (unlike the legacy mapInPandas simhash) — that's the point
    of the unrolled aggregate bit-vote."""
    for name in ["near_dup_minhash", "simhash_near_dups"]:
        plan = plan_of(spark, name, sf_dir, "simple")
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_partition_dsl_layout_prunes_scans(spark, sf_dir):
    """A table written with the month() partition transform must show
    partition pruning (PartitionFilters on the derived column) when
    filtered — the data-skipping contract of the partition DSL."""
    import uuid

    import pyspark.sql.functions as F

    from analytics_data_platform_spark.sources.testdata import load_table
    from analytics_data_platform_spark.tables.io import TableIO

    io = TableIO(spark)
    ns = f"prune_{uuid.uuid4().hex[:6]}"
    io.ensure_namespace(ns)
    try:
        events = load_table(spark, sf_dir, "events")
        io.write_table(events, f"{ns}.events_p", partition_spec={"ts": "month"})
        q = spark.table(f"{ns}.events_p").where(F.col("_p_month_ts") == 202401)
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = q._jdf.queryExecution().explainString(jmode)
        assert "PartitionFilters" in plan
        assert "_p_month_ts" in plan.split("PartitionFilters")[1][:200]
        assert q.count() == events.count()  # all test events are Jan 2024
    finally:
        io.drop_namespace(ns)


def test_ann_norms_hoisted_before_join(spark, sf_dir):
    """Candidate norms must be computed in a projection under the join, not
    per joined pair: the aggregate() over the candidate vector appears on
    the stream side BEFORE BroadcastNestedLoopJoin in the plan tree."""
    plan = plan_of(spark, "ann_cosine_topk", sf_dir, "formatted")
    assert plan.count("BroadcastNestedLoopJoin") >= 1
    # the join's Project output carries precomputed c_nrm/q_nrm references
    assert "c_nrm" in plan and "q_nrm" in plan


def test_ivf_cell_partitioned_corpus_prunes_probes(spark, sf_dir):
    """The IVF scale claim: a corpus written partitioned by its coarse
    cell turns each nprobe probe into a partition-pruned scan (file skip),
    not a full pass. Prove it from the physical plan."""
    import uuid

    import pyspark.sql.functions as F

    from analytics_data_platform_spark.operators import similarity
    from analytics_data_platform_spark.sources.testdata import load_table
    from analytics_data_platform_spark.tables.io import TableIO

    io = TableIO(spark)
    ns = f"ivf_{uuid.uuid4().hex[:6]}"
    io.ensure_namespace(ns)
    try:
        e = load_table(spark, sf_dir, "embeddings")
        cents = similarity.train_ivf_centroids(e, n_centroids=4, max_iter=3)
        indexed = e.withColumn(
            "_cell", similarity.assign_centroid_col("embedding", cents)
        )
        t = f"{ns}.ivf_corpus"
        io.write_table(indexed, t, mode="append", partition_spec={"_cell": "identity"})
        probed = spark.table(t).where(F.col("_cell").isin(0, 2))
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "_cell" in plan.split("PartitionFilters")[1][:200], (
            "probe scan is not partition-pruned:\n" + plan[:1500]
        )
        assert probed.count() > 0
    finally:
        io.drop_namespace(ns)


def test_new_tpch_dims_broadcast(spark, sf_dir):
    """q2/q9/q21 join chains must broadcast their dimension sides; the only
    shuffles allowed are the irreducible fact-side aggregations/joins."""
    for name in ["q2_min_cost_supplier", "q9_product_profit", "q21_suppliers_kept_waiting"]:
        plan = plan_of(spark, name, sf_dir, "simple")
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast dims"
        assert "CartesianProduct" not in plan, name


def test_minhash_plan_evaluates_signature_once(spark):
    """Regression guard for the let-binding (functions.expr.bind): the
    optimized candidate plan must contain exactly ONE md5 call chain for
    the signature (CollapseProject used to inline it per band — a 16x
    interpreted re-evaluation) and ONE tokenizing split."""
    from analytics_data_platform_spark.operators import dedup

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cands = dedup.minhash_lsh_candidates_portable(d, num_hashes=32, bands=16)
    plan = cands._jdf.queryExecution().optimizedPlan().toString()
    # one md5 per self-join SIDE (2 total); the pre-bind plan inlined the
    # signature into all 16 band expressions (16-32 occurrences)
    assert plan.count("md5(") <= 2, f"signature md5 re-inlined: {plan.count('md5(')}x"
    assert plan.count("regexp_replace") <= 4, plan.count("regexp_replace")


def test_shingle_tokens_plan_splits_once(spark):
    """shingle_tokens must not re-split per shingle (bind barrier)."""
    import pyspark.sql.functions as F

    from analytics_data_platform_spark.operators.dedup import shingle_tokens

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = d.select(shingle_tokens("text").alias("sh"))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1, f"tokenizer re-inlined: {plan.count('split(')}x"


def test_spread_widens_narrow_scan_only(spark):
    """spread(): repartitions a 1-split scan to cores; no-op when wide."""
    from analytics_data_platform_spark.functions.expr import spread

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert d.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    widened = spread(d)
    assert widened.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    wide = d.repartition(spark.sparkContext.defaultParallelism * 2)
    assert spread(wide).rdd.getNumPartitions() == wide.rdd.getNumPartitions()


def test_binned_range_join_query_is_equi_join(spark, sf_dir):
    """interval_join_value_bands must plan as a hash equi-join on the bin
    id (the rewrite's point), never a nested-loop/cartesian plan."""
    from analytics_data_platform_spark.queries import all_queries

    df = all_queries()["interval_join_value_bands"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """With a selective filter on the orders side of a shuffle join, Spark
    injects a runtime bloom filter (might_contain) on the lineitem scan —
    the row-level runtime pruning a 100 TB fact⋈fact join depends on.
    Thresholds are lowered because the test inputs are tiny; on a real
    cluster the defaults (10M creation / 10G application) gate it."""
    import pyspark.sql.functions as F

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(F.col("o_totalprice") > 400000)
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan.lower(), plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bm25_broadcasts_query_side_and_stays_jvm(spark, sf_dir):
    """Query terms and the semi-filtered dfreq must broadcast (never
    shuffle the corpus against a 9-row term list), and the whole scoring
    pipeline stays JVM-side."""
    from analytics_data_platform_spark.plans.audit import audit
    from analytics_data_platform_spark.queries import all_queries

    r = audit(all_queries()["bm25_search"].fn(spark, sf_dir))
    assert r.join_strategies.get("BroadcastHashJoin", 0) >= 2, r.join_strategies
    assert not r.python_eval


def test_bloom_contamination_broadcasts_set_bits(spark, sf_dir):
    """The Bloom set-bit table must be the broadcast side of the probe
    join — the train side streams regardless of its size."""
    from analytics_data_platform_spark.plans.audit import audit
    from analytics_data_platform_spark.queries import all_queries

    r = audit(all_queries()["bloom_contamination"].fn(spark, sf_dir))
    assert r.join_strategies.get("BroadcastHashJoin", 0) >= 1, r.join_strategies
    assert not r.python_eval


def test_hll_estimate_shuffles_only_register_space(spark, sf_dir):
    """The HLL fold must partial-aggregate map-side: the exchange after
    the register build carries (group, idx) rows — O(m) per group — so
    the plan shows hash aggregates around each exchange, and nothing
    Python-side."""
    from analytics_data_platform_spark.plans.audit import audit
    from analytics_data_platform_spark.queries import all_queries

    r = audit(all_queries()["hll_distinct_bigrams"].fn(spark, sf_dir))
    assert not r.python_eval
    assert "HashAggregate" in r.formatted


def test_incremental_dedup_new_side_probes_index_as_equi_join(spark, sf_dir):
    """Both incremental joins (new x index, new x new) must be equi-joins
    on the band bucket — no nested-loop against the corpus index."""
    from analytics_data_platform_spark.plans.audit import audit
    from analytics_data_platform_spark.queries import all_queries

    r = audit(all_queries()["incremental_minhash_dedup"].fn(spark, sf_dir))
    assert r.join_strategies.get("CartesianProduct", 0) == 0
    eq_joins = (
        r.join_strategies.get("SortMergeJoin", 0)
        + r.join_strategies.get("ShuffledHashJoin", 0)
        + r.join_strategies.get("BroadcastHashJoin", 0)
    )
    assert eq_joins >= 2, r.join_strategies


def test_kmeans_centroids_broadcast_not_literals(spark, sf_dir):
    # centroid tables must join as broadcast DATA (so nlist can grow) and
    # the per-iteration argmin must not plan a cartesian
    plan = plan_of(spark, "kmeans_embeddings", sf_dir, "simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_item_item_restricts_before_self_join(spark, sf_dir):
    # the top-N item dimension joins broadcast; the self-join is an
    # equi-join on customer, never a nested loop
    plan = plan_of(spark, "item_item_cosine", sf_dir, "simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_attribution_range_join_is_user_keyed(spark, sf_dir):
    # the purchase x click pairing must hash-join on user_id with the
    # time band as a post-filter, not degrade to a nested loop
    plan = plan_of(spark, "linear_attribution", sf_dir, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cv_single_scan_of_lineitem(spark, sf_dir):
    # one-pass CV: lineitem must be scanned exactly once
    plan = plan_of(spark, "cross_validate_ols", sf_dir, "simple")
    assert plan.count("lineitem.parquet") <= 1 or plan.lower().count("filescan") <= 2


def test_geo_pair_join_is_grid_equi_join(spark, sf_dir):
    """geo_neighbor_pairs must plan as a hash equi-join on the grid cell
    key — never a cross/nested-loop pair enumeration (the all-pairs shape
    lives only in the DuckDB oracle, as the losslessness proof)."""
    from analytics_data_platform_spark.queries import all_queries

    df = all_queries()["geo_neighbor_pairs"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
