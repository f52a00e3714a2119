"""Engine-wide plan audit (plans/audit.py): the whole query registry is
swept for scale anti-patterns — any new query that plans a cartesian
product or silently falls off the JVM fails here, not on the cluster."""

from __future__ import annotations

import pytest

from analytics_data_platform_spark.plans.audit import assert_plan, audit
from analytics_data_platform_spark.queries import all_queries

# Queries allowed to cross the Python boundary, each with a reason.
PYTHON_ALLOWED = {
    # greedy bin-packing is inherently sequential per shard: applyInPandas
    # over shards is the distributed formulation (operators/packing.py)
    "pack_sequences",
}


def test_registry_sweep_no_cartesian_no_python(spark, sf_dir):
    """Every registered query: no CartesianProduct, JVM-side unless
    allowlisted. This is the single highest-leverage regression net in
    the repo — it runs the planner over the full surface."""
    offenders: list[str] = []
    for name, spec in sorted(all_queries().items()):
        r = audit(spec.fn(spark, sf_dir))
        if r.has_cartesian:
            offenders.append(f"{name}: cartesian")
        if r.python_eval and name not in PYTHON_ALLOWED:
            offenders.append(f"{name}: python boundary")
    assert not offenders, offenders


def test_audit_parses_scan_details(spark, sf_dir):
    r = audit(all_queries()["q6_forecast_revenue"].fn(spark, sf_dir), codegen=True)
    assert len(r.scans) == 1
    s = r.scans[0]
    assert s.fmt == "parquet"
    assert set(s.read_columns) == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    }
    assert any("l_shipdate" in f for f in s.pushed_filters)
    assert r.codegen_spans >= 1


def test_assert_plan_enforces_broadcast_and_pruning(spark, sf_dir):
    q5 = all_queries()["q5_local_supplier_volume"].fn(spark, sf_dir)
    r = assert_plan(q5, require_join="BroadcastHashJoin", no_python_eval=True)
    assert r.join_strategies["BroadcastHashJoin"] >= 3
    q6 = all_queries()["q6_forecast_revenue"].fn(spark, sf_dir)
    assert_plan(
        q6,
        max_scan_columns=4,
        require_pushed_filter="l_shipdate",
        max_exchanges=1,  # single scalar-agg exchange; no join shuffles
    )


def test_assert_plan_raises_with_plan_excerpt(spark, sf_dir):
    q6 = all_queries()["q6_forecast_revenue"].fn(spark, sf_dir)
    with pytest.raises(AssertionError, match="expected BroadcastHashJoin"):
        assert_plan(q6, require_join="BroadcastHashJoin")
    with pytest.raises(AssertionError, match="projection not pruned"):
        assert_plan(q6, max_scan_columns=2)
    with pytest.raises(AssertionError, match="partition filter"):
        assert_plan(q6, require_partition_filter="_p_month")


def test_audit_summary_is_jsonable(spark, sf_dir):
    import json

    r = audit(all_queries()["q3_shipping_priority"].fn(spark, sf_dir))
    digest = json.loads(json.dumps(r.summary()))
    assert digest["joins"].get("BroadcastHashJoin", 0) >= 1
    assert digest["exchanges"] >= 1
