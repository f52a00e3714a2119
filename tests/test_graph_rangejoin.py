"""Unit tests for operators/graph.py (PageRank) and
operators/rangejoin.py (binned range-join rewrite)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from analytics_data_platform_spark.operators.graph import pagerank
from analytics_data_platform_spark.operators.rangejoin import bin_interval_join


# --- pagerank -------------------------------------------------------------


def test_pagerank_uniform_on_cycle(spark):
    # symmetric cycle: every node identical by symmetry -> rank 1/n each
    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)],
        "src long, dst long",
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=10).collect()}
    assert len(ranks) == n
    assert math.isclose(sum(ranks.values()), 1.0, rel_tol=1e-9)
    for v in ranks.values():
        assert math.isclose(v, 1.0 / n, rel_tol=1e-9)


def test_pagerank_star_center_dominates(spark):
    # star: leaves all point at the hub (and back) -> hub rank is highest
    edges_list = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    edges = spark.createDataFrame(edges_list, "src long, dst long")
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=20).collect()}
    assert ranks[0] == max(ranks.values())
    assert math.isclose(sum(ranks.values()), 1.0, rel_tol=1e-9)
    # leaves are symmetric: identical ranks
    leaf_ranks = [ranks[i] for i in range(1, 5)]
    assert max(leaf_ranks) - min(leaf_ranks) < 1e-12


def test_pagerank_dangling_mass_conserved(spark):
    # 0 -> 1 -> 2, node 2 dangling: without the fixup mass drains each round
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iters=15).collect()}
    assert math.isclose(sum(ranks.values()), 1.0, rel_tol=1e-9)
    assert ranks[2] > ranks[1] > ranks[0] > 0


def test_pagerank_matches_numpy_power_iteration(spark):
    # arbitrary asymmetric graph incl. a dangling node; mirror in pure numpy
    import numpy as np

    edges_list = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]  # node 4 absent, 3->2, none from 4
    edges_list.append((4, 0))
    edges = spark.createDataFrame(edges_list, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=7, damping=0.85).collect()}

    n, d = 5, 0.85
    out = {}
    for s, t in edges_list:
        out.setdefault(s, []).append(t)
    r = np.full(n, 1.0 / n)
    for _ in range(7):
        nxt = np.full(n, (1 - d) / n)
        dangling = sum(r[u] for u in range(n) if u not in out)
        nxt += d * dangling / n
        for s, ts in out.items():
            for t in ts:
                nxt[t] += d * r[s] / len(ts)
        r = nxt
    for node in range(n):
        assert math.isclose(got[node], r[node], rel_tol=1e-9), node


# --- bin_interval_join ----------------------------------------------------


@pytest.fixture(scope="module")
def pts_and_ivals(spark):
    pts = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 100, 3)], "pid long, x double"
    )
    ivals = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 5.0, 50.0), (2, 49.0, 49.5), (3, 90.0, 200.0), (4, -5.0, 1.0)],
        "iid long, lo double, hi double",
    )
    return pts, ivals


def _expected(pts_rows, ival_rows):
    return {
        (p.pid, i.iid)
        for p in pts_rows
        for i in ival_rows
        if i.lo <= p.x < i.hi
    }


def test_bin_join_matches_nested_loop(spark, pts_and_ivals):
    pts, ivals = pts_and_ivals
    for width in (1.0, 7.0, 25.0, 1000.0):
        got = {
            (r["pid"], r["iid"])
            for r in bin_interval_join(pts, ivals, "x", "lo", "hi", width).collect()
        }
        assert got == _expected(pts.collect(), ivals.collect()), width


def test_bin_join_no_duplicate_matches(spark, pts_and_ivals):
    pts, ivals = pts_and_ivals
    out = bin_interval_join(pts, ivals, "x", "lo", "hi", 2.0)
    total = out.count()
    distinct = out.select("pid", "iid").distinct().count()
    assert total == distinct


def test_bin_join_left_keeps_unmatched_points(spark, pts_and_ivals):
    pts, ivals = pts_and_ivals
    out = bin_interval_join(pts, ivals, "x", "lo", "hi", 10.0, how="left")
    rows = out.collect()
    matched = _expected(pts.collect(), ivals.collect())
    got_pairs = {(r["pid"], r["iid"]) for r in rows if r["iid"] is not None}
    assert got_pairs == matched
    unmatched_pids = {r["pid"] for r in rows if r["iid"] is None}
    expected_unmatched = {p.pid for p in pts.collect()} - {p for p, _ in matched}
    assert unmatched_pids == expected_unmatched


def test_bin_join_plan_is_equi_join(spark, pts_and_ivals):
    pts, ivals = pts_and_ivals
    plan = bin_interval_join(
        pts, ivals, "x", "lo", "hi", 10.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_bin_join_rejects_bad_width(spark, pts_and_ivals):
    pts, ivals = pts_and_ivals
    with pytest.raises(ValueError):
        bin_interval_join(pts, ivals, "x", "lo", "hi", 0.0)


# --- bfs_hops -------------------------------------------------------------


def test_bfs_hops_path_graph(spark):
    # path 0-1-2-3-4-5 (symmetric), seed 0, max_hops 3 -> nodes 0..3 only
    from analytics_data_platform_spark.operators.graph import bfs_hops

    path = [(i, i + 1) for i in range(5)]
    edges = spark.createDataFrame(
        path + [(b, a) for a, b in path], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_hops_min_distance_and_multi_seed(spark):
    # diamond 0->{1,2}->3 plus a shortcut 0->3: hops(3) must be 1, not 2;
    # a second seed 9 (isolated) stays at hop 0
    from analytics_data_platform_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (9,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=4).collect()}
    assert got == {0: 0, 9: 0, 1: 1, 2: 1, 3: 1}


# --- sssp_hops ------------------------------------------------------------


def test_sssp_prefers_cheap_two_hop_over_expensive_direct(spark):
    # 0->2 direct costs 10; 0->1->2 costs 3; with max_hops >= 2 the
    # two-hop path must win
    from analytics_data_platform_spark.operators.graph import sssp_hops

    edges = spark.createDataFrame(
        [(0, 2, 10), (0, 1, 1), (1, 2, 2)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["cost"] for r in sssp_hops(edges, seeds, max_hops=2).collect()}
    assert got == {0: 0, 1: 1, 2: 3}


def test_sssp_hop_budget_limits_relaxation(spark):
    # path 0-1-2-3 each weight 1: with max_hops=2, node 3 is unreachable
    from analytics_data_platform_spark.operators.graph import sssp_hops

    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1)], "src long, dst long, w long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["cost"] for r in sssp_hops(edges, seeds, max_hops=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}
