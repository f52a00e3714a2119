"""bench.py heavy-envelope alert logic (no Spark session needed).

Round-8 verdict finding: the median-normalized skew alert absorbs a
UNIFORM regression — a change that slows every heavy query 2x raises the
median and silences every per-query alert until the 3x hard cap. The
fleet-level geometric-mean alert closes that blind spot; these tests
inject the exact scenarios."""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import heavy_envelope_alerts

BASE = {
    "alert_ratio": 1.5,
    "hard_cap": 3.0,
    "best": {"a": 10.0, "b": 5.0, "c": 8.0, "d": 4.0},
}


def test_steady_state_is_quiet():
    heavy = {"a": 10.5, "b": 5.2, "c": 7.9, "d": 4.1}
    assert heavy_envelope_alerts(heavy, BASE) == ({}, {})


def test_single_query_skew_alerts_that_query():
    # one query 2.2x its best while the fleet sits near 1.0 — a real
    # per-query regression, not host noise
    alerts, excused = heavy_envelope_alerts(
        {"a": 22.0, "b": 5.1, "c": 8.2, "d": 4.0}, BASE
    )
    assert "a" in alerts and alerts["a"] == 2.2
    assert "__fleet__" not in alerts
    assert excused == {}


def test_excused_outlier_is_recorded_not_silent():
    # the r9 artifact pattern: one query 1.7x its best while the rest of
    # the fleet rides ~1.2x host noise — the median rule excuses it (the
    # threshold is 1.5 x med 1.2 = 1.8) but the artifact must SAY so
    heavy = {"a": 12.0, "b": 6.0, "c": 9.8, "d": 6.8}  # d = 1.7x
    alerts, excused = heavy_envelope_alerts(heavy, BASE)
    assert alerts == {}, "1.7x under an elevated median is excused"
    assert excused == {"d": 1.7}, "excused outlier must be recorded"

    # the same shape at 1.9x pierces the normalized threshold and alerts
    heavy["d"] = 4.0 * 1.9
    alerts, excused = heavy_envelope_alerts(heavy, BASE)
    assert alerts.get("d") == 1.9
    assert "d" not in excused


def test_true_median_for_even_fleets():
    # sorted()[n//2] took the UPPER-middle element for even fleets — with
    # ratios (1.0, 1.0, 1.4, 1.4) that read 1.4 (threshold 2.1) instead
    # of the true 1.2 (threshold 1.8): a 2.0x query slipped through
    heavy = {"a": 10.0, "b": 5.0, "c": 8.0 * 1.4, "d": 4.0 * 2.0}
    alerts, _excused = heavy_envelope_alerts(heavy, BASE)
    # true median of (1.0, 1.0, 1.4, 2.0) = 1.2 -> threshold 1.8 < 2.0
    assert alerts.get("d") == 2.0


def test_uniform_2x_regression_trips_fleet_alert():
    # the round-8 blind spot: EVERY query 2x slower — median normalization
    # silences the per-query skew alerts, the fleet geomean must fire
    heavy = {n: b * 2.0 for n, b in BASE["best"].items()}
    alerts, excused = heavy_envelope_alerts(heavy, BASE)
    assert alerts.get("__fleet__") == 2.0
    assert not any(k in alerts for k in BASE["best"]), (
        "uniform slowdown is a fleet alert, not per-query skew"
    )
    assert set(excused) == set(BASE["best"]), (
        "per-query ratios above alert_ratio absorbed by the median rule "
        "must be recorded as excused"
    )


def test_hard_cap_fires_even_under_uniform_slowdown():
    heavy = {n: b * 3.5 for n, b in BASE["best"].items()}
    alerts, _excused = heavy_envelope_alerts(heavy, BASE)
    assert all(alerts[k] == 3.5 for k in BASE["best"])
    assert alerts["__fleet__"] == 3.5


def test_missing_queries_and_empty_inputs_are_safe():
    assert heavy_envelope_alerts({}, BASE) == ({}, {})
    assert heavy_envelope_alerts({"zzz": 1.0}, BASE) == ({}, {})


def test_window_group_limit_is_bounded_below():
    """plans/audit.py: a WindowGroupLimit below an Exchange SinglePartition
    bounds the exchange input (<= N rows per group survive) — a future
    Spark emitting this shape must not false-fail the single-reducer gate
    (round-8 verdict hardening item)."""
    from analytics_data_platform_spark.plans.audit import (
        _find_unbounded_single_partition,
    )

    bounded = "\n".join(
        [
            "Window [row_number() ...]",
            "+- Exchange SinglePartition, ENSURE_REQUIREMENTS",
            "   +- WindowGroupLimit [rank(score)], 100",
            "      +- Sort [score DESC]",
            "         +- Scan parquet [doc_id,score]",
        ]
    )
    assert _find_unbounded_single_partition(bounded) == ()

    unbounded = re.sub(r"WindowGroupLimit.*", "Project [doc_id, score]", bounded)
    assert _find_unbounded_single_partition(unbounded) != ()
