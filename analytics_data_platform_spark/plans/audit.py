"""Physical-plan audit: introspect what Catalyst actually planned.

The engine's 100 TB promises (pushdown, pruning, broadcast dims, no
cartesian blowups, JVM-side expressions) are properties of the *physical
plan*, not of results — a regression can keep every oracle green while
costing 10-100× at scale. This module turns those promises into a typed,
assertable report:

    report = audit(df)
    report.join_strategies      # {"BroadcastHashJoin": 2}
    report.scans[0].read_columns
    assert_plan(df, no_cartesian=True, no_python_eval=True,
                require_join="BroadcastHashJoin", max_exchanges=2)

Used by tests/test_plan_audit.py to sweep the ENTIRE query registry
(every query must be cartesian-free and JVM-side unless explicitly
allowlisted), and available to users as a pre-deploy gate: run
``assert_plan`` on a production query at CI time and a plan regression
fails the build instead of the cluster.

Reference parity note: the reference platform trusts Trino's optimizer
blindly (dbt SQL in, plans unseen — SURVEY §4); this surface is the
Spark-first upgrade, making optimizer outcomes first-class testable.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# Physical operators that replicate/loop instead of hash-partitioning.
JOIN_OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


@dataclass(frozen=True)
class ScanInfo:
    """One file-source scan as the planner emitted it."""

    fmt: str
    location: str
    read_columns: tuple[str, ...]
    pushed_filters: tuple[str, ...]
    partition_filters: tuple[str, ...]


@dataclass(frozen=True)
class PlanReport:
    simple: str
    formatted: str
    scans: tuple[ScanInfo, ...] = ()
    join_strategies: Counter = field(default_factory=Counter)
    exchanges: int = 0
    reused_exchanges: int = 0
    codegen_spans: int = 0
    python_eval: bool = False
    aqe: bool = False

    # "Exchange SinglePartition" nodes whose input is NOT provably bounded
    # (no Limit/TakeOrderedAndProject below, and not fed by a grand-total
    # partial aggregate which emits ≤1 row per upstream partition). Each
    # one is a single-reducer sort/window at 100 TB — the scale-killer
    # class operators/ordered.py exists to replace.
    unbounded_single_partition: tuple[str, ...] = ()

    @property
    def has_cartesian(self) -> bool:
        return (
            self.join_strategies.get("CartesianProduct", 0) > 0
        )

    def summary(self) -> dict:
        """JSON-able digest (for logging / CI artifacts)."""
        return {
            "scans": [
                {
                    "format": s.fmt,
                    "columns": list(s.read_columns),
                    "pushed_filters": list(s.pushed_filters),
                    "partition_filters": list(s.partition_filters),
                }
                for s in self.scans
            ],
            "joins": dict(self.join_strategies),
            "exchanges": self.exchanges,
            "reused_exchanges": self.reused_exchanges,
            "codegen_spans": self.codegen_spans,
            "python_eval": self.python_eval,
        }


def _explain(df: DataFrame, mode: str) -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def _count_codegen(df: DataFrame) -> int:
    """WholeStageCodegen span count.

    Pre-execution AQE plans carry no codegen ids (wrapping happens when the
    final plan materializes), so re-plan the same logical plan with AQE off —
    the codegen boundaries there are the ones each AQE stage will get.
    """
    sess = df.sparkSession
    jvm = sess._jvm
    old = sess.conf.get("spark.sql.adaptive.enabled")
    try:
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            sess._jsparkSession, df._jdf.queryExecution().logical()
        )
        txt = jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    finally:
        sess.conf.set("spark.sql.adaptive.enabled", old)
    return len(set(re.findall(r"codegen id : (\d+)", txt)))


def _parse_scans(formatted: str) -> tuple[ScanInfo, ...]:
    scans: list[ScanInfo] = []
    # formatted-explain detail blocks: "(1) Scan parquet ..." followed by
    # indented attribute lines until the next "(n) " block
    blocks = re.split(r"\n\(\d+\) ", formatted)
    for blk in blocks:
        head = blk.split("\n", 1)[0]
        m = re.match(r"Scan (\w+)", head)
        if not m:
            continue
        fmt = m.group(1)
        loc = re.search(r"Location: \S+ \[?([^\],\n]*)", blk)
        rs = re.search(r"ReadSchema: struct<([^\n]*)>", blk)
        cols: tuple[str, ...] = ()
        if rs:
            cols = tuple(
                c.split(":")[0].strip() for c in rs.group(1).split(",") if ":" in c
            )
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", blk)
        pushed = tuple(f.strip() for f in pf.group(1).split(",") if f.strip()) if pf else ()
        prt = re.search(r"PartitionFilters: \[([^\]]*)\]", blk)
        parts = tuple(f.strip() for f in prt.group(1).split(",") if f.strip()) if prt else ()
        scans.append(
            ScanInfo(
                fmt=fmt,
                location=loc.group(1) if loc else "",
                read_columns=cols,
                pushed_filters=pushed,
                partition_filters=parts,
            )
        )
    return tuple(scans)


def _plan_nodes(simple: str) -> list[tuple[int, str]]:
    """Parse a simple-mode explain into (depth, text) rows.

    Tree markers are ``+- `` / ``:- `` at a column proportional to depth;
    continuation prefixes (``:  ``) keep column alignment, so marker
    position is a faithful depth key."""
    nodes: list[tuple[int, str]] = []
    for line in simple.splitlines():
        m = re.search(r"[+:]- ", line)
        if m:
            nodes.append((m.start(), line[m.end():]))
        elif line.strip():
            nodes.append((-1, line.strip()))  # root
    return nodes


_BOUNDED_BELOW = re.compile(
    # WindowGroupLimit: Spark's rank/row_number top-N pushdown — at most N
    # rows per group survive below it. Spark 4.1 usually rewrites the
    # single-group case to TakeOrderedAndProject, but a frame-spec change
    # or future planner can emit WindowGroupLimit → Exchange
    # SinglePartition, which is bounded and must not false-fail the sweep.
    r"TakeOrderedAndProject|CollectLimit|GlobalLimit|LocalLimit|WindowGroupLimit"
)
_PARTIAL_TOTAL_AGG = re.compile(
    # HashAggregate prints "keys=[]", SortAggregate prints "key=[]";
    # count-distinct rewrites emit merge_* instead of partial_*; column
    # pruning can empty the function list entirely ("functions=[]", e.g. a
    # scalar count whose value a cross-joined branch never reads) — a
    # keyless aggregate ships ≤1 row per upstream partition in every case
    r"(Hash|Sort|ObjectHash)Aggregate\(keys?=\[\], functions=\[(partial_|merge_|\])"
)


def _find_unbounded_single_partition(simple: str) -> tuple[str, ...]:
    """Every ``Exchange SinglePartition`` that concentrates an unbounded
    input onto one task.

    Bounded (not flagged) when the subtree below the exchange contains a
    limit (global top-N via orderBy().limit() — the surviving rows are
    ≤ n) or starts with a grand-total partial aggregate (scalar
    aggregates ship ≤1 row per upstream partition). Everything else —
    canonically a global Sort+Window — is the single-reducer class."""
    nodes = _plan_nodes(simple)
    flagged: list[str] = []
    for i, (depth, text) in enumerate(nodes):
        if "Exchange SinglePartition" not in text:
            continue
        bounded = False
        for j in range(i + 1, len(nodes)):
            d, t = nodes[j]
            if d <= depth:
                break
            if _BOUNDED_BELOW.search(t):
                bounded = True
                break
            # scalar-agg pattern: the exchange's DIRECT child is the
            # grand-total partial aggregate (≤1 row per partition)
            if j == i + 1 and _PARTIAL_TOTAL_AGG.search(t):
                bounded = True
                break
        if not bounded:
            # report the operator ABOVE the exchange (the sort/window)
            above = nodes[i - 1][1] if i else text
            flagged.append(above[:120])
    return tuple(flagged)


def audit(df: DataFrame, *, codegen: bool = False) -> PlanReport:
    """Build a :class:`PlanReport` from the query's optimized physical plan
    (plan compile only — nothing executes).

    ``codegen=True`` additionally counts WholeStageCodegen spans; under AQE
    that needs a second plan compile (see :func:`_count_codegen`), so it is
    opt-in to keep full-registry sweeps cheap.
    """
    simple = _explain(df, "simple")
    formatted = _explain(df, "formatted")
    joins = Counter()
    for op in JOIN_OPS:
        n = simple.count(op)
        if n:
            joins[op] = n
    spans = len(set(re.findall(r"codegen id : (\d+)", formatted)))
    if codegen and spans == 0:
        spans = _count_codegen(df)
    return PlanReport(
        simple=simple,
        formatted=formatted,
        scans=_parse_scans(formatted),
        join_strategies=joins,
        # "Exchange" counts physical shuffles/broadcasts; ReusedExchange is free
        exchanges=len(re.findall(r"\bExchange\b", simple)),
        reused_exchanges=simple.count("ReusedExchange"),
        codegen_spans=spans,
        python_eval="EvalPython" in simple or "MapInPandas" in simple
        or "MapInArrow" in simple
        or "FlatMapGroupsInPandas" in simple or "PythonUDTF" in simple,
        aqe="AdaptiveSparkPlan" in simple,
        unbounded_single_partition=_find_unbounded_single_partition(simple),
    )


def assert_plan(
    df: DataFrame,
    *,
    no_cartesian: bool = True,
    no_python_eval: bool = False,
    no_single_partition: bool = False,
    require_join: str | None = None,
    forbid_join: str | None = None,
    max_exchanges: int | None = None,
    max_scan_columns: int | None = None,
    require_pushed_filter: str | None = None,
    require_partition_filter: str | None = None,
) -> PlanReport:
    """Assert scale-critical plan properties; returns the report on success.

    Raises ``AssertionError`` with the offending plan excerpt — designed
    for use both in pytest and as a CI pre-deploy gate.
    """
    r = audit(df)
    if no_cartesian and r.has_cartesian:
        raise AssertionError("plan contains CartesianProduct:\n" + r.simple[:2000])
    if no_python_eval and r.python_eval:
        raise AssertionError("plan crosses the Python boundary:\n" + r.simple[:2000])
    if no_single_partition and r.unbounded_single_partition:
        raise AssertionError(
            "plan concentrates unbounded input on one task: "
            + "; ".join(r.unbounded_single_partition)
            + "\n" + r.simple[:2000]
        )
    if require_join and r.join_strategies.get(require_join, 0) == 0:
        raise AssertionError(
            f"expected {require_join}, planned {dict(r.join_strategies)}:\n" + r.simple[:2000]
        )
    if forbid_join and r.join_strategies.get(forbid_join, 0) > 0:
        raise AssertionError(f"plan uses forbidden {forbid_join}:\n" + r.simple[:2000])
    if max_exchanges is not None and (r.exchanges - r.reused_exchanges) > max_exchanges:
        raise AssertionError(
            f"{r.exchanges - r.reused_exchanges} exchanges (max {max_exchanges}):\n"
            + r.simple[:2000]
        )
    if max_scan_columns is not None:
        for s in r.scans:
            if len(s.read_columns) > max_scan_columns:
                raise AssertionError(
                    f"scan reads {len(s.read_columns)} columns {s.read_columns} "
                    f"(max {max_scan_columns}) — projection not pruned"
                )
    if require_pushed_filter is not None:
        if not any(
            any(require_pushed_filter in f for f in s.pushed_filters) for s in r.scans
        ):
            raise AssertionError(
                f"no scan pushes filter matching {require_pushed_filter!r}; "
                + "; ".join(str(s.pushed_filters) for s in r.scans)
            )
    if require_partition_filter is not None:
        if not any(
            any(require_partition_filter in f for f in s.partition_filters)
            for s in r.scans
        ):
            raise AssertionError(
                f"no scan has partition filter matching {require_partition_filter!r}"
            )
    return r
