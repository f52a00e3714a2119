"""Distributed global-order primitives — no single-partition windows.

A `Window.orderBy(...)` with no partition spec moves EVERY row to one
task (`WindowExec: No Partition Defined ... moving all data to a single
partition`). At sf0.1 that is milliseconds; over 100 TB it is a
single-reducer sort — the same defect class as the round-1 ANN top-k.
This module provides the scale-safe replacements:

- :func:`top_n_with_pos` — global "rank the top N" via
  ``orderBy().limit(n)``: the planner emits ``TakeOrderedAndProject``
  (per-partition top-n, merged on one task over ≤ n·P rows), and the
  position window then runs over the ≤ n surviving rows only.
- :func:`with_global_order` — global row_number / exact running totals
  via deterministic range bucketing + a two-pass prefix sum: bucket
  boundaries are discovered once (approx quantiles / seeded sample),
  embedded as *literals*, each bucket computes local ranks/cumsums in a
  hash-partitioned window, and cross-bucket offsets come from a
  triangular broadcast self-join over the ≤ B per-bucket totals. One
  full-data shuffle, no ``Exchange SinglePartition`` anywhere.
- :func:`ntile_distributed` — exact NTILE(k) from the two-pass global
  rank + total count (identical bucket assignment to the SQL NTILE
  given a total tie-break order).

Exactness contract: prefix sums are re-associated across buckets
(local-sum + offset), so accumulators must be EXACT types — integral or
DECIMAL — to be value-identical to a sequential scan. Doubles would
drift by association order; callers cast to DECIMAL first and to DOUBLE
after (the same contract as queries/exact.py).

Determinism contract: the bucket id is computed from literal boundaries,
so every branch of the plan sees the same bucketing even if Catalyst
does not reuse the exchange — unlike ``repartitionByRange`` +
``spark_partition_id()``, whose sampled bounds differ per evaluation.
Boundary *placement* only affects load balance, never results: any
monotone bucketing yields the same global order. Order keys must be
non-null (Spark sorts nulls first ASC / last DESC while DuckDB defaults
nulls last — the callers here all order over non-null aggregates).

Reference parity: the reference's Trino surface leans on single-node
ORDER BY for these shapes (SURVEY §3.3 interactive analytics); this is
the Spark-first re-expression that survives a 1000-executor cluster.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    TimestampType,
)

_NUMERIC = (
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType, DecimalType,
)

# Buckets for the two-pass prefix scan. More buckets = better balance but a
# larger (still trivial) B^2 triangular offset join; 64 keeps per-bucket
# input ~1.6% of rows while the offset join stays at 4k pairs.
DEFAULT_BUCKETS = 64


def _materialize(df: DataFrame) -> DataFrame:
    """Lazy localCheckpoint: the first job over ``df`` (the boundary
    discovery pass) materializes its partitions; the main plan and any
    chained scan then reuse them instead of recomputing the upstream
    aggregate once per pass — without this, a 3×-chained NTILE (RFM)
    recomputes its groupBy cascade ~7×. Tradeoff: localCheckpoint drops
    lineage, so a lost executor fails the job instead of recomputing —
    acceptable for the short-lived scans here (same call the iterative
    graph operators already make)."""
    return df.localCheckpoint(eager=False)


def top_n_with_pos(
    df: DataFrame,
    order_by: Sequence[Column | str],
    n: int,
    pos_col: str = "pos",
) -> DataFrame:
    """Top-``n`` rows in global ``order_by`` order with a 1-based position.

    ``orderBy(...).limit(n)`` plans as ``TakeOrderedAndProject`` — each
    partition keeps its own top-n and one task merges P candidate heaps
    of ≤ n rows — so no full-data sort or single-partition shuffle ever
    happens. The ``row_number`` window then runs over the ≤ n surviving
    rows (the plan auditor recognises the limit-bounded input).

    ``order_by`` must be a total order (include a unique tie-break) for
    deterministic, oracle-matching results.
    """
    top = df.orderBy(*order_by).limit(n)
    return top.withColumn(pos_col, F.row_number().over(Window.orderBy(*order_by)))


def _boundaries(df: DataFrame, key: str, nbuckets: int) -> list:
    """Discover ≤ nbuckets-1 ascending boundary values for ``key``.

    Numeric/date keys use approxQuantile (one distributed pass, driver
    gets ≤ nbuckets-1 values). Other orderable types fall back to a
    seeded sample. Boundary quality only affects balance, not results.
    """
    dt = df.schema[key].dataType
    probs = [i / nbuckets for i in range(1, nbuckets)]
    if isinstance(dt, _NUMERIC):
        qs = df.stat.approxQuantile(key, probs, 0.001)
        return sorted(set(qs))
    if isinstance(dt, (DateType, TimestampType)):
        num = df.select(F.col(key).cast("double").alias("_k")).dropna()
        qs = num.stat.approxQuantile("_k", probs, 0.001)
        return sorted(set(qs))
    # orderable non-numeric (e.g. string ids): bounded seeded sample
    rows = [
        r[0]
        for r in df.select(key).dropna().sample(False, 0.05, seed=7).limit(100_000).collect()
    ]
    if not rows:
        return []
    rows.sort()
    step = max(1, len(rows) // nbuckets)
    return sorted(set(rows[step::step][: nbuckets - 1]))


def _boundaries_map(df: DataFrame, keys: Sequence[str], nbuckets: int) -> dict[str, list]:
    """Boundary sets for several keys, with all numeric keys batched into
    ONE approxQuantile pass (one job instead of one per key)."""
    probs = [i / nbuckets for i in range(1, nbuckets)]
    numeric = [k for k in keys if isinstance(df.schema[k].dataType, _NUMERIC)]
    out: dict[str, list] = {}
    if numeric:
        qss = df.stat.approxQuantile(numeric, probs, 0.001)
        for k, qs in zip(numeric, qss):
            out[k] = sorted(set(qs))
    for k in keys:
        if k not in out:
            out[k] = _boundaries(df, k, nbuckets)
    return out


def _bucket_expr(df: DataFrame, key: str, bounds: list, descending: bool) -> Column:
    """Monotone bucket id from literal boundaries (ties stay together).

    A plain sum of boundary comparisons — deliberately no higher-order
    function: a lambda capturing the key column breaks when Catalyst
    pushes the derived isnotnull(bucket) filter through later joins
    (attribute-not-found at bind time, observed on Spark 4.1). Numeric
    and date keys build the whole sum as ONE ``F.expr`` SQL string — a
    fluent 63-term Column chain costs ~200 py4j round trips per call
    site (seconds of driver time; same class as the SCALE.md "driver-side
    costs are real" record); the parse result and codegen are identical."""
    if not bounds:
        return F.lit(0)
    dt = df.schema[key].dataType
    op = ">" if descending else "<"  # descending: #boundaries strictly greater
    if isinstance(dt, (DateType, TimestampType)):
        k = f"CAST(`{key}` AS DOUBLE)"
        lits = [f"CAST({float(b)!r} AS DOUBLE)" for b in bounds]
    elif isinstance(dt, _NUMERIC):
        k = f"`{key}`"
        sql_t = dt.simpleString().upper()
        # same value semantics as F.lit(b).cast(dt): approxQuantile hands
        # back doubles; the cast reproduces the exact literal the Column
        # path produced (double→integral truncates identically)
        lits = [f"CAST({float(b)!r} AS {sql_t})" for b in bounds]
    else:
        # non-numeric (string ids from the sample fallback): keep the
        # fluent path — values need proper literal escaping, and this
        # branch is rare and small
        kcol = F.col(key)
        out = (F.lit(bounds[0]) > kcol if descending else F.lit(bounds[0]) < kcol).cast("int")
        for b in bounds[1:]:
            t = (F.lit(b) > kcol if descending else F.lit(b) < kcol).cast("int")
            out = out + t
        return out
    return F.expr(" + ".join(f"CAST(({b} {op} {k}) AS INT)" for b in lits))


def with_global_order(
    df: DataFrame,
    key: str,
    *,
    descending: bool = False,
    tiebreaks: Sequence[Column | str] = (),
    rank_col: str | None = None,
    prefix_sums: dict[str, Column | str] | None = None,
    running_totals: dict[str, Column | str] | None = None,
    prefix_maxes_excl: dict[str, Column | str] | None = None,
    total_count_col: str | None = None,
    nbuckets: int = DEFAULT_BUCKETS,
    _pre_materialized: bool = False,
    _bounds: list | None = None,
) -> DataFrame:
    """Attach a global row_number and/or exact inclusive running totals
    in ``(key [desc], *tiebreaks)`` order, without a global window.

    ``prefix_sums``/``running_totals`` (synonyms) map output column →
    input column; inputs must be exact types (integral/decimal) so the
    bucket-local-sum + cross-bucket-offset association matches a
    sequential scan bit-for-bit.

    ``prefix_maxes_excl`` maps output column → input column for the
    EXCLUSIVE running maximum (max over all strictly-preceding rows;
    NULL on the globally first row) — the skyline/running-record shape.
    Max is associative and commutative, so any input type is exact.

    Plan shape: one hash shuffle on the literal-boundary bucket id; ONE
    Window pass for the in-bucket cumulatives; per-bucket totals come
    from a separate cheap partial aggregate (map-side combine — not a
    second evaluation of the window) over the same materialized input,
    offset by a triangular join over ≤ B rows and broadcast-joined back.
    No Exchange SinglePartition. The input is localCheckpoint'd so the
    boundary pass, the totals pass, and the window pass share one
    computation of the upstream plan.
    """
    sums = dict(prefix_sums or {})
    sums.update(running_totals or {})
    maxes = dict(prefix_maxes_excl or {})
    if rank_col is None and not sums and not maxes and total_count_col is None:
        raise ValueError("need rank_col, prefix_sums, and/or prefix_maxes_excl")
    if not _pre_materialized:
        df = _materialize(df)
    key_order = F.desc(key) if descending else F.asc(key)
    order = [key_order, *tiebreaks]
    bounds = _bounds if _bounds is not None else _boundaries(df, key, nbuckets)
    b = df.withColumn("_bkt", _bucket_expr(df, key, bounds, descending))
    w_cum = (
        Window.partitionBy("_bkt").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    proj: list[Column] = [F.col(c) for c in df.columns] + [F.col("_bkt")]
    proj.append(F.row_number().over(w_cum).cast("long").alias("_lrank"))
    for out, src in sums.items():
        proj.append(F.sum(src).over(w_cum).alias(f"_l_{out}"))
    w_cum_excl = (
        Window.partitionBy("_bkt").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    for out, src in maxes.items():
        proj.append(F.max(src).over(w_cum_excl).alias(f"_l_{out}"))
    local = b.select(*proj)
    # per-bucket totals as a plain aggregate (same rows, same exact
    # types → identical values to a whole-bucket window, at partial-agg
    # cost instead of a second window evaluation)
    totals = b.groupBy("_bkt").agg(
        F.count(F.lit(1)).alias("_t_n"),
        *[F.sum(src).alias(f"_t_{out}") for out, src in sums.items()],
        *[F.max(src).alias(f"_t_{out}") for out, src in maxes.items()],
    )
    # Exclusive cross-bucket offsets. The bucket id is ≤ nbuckets-1 by
    # construction, so totals has ≤ nbuckets rows; the explicit limit()
    # never drops a row — it makes the bound visible to the planner (and
    # to the single-partition audit), so the tiny offset window runs over
    # provably bounded input.
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = totals.limit(nbuckets).select(
        "_bkt",
        F.coalesce(F.sum("_t_n").over(w_off), F.lit(0)).alias("_o_n"),
        *(
            [F.sum("_t_n").over(w_tot).alias("_g_n")]
            if total_count_col is not None
            else []
        ),
        *[F.sum(f"_t_{out}").over(w_off).alias(f"_o_{out}") for out in sums],
        *[F.max(f"_t_{out}").over(w_off).alias(f"_o_{out}") for out in maxes],
    )
    joined = local.join(F.broadcast(offsets), "_bkt")
    final: list[Column] = [F.col(c) for c in df.columns]
    if rank_col is not None:
        final.append((F.col("_lrank") + F.col("_o_n")).alias(rank_col))
    if total_count_col is not None:
        # grand total row count (offset window over the ≤ B bucket totals)
        final.append(F.col("_g_n").cast("long").alias(total_count_col))
    for out, src in sums.items():
        zero = F.lit(0).cast(joined.schema[f"_l_{out}"].dataType)
        final.append(
            (F.col(f"_l_{out}") + F.coalesce(F.col(f"_o_{out}"), zero)).alias(out)
        )
    for out in maxes:
        # greatest() skips NULLs: NULL only when no preceding row exists
        # anywhere — exactly the exclusive-frame semantics
        final.append(
            F.greatest(F.col(f"_l_{out}"), F.col(f"_o_{out}")).alias(out)
        )
    return joined.select(*final)


def ntile_distributed(
    df: DataFrame,
    key: str,
    n: int,
    out_col: str,
    *,
    descending: bool = False,
    tiebreaks: Sequence[Column | str] = (),
    nbuckets: int = DEFAULT_BUCKETS,
    _pre_materialized: bool = False,
    _bounds: list | None = None,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY key [DESC], *tiebreaks)`` without
    a single-partition window.

    SQL NTILE semantics: with ``total = q*n + r``, the first ``r`` tiles
    get ``q+1`` rows and the rest get ``q``; given a total (tie-broken)
    order this is a pure function of (global row_number, total count),
    both of which the two-pass scan provides in one evaluation (the
    total rides the ≤ B-row bucket-totals frame — no extra count job).
    Bucket assignment is therefore identical to Spark's and DuckDB's
    NTILE over the same order.
    """
    ranked = with_global_order(
        df, key, descending=descending, tiebreaks=tiebreaks,
        rank_col="_gr", total_count_col="_tc", nbuckets=nbuckets,
        _pre_materialized=_pre_materialized, _bounds=_bounds,
    )
    tile = _ntile_from_rank(F.col("_gr"), F.col("_tc"), n)
    return ranked.withColumn(out_col, tile).drop("_gr", "_tc")


def multi_global_ranks(
    df: DataFrame,
    on: Sequence[str],
    specs: Sequence[dict],
    nbuckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Attach several INDEPENDENT global rank / NTILE columns (different
    order keys over the same rows — the RFM / multi-criteria-scorecard
    shape) from one materialized input.

    ``on``: join-key column names uniquely identifying each row.
    ``specs``: dicts with ``key`` (order column), ``out`` (output
    column), and optionally ``descending`` (bool), ``tiebreaks``
    (column NAMES), ``ntile`` (int → NTILE id instead of a rank).

    Chaining :func:`with_global_order` calls would re-evaluate every
    earlier stage's windows at each step (each call references its input
    twice); instead the base is localCheckpoint'd ONCE, every numeric
    boundary set comes from one batched approxQuantile pass, each spec
    ranks a slim (on ∪ key ∪ tiebreaks) projection of the base, and the
    rank columns equi-join back on ``on`` — parallel hash joins, no
    cascade."""
    base = _materialize(df)
    bounds = _boundaries_map(base, sorted({s["key"] for s in specs}), nbuckets)
    out = base
    for s in specs:
        tiebreaks = [c for c in s.get("tiebreaks", ()) if c not in ("",)]
        cols = list(dict.fromkeys([*on, s["key"], *tiebreaks]))
        slim = base.select(*cols)
        kw = dict(
            descending=bool(s.get("descending", False)),
            tiebreaks=tiebreaks,
            nbuckets=nbuckets,
            _pre_materialized=True,
            _bounds=bounds[s["key"]],
        )
        k = s.get("ntile")
        if k:
            ranked = ntile_distributed(slim, s["key"], k, s["out"], **kw)
        else:
            ranked = with_global_order(slim, s["key"], rank_col=s["out"], **kw)
        out = out.join(ranked.select(*on, s["out"]), list(on))
    return out


def _idiv(a: Column, b: Column) -> Column:
    """Exact non-negative integer division as a Column (a - a%b is an
    exact multiple of b, so the double divide is exact below 2^53)."""
    return ((a - a % b) / b).cast("long")


def _ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """NTILE tile id as a closed-form function of (row_number, count)."""
    q = _idiv(total, F.lit(n))
    r = total % n
    big = r * (q + F.lit(1))  # rows covered by the (q+1)-sized tiles
    return (
        F.when(rank <= big, _idiv(rank - 1, q + 1) + 1)
        .otherwise(r + _idiv(rank - big - 1, F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )
