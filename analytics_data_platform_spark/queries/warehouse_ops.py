"""Warehouse-modeling operators: SCD2 dimension history, CUBE
aggregation, one-pass column profiling.

The dbt layer of the reference models dimensions and data-health tests;
these are the Spark-first formulations of the three shapes it leans on
that were not yet registry-covered: type-2 snapshot history
(tables/scd2.py), multi-dimensional subtotal lattices (CUBE — ROLLUP is
covered by rollup_order_revenue), and per-column profiling
(operators/profile.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.operators.profile import profile_columns
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.queries.exact import money, sum_money
from analytics_data_platform_spark.sources.testdata import load_table
from analytics_data_platform_spark.tables.scd2 import scd2_apply

T0 = "2024-01-01 00:00:00"
T1 = "2024-06-01 00:00:00"


def scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a market-segment snapshot to a type-2 customer dimension.

    Every 10th customer relocates segment; one brand-new key arrives.
    The operator closes changed rows at T1, keeps unchanged rows open,
    and inserts new current versions — full history preserved.
    """
    cust = load_table(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit(T0).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = cust.where(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.lit("RELOCATED").alias("c_mktsegment")
    ).unionByName(
        spark.createDataFrame([(-1, "BUILDERS")], "c_custkey long, c_mktsegment string")
    )
    return scd2_apply(
        dim,
        changes,
        keys=["c_custkey"],
        tracked=["c_mktsegment"],
        effective_ts=F.lit(T1).cast("timestamp"),
    )


SCD2_SQL = f"""
WITH dim AS (
  SELECT c_custkey, c_mktsegment,
         TIMESTAMP '{T0}' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to,
         TRUE AS is_current
  FROM customer
),
changes AS (
  SELECT c_custkey, 'RELOCATED' AS c_mktsegment FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT CAST(-1 AS BIGINT), 'BUILDERS'
),
applied AS (
  SELECT c.c_custkey, c.c_mktsegment FROM changes c
  WHERE NOT EXISTS (
    SELECT 1 FROM dim d
    WHERE d.c_custkey = c.c_custkey
      AND d.c_mktsegment IS NOT DISTINCT FROM c.c_mktsegment
  )
),
closed AS (
  SELECT d.c_custkey, d.c_mktsegment, d.valid_from,
         TIMESTAMP '{T1}' AS valid_to, FALSE AS is_current
  FROM dim d WHERE d.c_custkey IN (SELECT c_custkey FROM applied)
),
unchanged AS (
  SELECT * FROM dim WHERE c_custkey NOT IN (SELECT c_custkey FROM applied)
),
fresh AS (
  SELECT c_custkey, c_mktsegment,
         TIMESTAMP '{T1}' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
  FROM applied
)
SELECT * FROM unchanged
UNION ALL SELECT * FROM closed
UNION ALL SELECT * FROM fresh
"""

register(
    QuerySpec(
        "scd2_customer_segments",
        scd2_customer_segments,
        SCD2_SQL,
        doc="SCD2 snapshot apply: close changed, keep unchanged, insert new",
        cites="warehouse modeling: dbt-style type-2 snapshot",
        tags=("scd2", "merge"),
    )
)


def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(status, priority): the full subtotal lattice in one pass
    (both one-dimension margins + grand total; ROLLUP only nests)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        sum_money("o_totalprice").alias("revenue"),
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

register(
    QuerySpec(
        "cube_orders_status_priority",
        cube_orders_status_priority,
        CUBE_SQL,
        doc="CUBE subtotal lattice over (status, priority)",
        cites="SURVEY §2.4 note: grouping sets free in Spark",
        tags=("agg", "cube"),
    )
)


def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the documents table in ONE aggregation pass
    (nulls, exact distincts, string-cast min/max per column)."""
    return profile_columns(load_table(spark, sf_dir, "documents"))


def _profile_col_sql(c: str) -> str:
    return (
        f"SELECT '{c}' AS col_name,"
        f" COUNT(*) - COUNT({c}) AS n_nulls,"
        f" COUNT(DISTINCT {c}) AS n_distinct,"
        f" MIN(CAST({c} AS VARCHAR)) AS min_val,"
        f" MAX(CAST({c} AS VARCHAR)) AS max_val FROM documents"
    )


PROFILE_SQL = "\nUNION ALL\n".join(
    _profile_col_sql(c) for c in ["doc_id", "text", "lang", "source", "n_chars"]
)

register(
    QuerySpec(
        "profile_documents",
        profile_documents,
        PROFILE_SQL,
        doc="one-pass per-column table profile (nulls/distincts/min/max)",
        cites="warehouse modeling: dbt-style data-health audit",
        tags=("profile", "agg"),
    )
)


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-`test`-style data-quality report over the corpus: one row per
    declared expectation — uniqueness, not-null, accepted values,
    referential integrity (relationships), and SQL expression checks —
    with its violation count, passes included.

    Runs through TransformDag.test_report (plans/dag.py), the same engine
    the warehouse DAG gates its models with (reference: dbt data_tests,
    cycles.yml not_null/unique/accepted_values + dbt_utils expression /
    relationships). Each table contributes ONE wide aggregation pass for
    its in-row checks; each relationships check is one anti-join count;
    the report is a lazy union — no driver-side loop over data."""
    from analytics_data_platform_spark.plans.dag import (
        TransformDag,
        accepted_values,
        expression,
        not_null,
        relationships,
        unique,
    )

    tables = {
        t: load_table(spark, sf_dir, t)
        for t in ("orders", "lineitem", "customer", "nation", "documents", "events")
    }
    tests = {
        "orders": [
            unique("o_orderkey"),
            not_null("o_custkey"),
            accepted_values("o_orderstatus", ["F", "O", "P"]),
            relationships("o_custkey", "customer", "c_custkey"),
            expression("positive_total", "o_totalprice > 0"),
        ],
        "lineitem": [
            not_null("l_orderkey"),
            relationships("l_orderkey", "orders", "o_orderkey"),
            expression("discount_in_unit_range", "l_discount >= 0.0 AND l_discount <= 0.1"),
            expression("ship_before_2000", "l_shipdate < DATE '2000-01-01'"),
        ],
        "customer": [
            unique("c_custkey"),
            relationships("c_nationkey", "nation", "n_nationkey"),
        ],
        "documents": [
            unique("doc_id"),
            not_null("text"),
            expression("n_chars_matches_text", "n_chars = length(text)"),
        ],
        "events": [
            not_null("user_id"),
            accepted_values("event_type", ["view", "click", "purchase", "signup", "error"]),
        ],
    }
    return TransformDag().test_report(tables, tests)


DQ_SQL = """
SELECT 'orders' AS model, 'unique' AS check, 'o_orderkey' AS "column",
       CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS violations FROM orders
UNION ALL
SELECT 'orders', 'not_null', 'o_custkey',
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'orders', 'accepted_values', 'o_orderstatus',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') AND o_orderstatus IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'orders', 'relationships', 'o_custkey->customer.c_custkey',
       CAST(COUNT(*) AS BIGINT) FROM orders
WHERE o_custkey IS NOT NULL AND o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'orders', 'expression', 'positive_total',
       CAST(SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT) FROM orders
UNION ALL
SELECT 'lineitem', 'not_null', 'l_orderkey',
       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'lineitem', 'relationships', 'l_orderkey->orders.o_orderkey',
       CAST(COUNT(*) AS BIGINT) FROM lineitem
WHERE l_orderkey IS NOT NULL AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'lineitem', 'expression', 'discount_in_unit_range',
       CAST(SUM(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.1) THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem', 'expression', 'ship_before_2000',
       CAST(SUM(CASE WHEN NOT (l_shipdate < DATE '2000-01-01') THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'customer', 'unique', 'c_custkey',
       CAST(COUNT(c_custkey) - COUNT(DISTINCT c_custkey) AS BIGINT) FROM customer
UNION ALL
SELECT 'customer', 'relationships', 'c_nationkey->nation.n_nationkey',
       CAST(COUNT(*) AS BIGINT) FROM customer
WHERE c_nationkey IS NOT NULL AND c_nationkey NOT IN (SELECT n_nationkey FROM nation)
UNION ALL
SELECT 'documents', 'unique', 'doc_id',
       CAST(COUNT(doc_id) - COUNT(DISTINCT doc_id) AS BIGINT) FROM documents
UNION ALL
SELECT 'documents', 'not_null', 'text',
       CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM documents
UNION ALL
SELECT 'documents', 'expression', 'n_chars_matches_text',
       CAST(SUM(CASE WHEN NOT (n_chars = length(text)) THEN 1 ELSE 0 END) AS BIGINT) FROM documents
UNION ALL
SELECT 'events', 'not_null', 'user_id',
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events
UNION ALL
SELECT 'events', 'accepted_values', 'event_type',
       CAST(SUM(CASE WHEN event_type NOT IN ('view','click','purchase','signup','error')
                AND event_type IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) FROM events
"""

register(
    QuerySpec(
        "dq_expectations",
        dq_expectations,
        DQ_SQL,
        doc="dbt-style data-quality expectation report (16 checks, violations per check)",
        cites="reference dbt data_tests: cycles.yml:5-21; dbt_utils expression/relationships",
        tags=("warehouse", "quality"),
    )
)


# --- point-in-time join: facts against an SCD2 dimension -------------------

PIT_GOLD = 500_000.0
PIT_PLAT = 900_000.0


def pit_join_orders_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join: every order is attributed to the loyalty
    tier the customer held ON THE ORDER DATE, against an SCD2-style
    version table (base segment from 1994, then a tier recomputed from
    each closed year's exact-decimal spend, effective Jan 1 of the next
    year). This is the late-arriving-fact pattern every warehouse needs
    and plain equi-joins get silently wrong.

    Scale shape: the version table is built with one (custkey, year)
    aggregation, and the temporal match uses the union+ordered-window
    as-of plan (operators/asof.py) — ONE shuffle on custkey, no
    inequality nested-loop. Tier thresholds compare exact DECIMAL sums
    so version boundaries cannot drift between engines."""
    from analytics_data_platform_spark.operators.asof import asof_join
    from analytics_data_platform_spark.queries.exact import sum_money

    o = load_table(spark, sf_dir, "orders")
    yearly = (
        o.groupBy("o_custkey", F.year("o_orderdate").alias("yr"))
        .agg(sum_money("o_totalprice").alias("spend"))
    )
    tier = (
        F.when(F.col("spend") >= PIT_PLAT, "platinum")
        .when(F.col("spend") >= PIT_GOLD, "gold")
        .otherwise("standard")
    )
    versions = yearly.select(
        F.col("o_custkey").alias("custkey"),
        tier.alias("tier"),
        F.to_timestamp(F.concat((F.col("yr") + 1).cast("string"), F.lit("-01-01"))).alias(
            "valid_from"
        ),
    )
    base = (
        o.select(F.col("o_custkey").alias("custkey")).distinct()
        .select("custkey", F.lit("new").alias("tier"),
                F.to_timestamp(F.lit("1994-01-01")).alias("valid_from"))
    )
    dim = base.unionByName(versions)
    fact = o.select("o_orderkey", F.col("o_custkey").alias("custkey"), "o_orderdate", "o_totalprice")
    joined = asof_join(
        fact, dim, on=["custkey"], left_ts="o_orderdate", right_ts="valid_from",
        value_cols=["tier"], suffix="",
    )
    return (
        joined.groupBy(F.col("tier"), F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(F.count(F.lit(1)).alias("n_orders"), sum_money("o_totalprice").alias("revenue"))
    )


PIT_SQL = f"""
WITH yearly AS (
  SELECT o_custkey AS custkey, year(o_orderdate) AS yr,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY 1, 2
),
versions AS (
  SELECT custkey,
         CASE WHEN spend >= {PIT_PLAT} THEN 'platinum'
              WHEN spend >= {PIT_GOLD} THEN 'gold'
              ELSE 'standard' END AS tier,
         CAST((yr + 1) || '-01-01' AS TIMESTAMP) AS valid_from
  FROM yearly
),
dim AS (
  SELECT DISTINCT o_custkey AS custkey, 'new' AS tier,
         TIMESTAMP '1994-01-01' AS valid_from
  FROM orders
  UNION ALL SELECT * FROM versions
),
matched AS (
  SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate, d.tier
  FROM orders o ASOF JOIN dim d
    ON o.o_custkey = d.custkey AND o.o_orderdate >= d.valid_from
)
SELECT tier, CAST(year(o_orderdate) AS INT) AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM matched GROUP BY 1, 2
"""

register(
    QuerySpec(
        "pit_join_orders_tier",
        pit_join_orders_tier,
        PIT_SQL,
        doc="point-in-time join of orders against an SCD2 tier dimension (as-of plan)",
        cites="warehouse temporal family; operators/asof.py union+window single-shuffle",
        tags=("warehouse", "asof", "join"),
    )
)


# --- ratio-to-parent over the rollup lattice -------------------------------


def ratio_to_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP ratio-to-parent: revenue by region→nation with each nation's
    share of its region and each region's share of the grand total —
    the drill-down percentage column every BI tool derives. Computed from
    ONE rollup pass: window sums over the lattice levels (partitioned by
    grouping id) provide the parent denominators without re-aggregating.
    Shares divide exact decimal-summed revenues, so they are engine-stable."""
    from analytics_data_platform_spark.queries.exact import sum_money

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    enriched = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    lattice = (
        enriched.rollup("r_name", "n_name")
        .agg(sum_money("o_totalprice").alias("revenue"), F.grouping_id().alias("gid"))
    )
    w_region = Window.partitionBy("gid", "r_name")
    w_level = Window.partitionBy("gid")
    share_of_parent = (
        F.when(F.col("gid") == 0, F.col("revenue") / F.sum("revenue").over(w_region))
        .when(F.col("gid") == 1, F.col("revenue") / F.sum("revenue").over(w_level))
        .otherwise(F.lit(1.0))
    )
    return lattice.select(
        "r_name", "n_name", "gid", "revenue",
        F.round(share_of_parent, 6).alias("share_of_parent"),
    )


RATIO_PARENT_SQL = """
WITH lattice AS (
  SELECT r_name, n_name,
         GROUPING(r_name) * 2 + GROUPING(n_name) AS gid,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY ROLLUP (r_name, n_name)
)
SELECT r_name, n_name, gid, revenue,
       ROUND(CASE WHEN gid = 0 THEN revenue / SUM(revenue) OVER (PARTITION BY gid, r_name)
                  WHEN gid = 1 THEN revenue / SUM(revenue) OVER (PARTITION BY gid)
                  ELSE 1.0 END, 6) AS share_of_parent
FROM lattice
"""

register(
    QuerySpec(
        "ratio_to_parent_rollup",
        ratio_to_parent_rollup,
        RATIO_PARENT_SQL,
        doc="ratio-to-parent drill-down shares over one region→nation rollup pass",
        cites="OLAP lattice family; windows over grouping_id avoid re-aggregation",
        tags=("warehouse", "rollup", "window"),
    )
)


# --- referential-integrity audit over every FK edge ------------------------

_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: for every declared FK edge, the child
    row count, orphan count, and distinct child key cardinality — the
    first report a warehouse runs after every load.

    ONE child scan + ONE child shuffle per edge, in the INITIAL plan: the
    child groups to (k, cnt) once, then a LEFT OUTER join against the
    parent's DEDUPED key set attaches a hit marker, and a single keyless
    aggregate folds all three stats — ``sum(cnt)`` = rows, ``count(k)`` =
    distinct non-null keys, ``sum(cnt) where no hit`` = orphan rows.
    The r10 shape (two branches over a shared grouped subtree + anti-join
    + crossJoin) relied on runtime ReusedExchange, which Catalyst's
    anti-join-below-aggregate pushdown silently defeated (the pushed
    branch re-scanned the child per edge); the outer-join form needs no
    reuse because there is only one branch. Equivalence: parent keys are
    deduped before the join (multiplicity exactly 1 per g row), a null
    child key never matches (left join on ``=``), so null-key rows count
    as orphans and are excluded from n_child_keys by both formulations —
    identical to the old anti-join fold. The parent side is key-sized
    (|parent keys|, deduped map-side) and the planner picks
    broadcast/shuffle by size as before."""
    parts = []
    for edge, child_t, child_k, parent_t, parent_k in _FK_EDGES:
        child = load_table(spark, sf_dir, child_t).select(F.col(child_k).alias("k"))
        parent_keys = (
            load_table(spark, sf_dir, parent_t)
            .select(F.col(parent_k).alias("k"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        g = child.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
        parts.append(
            g.join(parent_keys, "k", "left").agg(
                F.lit(edge).alias("fk_edge"),
                F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_child_rows"),
                F.count("k").alias("n_child_keys"),
                F.coalesce(
                    F.sum(F.when(F.col("_hit").isNull(), F.col("cnt"))), F.lit(0)
                ).alias("n_orphans"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("fk_edge", "n_child_rows", "n_child_keys", "n_orphans")


_FK_SQL_ROWS = "\nUNION ALL\n".join(
    f"""SELECT '{edge}' AS fk_edge,
       (SELECT COUNT(*) FROM {child_t}) AS n_child_rows,
       (SELECT COUNT(DISTINCT {child_k}) FROM {child_t}) AS n_child_keys,
       (SELECT COUNT(*) FROM {child_t} c WHERE NOT EXISTS
          (SELECT 1 FROM {parent_t} p WHERE p.{parent_k} = c.{child_k})) AS n_orphans"""
    for edge, child_t, child_k, parent_t, parent_k in _FK_EDGES
)
FK_SQL = _FK_SQL_ROWS

register(
    QuerySpec(
        "fk_integrity_audit",
        fk_integrity_audit,
        FK_SQL,
        doc="orphan + cardinality audit for every foreign-key edge in the schema",
        cites="warehouse data-quality family; companion to dq_expectations",
        tags=("warehouse", "dq", "join"),
    )
)


def cdc_apply_changes_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY CHANGES over the events stream read as a changelog:
    ``error`` events are delete tombstones, everything else upserts; the
    sequence is (ts, event_id) so out-of-order arrival cannot change the
    outcome. The collapsed per-user state is then profiled per surviving
    event_type (exact DECIMAL value sums).

    Operator: operators/cdc.py::apply_changes — one key shuffle with
    map-side max(struct) partials, never a per-key sort buffer. This is
    the step that turns a raw Debezium-style feed into the pre-collapsed
    batch the upsert sink (S13) merges.
    """
    from analytics_data_platform_spark.operators.cdc import apply_changes

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
        "event_type",
        money("value").alias("value_d"),
    )
    state = apply_changes(
        e, key_cols=["user_id"], seq_cols=["ts", "event_id"], op_col="op"
    )
    return (
        state.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("value_d").cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


CDC_APPLY_SQL = """
WITH e AS (
  -- order by the RAW nanosecond epoch, not CAST(ts AS TIMESTAMP): the cast
  -- truncates TIMESTAMP_NS to microseconds while the Spark side compares
  -- full-precision values, so two changes for one user within the same
  -- microsecond whose nano order opposes event_id order would diverge
  SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
         event_type, CAST(value AS DECIMAL(18,2)) AS value_d
  FROM events
),
latest AS (
  SELECT user_id, op, event_type, value_d FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts_ns DESC, event_id DESC) AS rn
    FROM e
  ) WHERE rn = 1
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(value_d) AS DOUBLE) AS total_value
FROM latest WHERE op <> 'delete'
GROUP BY event_type
ORDER BY event_type
"""

register(
    QuerySpec(
        "cdc_apply_changes_state",
        cdc_apply_changes_state,
        CDC_APPLY_SQL,
        doc="CDC apply_changes: out-of-order changelog -> current state (deletes tombstoned), per-type profile",
        cites="warehouse family: DLT apply_changes semantics; feeds the S13 upsert sink",
        tags=("warehouse", "cdc"),
    )
)
