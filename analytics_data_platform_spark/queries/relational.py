"""Operator-parity suite: one query per reference operator family.

Each query mirrors a concrete operator in SURVEY.md §2 (pivot A1, window lag
W1, interval join J4, scalar subquery J5, union-dedup U1, computed-key join
J2, anti/semi joins P7/P3, dialect functions F*), re-expressed over the
driver corpus so the DuckDB oracle can certify semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.functions.dialect import (
    equipment_category_key,
    substring_from_end,
)
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.queries.exact import money, sum_money
from analytics_data_platform_spark.sources.testdata import load_table

# --- A1: conditional-aggregation pivot (EAV → wide) -----------------------


def eav_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EAV-style pivot: per user, min/max/sum of values by event_type.

    Mirrors the reference's min(CASE column_title WHEN ... END) pivot that
    turns the Opralog EAV table into a wide record.
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.round(F.min(F.when(F.col("event_type") == "click", F.col("value"))), 2).alias(
            "click_min"
        ),
        F.round(F.max(F.when(F.col("event_type") == "purchase", F.col("value"))), 2).alias(
            "purchase_max"
        ),
        F.sum(F.when(F.col("event_type") == "view", money("value"))).cast("double").alias(
            "view_sum"
        ),
        F.count(F.when(F.col("event_type") == "error", F.lit(1))).alias("error_count"),
    )


EAV_PIVOT_SQL = """
SELECT user_id,
       ROUND(MIN(CASE WHEN event_type = 'click' THEN value END), 2) AS click_min,
       ROUND(MAX(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase_max,
       CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view_sum,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error_count
FROM events
GROUP BY user_id
"""

register(
    QuerySpec(
        "eav_pivot_events",
        eav_pivot_events,
        EAV_PIVOT_SQL,
        doc="EAV → wide conditional-aggregation pivot",
        cites="SURVEY §2.4 A1 (stg_opralogweb__mcr_equipment_downtime.sql:50-95)",
        tags=("agg", "pivot"),
    )
)


def pivot_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Spark pivot with fixed value set (avoids extra pass for values)."""
    o = load_table(spark, sf_dir, "orders")
    pri = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    df = o.groupBy("o_orderstatus").pivot("o_orderpriority", pri).count()
    renames = {
        "1-URGENT": "n_urgent",
        "2-HIGH": "n_high",
        "3-MEDIUM": "n_medium",
        "4-NOT SPECIFIED": "n_notspec",
        "5-LOW": "n_low",
    }
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    # pivot-count yields NULL for absent cells; Trino-style conditional count yields 0
    return df.select(
        "o_orderstatus",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in renames.values()],
    )


PIVOT_PRIORITY_SQL = """
SELECT o_orderstatus,
       COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
       COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS n_high,
       COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS n_medium,
       COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS n_notspec,
       COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_low
FROM orders
GROUP BY o_orderstatus
"""

register(
    QuerySpec(
        "pivot_order_priority",
        pivot_order_priority,
        PIVOT_PRIORITY_SQL,
        doc="pivot with fixed value list → wide counts",
        cites="SURVEY §2.4 A1 pivot",
        tags=("pivot",),
    )
)


# --- W1: lag window + timestamp diff --------------------------------------


def window_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minutes since the previous event per user (lag + timestamp diff).

    Diff computed on integer microseconds (floor of µs/60e6) so Spark and
    the oracle use identical integer math (Trino date_diff counts full
    elapsed units; DuckDB date_diff counts boundary crossings — bypassed).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts", 1).over(w)
    mins = F.floor((F.unix_micros(F.col("ts")) - F.unix_micros(prev)) / F.lit(60000000))
    return (
        e.select("event_id", "user_id", mins.alias("mins_since_prev"))
        .where(F.col("mins_since_prev").isNotNull())
    )


WINDOW_LAG_SQL = """
WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
SELECT event_id, user_id,
       CAST(FLOOR((epoch_us(ts) - epoch_us(LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts)))
            / 60000000.0) AS BIGINT) AS mins_since_prev
FROM e
QUALIFY mins_since_prev IS NOT NULL
"""

register(
    QuerySpec(
        "window_lag_events",
        window_lag_events,
        WINDOW_LAG_SQL,
        doc="lag window + elapsed-minutes computation",
        cites="SURVEY §2.5 W1 (mcr_equipment_downtime_records.sql:96-99); §2.8 F12",
        bench=True,
        tags=("window", "datetime"),
    )
)


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1-per-group via row_number (O3: sort desc + first row)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 2).alias("value"))
    )


LATEST_EVENT_SQL = """
WITH e AS (SELECT *, CAST(ts AS TIMESTAMP) AS ts_us FROM events)
SELECT user_id, event_id, event_type, ROUND(value, 2) AS value
FROM (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rn
  FROM e
) WHERE rn = 1
"""

register(
    QuerySpec(
        "latest_event_per_user",
        latest_event_per_user,
        LATEST_EVENT_SQL,
        doc="latest row per key (row_number top-1)",
        cites="SURVEY §2.6 O3 (pyiceberg.py:231-241 latest-state lookup)",
        tags=("window", "topk"),
    )
)


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) as batch windows.

    The batch analogue of streaming session windows: flag gap>30min, then a
    running sum per user assigns session ids. Two window passes over the
    same (user_id, ts) ordering — one shuffle, reused by both.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts", 1).over(w)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev)
    is_new = F.when(prev.isNull() | (gap_us > 30 * 60 * 1000000), 1).otherwise(0)
    sess = F.sum(F.col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("is_new", is_new)
        .withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            sum_money("value").alias("session_value"),
        )
    )


SESSIONIZE_SQL = """
WITH e AS (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
flagged AS (
  SELECT *,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30*60*1000000
         THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sessions
GROUP BY user_id, session_id
"""

register(
    QuerySpec(
        "sessionize_events",
        sessionize_events,
        SESSIONIZE_SQL,
        doc="gap-based sessionization (batch analogue of session windows)",
        cites="SURVEY §2.10 (batch incremental model); Spark session-window family",
        bench=True,
        tags=("window", "streaming"),
    )
)


# --- J4: point-in-interval (range) join -----------------------------------

_TIERS = [
    ("subzero", -100000.0, 0.0),
    ("low", 0.0, 2500.0),
    ("mid", 2500.0, 7000.0),
    ("high", 7000.0, 100000.0),
]


def interval_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval enrichment: customers bucketed into balance tiers.

    The tier dim is tiny → explicit broadcast makes Catalyst pick
    BroadcastNestedLoopJoin (the only sane physical plan for a non-equi
    join; the same shape the reference's cycle-interval join J4 needs).
    """
    c = load_table(spark, sf_dir, "customer")
    tiers = spark.createDataFrame(_TIERS, ["tier", "lo", "hi"])
    joined = c.join(
        F.broadcast(tiers), (c.c_acctbal >= tiers.lo) & (c.c_acctbal < tiers.hi), "left"
    )
    return joined.groupBy("tier").agg(
        F.count("*").alias("n_customers"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
    )


INTERVAL_JOIN_SQL = """
WITH tiers(tier, lo, hi) AS (
  VALUES ('subzero', -100000.0, 0.0), ('low', 0.0, 2500.0),
         ('mid', 2500.0, 7000.0), ('high', 7000.0, 100000.0)
)
SELECT tier, COUNT(*) AS n_customers, ROUND(AVG(c_acctbal), 2) AS avg_bal
FROM customer LEFT JOIN tiers ON c_acctbal >= lo AND c_acctbal < hi
GROUP BY tier
"""

register(
    QuerySpec(
        "interval_join_tiers",
        interval_join_tiers,
        INTERVAL_JOIN_SQL,
        doc="non-equi point-in-interval join (broadcast nested loop)",
        cites="SURVEY §2.3 J4 (mcr_equipment_downtime_records.sql:52-53)",
        tags=("join", "range"),
    )
)


# --- J5: scalar subquery filter -------------------------------------------


def orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_j5")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               ROUND(AVG(o_totalprice), 2) AS avg_price
        FROM _orders_j5
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM _orders_j5)
        GROUP BY o_orderpriority
        """
    )


ORDERS_ABOVE_AVG_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders, ROUND(AVG(o_totalprice), 2) AS avg_price
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
GROUP BY o_orderpriority
"""

register(
    QuerySpec(
        "orders_above_avg",
        orders_above_avg,
        ORDERS_ABOVE_AVG_SQL,
        doc="scalar-subquery theta filter",
        cites="SURVEY §2.3 J5 (mcr_equipment_downtime_records.sql:54)",
        tags=("subquery",),
    )
)


# --- U1: deduplicating UNION ----------------------------------------------


def union_dedup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino UNION semantics (dedup) = unionByName + dropDuplicates."""
    c = load_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_acctbal") > 0).select("c_nationkey", "c_mktsegment")
    b = c.where(F.col("c_acctbal") < 5000).select("c_nationkey", "c_mktsegment")
    return a.unionByName(b).dropDuplicates()


UNION_DEDUP_SQL = """
SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 0
UNION
SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal < 5000
"""

register(
    QuerySpec(
        "union_dedup_customers",
        union_dedup_customers,
        UNION_DEDUP_SQL,
        doc="deduplicating UNION (Trino UNION = union + distinct)",
        cites="SURVEY §2.7 U1 (mcr_equipment_downtime_records.sql:57-62)",
        tags=("setop",),
    )
)


# --- P7/P3: anti & semi joins ---------------------------------------------


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders since 2000 (anti-join against filtered set)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
"""

register(
    QuerySpec(
        "customers_without_orders",
        customers_without_orders,
        ANTI_JOIN_SQL,
        doc="anti-join (skip-list / already-loaded filtering)",
        cites="SURVEY §2.2 P7, §2.3 J6 (moderator_performance.py:203-211)",
        tags=("join",),
    )
)


def active_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_active_customers"))
    )


SEMI_JOIN_SQL = """
SELECT c_nationkey, COUNT(*) AS n_active_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""

register(
    QuerySpec(
        "active_customers_per_nation",
        active_customers_per_nation,
        SEMI_JOIN_SQL,
        doc="semi-join (id-list IN filtering, distributed)",
        cites="SURVEY §2.2 P3, §2.9 X3 (elt-pipelines opralogweb IN-batch filter)",
        tags=("join",),
    )
)


# --- A2/A3/A4: dedup family -----------------------------------------------


def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


register(
    QuerySpec(
        "distinct_segments",
        distinct_segments,
        "SELECT DISTINCT c_mktsegment FROM customer",
        doc="SELECT DISTINCT",
        cites="SURVEY §2.4 A4 (mcr_equipment_downtime_uncategorized_equipment.sql:8-17)",
        tags=("dedup",),
    )
)


def rep_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic representative row per group (reference uses any_value;
    min() pins determinism for the oracle comparison)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.min("c_name").alias("rep_name"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


register(
    QuerySpec(
        "rep_customer_per_nation",
        rep_customer_per_nation,
        """
        SELECT c_nationkey, MIN(c_name) AS rep_name,
               ROUND(MIN(c_acctbal), 2) AS min_bal, ROUND(MAX(c_acctbal), 2) AS max_bal
        FROM customer GROUP BY c_nationkey
        """,
        doc="representative-per-group (any_value dedup, deterministic)",
        cites="SURVEY §2.4 A3 (stg_accelerator_sharepoint__edr_equipment_mapping.sql:7-18)",
        tags=("dedup", "agg"),
    )
)


def nation_customer_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list per group, sorted and joined → order-independent string."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") % 50 == 0)
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("c_name"))).alias("roster")
    )


register(
    QuerySpec(
        "nation_customer_roster",
        nation_customer_roster,
        """
        SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS roster
        FROM customer WHERE c_custkey % 50 = 0 GROUP BY c_nationkey
        """,
        doc="collect_list per group (sorted string form)",
        cites="SURVEY §2.4 A6 (moderator_performance.py:78-91 runs-per-cycle)",
        tags=("agg",),
    )
)


# --- J2: computed-key join -------------------------------------------------

_REGION_LABELS = [
    ("  africa ", "continent-africa"),
    ("AMERICA", "continent-america"),
    ("aSiA  ", "continent-asia"),
    ("  EuRoPe", "continent-europe"),
    ("middle    east", "continent-middle-east"),
]


def computed_key_region_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join on lower(normalize_whitespace(x)) both sides (J2 macro join)."""
    r = load_table(spark, sf_dir, "region")
    labels = spark.createDataFrame(_REGION_LABELS, ["raw_name", "label"])
    return (
        r.join(
            F.broadcast(labels),
            equipment_category_key(r.r_name) == equipment_category_key(labels.raw_name),
            "left",
        )
        .select("r_regionkey", "r_name", "label")
    )


COMPUTED_KEY_SQL = """
WITH labels(raw_name, label) AS (
  VALUES ('  africa ', 'continent-africa'), ('AMERICA', 'continent-america'),
         ('aSiA  ', 'continent-asia'), ('  EuRoPe', 'continent-europe'),
         ('middle    east', 'continent-middle-east')
)
SELECT r_regionkey, r_name, label
FROM region LEFT JOIN labels
  ON lower(regexp_replace(trim(r_name), '\\s+', ' ', 'g'))
   = lower(regexp_replace(trim(raw_name), '\\s+', ' ', 'g'))
"""

register(
    QuerySpec(
        "computed_key_region_join",
        computed_key_region_join,
        COMPUTED_KEY_SQL,
        doc="left join on normalized computed key",
        cites="SURVEY §2.3 J2 (mcr_equipment_downtime_records.sql:125 + macros)",
        tags=("join", "string"),
    )
)


# --- F4-F8: string function suite -----------------------------------------


def part_string_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.where(F.col("p_type").like("%M%"))
        .select(
            "p_partkey",
            F.substring("p_name", 1, 10).alias("name10"),
            substring_from_end(F.col("p_brand"), 4).alias("brand_tail"),
            F.concat(F.lit("P-"), F.col("p_partkey").cast("string")).alias("tagged"),
            F.when(F.col("p_size") < 10, "small")
            .when(F.col("p_size") < 30, "medium")
            .otherwise("large")
            .alias("size_class"),
            F.regexp_replace(F.col("p_type"), "[aeiou]", "_").alias("devoweled"),
        )
    )


PART_STRING_SQL = """
SELECT p_partkey,
       substring(p_name, 1, 10) AS name10,
       substring(p_brand, length(p_brand) - 3, 4) AS brand_tail,
       'P-' || CAST(p_partkey AS VARCHAR) AS tagged,
       CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 30 THEN 'medium'
            ELSE 'large' END AS size_class,
       regexp_replace(p_type, '[aeiou]', '_', 'g') AS devoweled
FROM part
WHERE p_type LIKE '%M%'
"""

register(
    QuerySpec(
        "part_string_features",
        part_string_features,
        PART_STRING_SQL,
        doc="string-function suite: substring/neg-index/concat/case/like/regexp",
        cites="SURVEY §2.8 F4-F8 (stg_accelerator_sharepoint__*.sql:15-35)",
        tags=("string",),
    )
)


# --- F10/F11: timezone conversion -----------------------------------------


def events_tokyo_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTC instants → Asia/Tokyo civil time, formatted (tz-dialect parity)."""
    e = load_table(spark, sf_dir, "events")
    local = F.from_utc_timestamp(F.col("ts"), "Asia/Tokyo")
    return e.select(
        "event_id",
        F.date_format(local, "yyyy-MM-dd HH:mm:ss").alias("tokyo_time"),
        F.date_format(local, "yyyy-MM-dd").alias("tokyo_date"),
        F.hour(local).alias("tokyo_hour"),
    )


EVENTS_TOKYO_SQL = """
SELECT event_id,
       strftime(CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo',
                '%Y-%m-%d %H:%M:%S') AS tokyo_time,
       strftime(CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo',
                '%Y-%m-%d') AS tokyo_date,
       hour(CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo') AS tokyo_hour
FROM events
"""

register(
    QuerySpec(
        "events_tokyo_local",
        events_tokyo_local,
        EVENTS_TOKYO_SQL,
        doc="UTC → zone-local conversion + formatting",
        cites="SURVEY §2.8 F10/F11/F16 (parse_utc_timestamp macro; electricity tz ops)",
        tags=("datetime",),
    )
)


# --- JSON extraction (REST/JSON source family) ----------------------------


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.select("event_id", k.alias("k_val"))
        .groupBy((F.col("k_val") % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"), F.sum("k_val").alias("k_sum"))
    )


EVENTS_JSON_SQL = """
SELECT CAST(props->>'$.k' AS INTEGER) % 10 AS k_mod,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS k_sum
FROM events
GROUP BY 1
"""

register(
    QuerySpec(
        "events_json_props",
        events_json_props,
        EVENTS_JSON_SQL,
        doc="JSON field extraction from string column + agg",
        cites="SURVEY §2.1 S6 (statusdisplay REST/JSON ingest, nested flattening)",
        tags=("json",),
    )
)


# --- S6 as a registered format: Python DataSource REST scan ---------------


def rest_source_customer_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read customers through the registered ``parquet_rest`` Python
    DataSource: page-range input partitions fan the fetch across
    executors, and the segment predicate reaches the server via
    ``pushFilters`` → query param (the engine-native form of the
    reference's hand-built watermark query, SURVEY P2)."""
    import json as _json
    import math as _math

    import pyarrow.parquet as pq

    from analytics_data_platform_spark.session import ensure_session_defaults
    from analytics_data_platform_spark.sources.rest_datasource import ParquetRestSource

    ensure_session_defaults(spark)  # python filter pushdown on plain sessions
    spark.dataSource.register(ParquetRestSource)
    path = f"{sf_dir}/customer.parquet"
    n = pq.ParquetFile(path).metadata.num_rows  # footer read only
    page_size = 500
    df = (
        spark.read.format("parquet_rest")
        .schema("c_custkey BIGINT, c_name STRING, c_mktsegment STRING, c_acctbal DOUBLE")
        .option("url", "local://customer")
        .option("params", _json.dumps({"path": path}))
        .option("pages", str(_math.ceil(n / page_size)))
        .option("page_size", str(page_size))
        .option("num_partitions", "8")
        .option("pushdown_params", '{"c_mktsegment": {"eq": "segment"}}')
        .load()
    )
    return df.where(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
    )


REST_SOURCE_SQL = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_mktsegment = 'BUILDING'
"""

register(
    QuerySpec(
        "rest_source_customer_scan",
        rest_source_customer_scan,
        REST_SOURCE_SQL,
        doc="paginated REST endpoint as a first-class Spark format with pushdown",
        cites="SURVEY §2.1 S6 (statusdisplay.py:23-56) + §2.2 P2 via pushFilters",
        tags=("json", "elt", "filter"),
    )
)


# --- A5: watermark discovery (max per source) -----------------------------


def watermark_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar max aggregates — the incremental-ingest watermark probe."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    ew = e.agg(
        F.lit("events").alias("source_table"),
        F.max("event_id").alias("max_key"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
    )
    ow = o.agg(
        F.lit("orders").alias("source_table"),
        F.max("o_orderkey").alias("max_key"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
    )
    return ew.unionByName(ow)


WATERMARK_SQL = """
SELECT 'events' AS source_table, MAX(event_id) AS max_key,
       strftime(MAX(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS max_ts
FROM events
UNION ALL
SELECT 'orders', MAX(o_orderkey),
       strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
FROM orders
"""

register(
    QuerySpec(
        "watermark_maxima",
            watermark_maxima,
        WATERMARK_SQL,
        doc="watermark probe: max(cursor) per source table",
        cites="SURVEY §2.4 A5 (runner.py:125-133; electricity_sharepoint.py:262-270)",
        tags=("agg", "elt"),
    )
)


def variant_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion on the Spark 4 VARIANT type: props parses
    once into a binary variant column (``parse_json``), typed fields come
    out with ``variant_get`` path extraction. Unlike per-path
    ``get_json_object`` over strings (events_json_props), the parse cost
    is paid once per row regardless of how many paths are read — the
    right shape for wide semi-structured payloads at 100 TB. Aggregates
    per event_type over the extracted field."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return (
        e.select("event_type", k.alias("k_val"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k_val").alias("n_with_k"),
            F.sum("k_val").alias("k_sum"),
            F.round(F.avg("k_val"), 4).alias("k_avg"),
        )
    )


VARIANT_SQL = """
SELECT event_type, COUNT(*) AS n,
       COUNT(CAST(props->>'$.k' AS INTEGER)) AS n_with_k,
       CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS k_sum,
       ROUND(AVG(CAST(props->>'$.k' AS INTEGER)), 4) AS k_avg
FROM events
GROUP BY event_type
"""

register(
    QuerySpec(
        "variant_event_stats",
        variant_event_stats,
        VARIANT_SQL,
        doc="VARIANT-typed semi-structured extraction (parse once, read many)",
        cites="SURVEY §2.1 S6 (REST/JSON ingest) — Spark 4 VARIANT upgrade",
        tags=("json", "variant"),
    )
)


def null_semantics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling fidelity in one query: synthetic NULLs are injected
    into customer balances (every 7th key), then the result exercises the
    semantics that differ across engines if anything is off — null-safe
    equality (<=> / IS NOT DISTINCT FROM) vs plain equality in a join
    condition, aggregate null-skipping (COUNT vs COUNT(col), SUM/AVG over
    all-null groups), and COALESCE fallbacks. A platform migration is
    exactly where these diverge silently; this row set pins them.
    """
    c = load_table(spark, sf_dir, "customer")
    nulled = c.select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 != 0, F.col("c_acctbal")).alias("bal"),
    )
    a = nulled.select(
        F.col("c_custkey").alias("ak"),
        F.col("c_mktsegment").alias("aseg"),
        F.col("bal").alias("abal"),
    )
    b = nulled.select(
        F.col("c_custkey").alias("bk"),
        F.col("bal").alias("bbal"),
    )
    # null-safe self-join on the NULLABLE column within the same key:
    # <=> matches NULL with NULL, = never does
    joined = a.join(
        b,
        (F.col("ak") == F.col("bk")) & F.col("abal").eqNullSafe(F.col("bbal")),
        "left",
    )
    return joined.groupBy("aseg").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("abal").alias("n_nonnull_bal"),
        F.count(F.when(F.col("bk").isNotNull() & F.col("abal").isNull(), 1)).alias(
            "n_nullsafe_matches_on_null"
        ),
        F.round(F.coalesce(F.sum("abal"), F.lit(0.0)), 2).alias("sum_bal"),
        F.round(
            F.avg(F.when(F.col("ak") % 7 == 0, F.col("abal"))), 2
        ).alias("avg_of_all_null_slice"),
    )


NULL_AUDIT_SQL = """
WITH nulled AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 7 <> 0 THEN c_acctbal END AS bal
  FROM customer
),
j AS (
  SELECT a.c_mktsegment AS aseg, a.c_custkey AS ak, a.bal AS abal, b.bk
  FROM nulled a LEFT JOIN (
    SELECT c_custkey AS bk, bal AS bbal FROM nulled
  ) b ON a.c_custkey = b.bk AND a.bal IS NOT DISTINCT FROM b.bbal
)
SELECT aseg, COUNT(*) AS n_rows,
       COUNT(abal) AS n_nonnull_bal,
       COUNT(CASE WHEN bk IS NOT NULL AND abal IS NULL THEN 1 END)
         AS n_nullsafe_matches_on_null,
       ROUND(COALESCE(SUM(abal), 0.0), 2) AS sum_bal,
       ROUND(AVG(CASE WHEN ak % 7 = 0 THEN abal END), 2) AS avg_of_all_null_slice
FROM j GROUP BY aseg
"""

register(
    QuerySpec(
        "null_semantics_audit",
        null_semantics_audit,
        NULL_AUDIT_SQL,
        doc="null-safe equality joins + aggregate null-skipping fidelity audit",
        cites="SQL-semantics parity family (dialect traps, functions/dialect.py)",
        tags=("relational", "semantics"),
    )
)


# --------------------------------------------------------------------------
# native unpivot / melt (wide → long)
# --------------------------------------------------------------------------


def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag lineitem measure totals melted to long form via the
    NATIVE ``DataFrame.unpivot`` (Spark 3.4+ melt) — the inverse of the
    conditional-agg pivot family (A1).

    Scale shape: aggregate FIRST (3 flags × 4 measures = 12 rows), melt
    the tiny aggregate — never unpivot the fact table itself, which
    would 4× its row count before the shuffle. Currency sums go through
    the exact DECIMAL(18,2) path (queries/exact.py); quantity sums are
    integer-valued doubles (exact in binary, order-free). The oracle
    mirrors the melt with a UNION ALL (DuckDB's UNPIVOT normalizes
    column-name case, so the explicit form is the portable one).
    """
    from analytics_data_platform_spark.queries.exact import money, sum_money

    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("quantity"),
        sum_money("l_extendedprice").alias("extendedprice"),
        F.sum(money("l_discount")).cast("double").alias("discount"),
        F.sum(money("l_tax")).cast("double").alias("tax"),
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["quantity", "extendedprice", "discount", "tax"],
        "measure",
        "total",
    )


UNPIVOT_SQL = """
WITH agg AS (
  SELECT l_returnflag,
         SUM(l_quantity) AS quantity,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS extendedprice,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS discount,
         CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS tax
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, measure, total FROM (
  SELECT l_returnflag, 'quantity' AS measure, quantity AS total FROM agg
  UNION ALL SELECT l_returnflag, 'extendedprice', extendedprice FROM agg
  UNION ALL SELECT l_returnflag, 'discount', discount FROM agg
  UNION ALL SELECT l_returnflag, 'tax', tax FROM agg
)
"""

register(
    QuerySpec(
        "unpivot_lineitem_measures",
        unpivot_lineitem_measures,
        UNPIVOT_SQL,
        doc="native DataFrame.unpivot over the per-flag measure aggregate",
        cites="relational surface: melt/long-form inverse of the A1 pivot family",
        tags=("relational",),
    )
)
