"""Event-analytics query family: funnel conversion, cohort retention,
gaps-and-islands run compression, CDC snapshot diff, GROUPING SETS.

These are the day-2 questions every warehouse user asks of an events
table (the reference's interactive layer serves exactly this audience —
SURVEY §3.3); each is expressed as a single declarative Spark plan whose
shuffles are keyed on high-cardinality columns (user_id / o_orderkey),
so the shapes hold at 100 TB. All five are DuckDB-oracle-backed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.functions.expr import spread
from analytics_data_platform_spark.operators.ordered import (
    multi_global_ranks,
    with_global_order,
)
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.queries.exact import sum_money
from analytics_data_platform_spark.sources.testdata import load_table


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: a user counts for a stage
    only if the stage event happens at-or-after their entry into the
    previous stage. Each stage is one groupBy(user) min-aggregation plus
    an equi-join on user_id — every shuffle is keyed on the
    high-cardinality user id, so the funnel scales linearly."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    viewed = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    clicked = (
        e.where(F.col("event_type") == "click")
        .join(viewed, "user_id")
        .where(F.col("ts") >= F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    purchased = (
        e.where(F.col("event_type") == "purchase")
        .join(clicked, "user_id")
        .where(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        viewed.agg(F.count("*").alias("users_viewed"))
        .crossJoin(clicked.agg(F.count("*").alias("users_clicked")))
        .crossJoin(purchased.agg(F.count("*").alias("users_purchased")))
    )


FUNNEL_SQL = """
WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
viewed AS (
  SELECT user_id, MIN(ts) AS view_ts FROM e WHERE event_type = 'view' GROUP BY user_id
),
clicked AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM e JOIN viewed v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.view_ts
  GROUP BY e.user_id
),
purchased AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM e JOIN clicked c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM viewed) AS users_viewed,
       (SELECT COUNT(*) FROM clicked) AS users_clicked,
       (SELECT COUNT(*) FROM purchased) AS users_purchased
"""

register(
    QuerySpec(
        "funnel_conversion",
        funnel_conversion,
        FUNNEL_SQL,
        doc="ordered multi-stage funnel (view -> click -> purchase)",
        cites="interactive-analytics surface (SURVEY §3.3 audience)",
        tags=("analytics", "join"),
    )
)


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by the epoch-week
    of their first event; distinct actives per (cohort_week, week_offset).

    The cohort timestamp comes from an unbounded window min over
    user_id — ONE shuffle for both the cohort assignment and the
    activity rows (a groupBy+join formulation would shuffle twice).
    Epoch-week integer math keeps bucket boundaries engine-identical."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    week = lambda c: F.floor(F.unix_timestamp(c) / 604800)  # noqa: E731
    w = Window.partitionBy("user_id")
    cohorted = e.select(
        "user_id",
        week(F.min("ts").over(w)).alias("cohort_week"),
        week(F.col("ts")).alias("active_week"),
    )
    return (
        cohorted.groupBy(
            "cohort_week", (F.col("active_week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


COHORT_SQL = """
WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
cohorted AS (
  SELECT user_id,
         CAST(FLOOR(epoch(MIN(ts) OVER (PARTITION BY user_id)) / 604800) AS BIGINT)
           AS cohort_week,
         CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS active_week
  FROM e
)
SELECT cohort_week, active_week - cohort_week AS week_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM cohorted
GROUP BY 1, 2
"""

register(
    QuerySpec(
        "cohort_retention",
        cohort_retention,
        COHORT_SQL,
        doc="weekly cohort retention triangle (single-shuffle cohorting)",
        cites="interactive-analytics surface (SURVEY §3.3 audience)",
        tags=("analytics", "window"),
    )
)


def event_runs_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse each user's consecutive same-type events
    into runs (run start, length, value sum). lag() flags type changes,
    a running sum over the SAME window ordering numbers the runs — both
    windows share one partitioning so Spark plans a single sort+shuffle;
    the final groupBy is on (user_id, run_id), again user-keyed."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id", "value")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = F.when(
        F.lag("event_type").over(order).isNull()
        | (F.lag("event_type").over(order) != F.col("event_type")),
        1,
    ).otherwise(0)
    runs = e.withColumn("run_id", F.sum(changed).over(order))
    # Sum in DECIMAL(18,2): events.value is 2-dp currency, so the decimal sum
    # is exact and summation-order independent — a plain double sum rounds
    # differently depending on partial-agg order (driver-observed flake, r02).
    return runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("run_start"),
        F.count("*").alias("run_len"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("run_value"),
    )


RLE_SQL = """
WITH e AS (SELECT user_id, event_type, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
flagged AS (
  SELECT *,
    CASE WHEN LAG(event_type) OVER w IS NULL
           OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS changed
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT *, CAST(SUM(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
  FROM flagged
)
SELECT user_id, run_id, MIN(event_type) AS event_type, MIN(ts) AS run_start,
       COUNT(*) AS run_len, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS run_value
FROM runs
GROUP BY user_id, run_id
"""

register(
    QuerySpec(
        "event_runs_rle",
        event_runs_rle,
        RLE_SQL,
        doc="gaps-and-islands run-length compression of event streams",
        cites="SURVEY §2.5 window family; sessionize sibling",
        tags=("analytics", "window"),
    )
)


def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture by snapshot diff: full-outer join two table
    snapshots on the primary key and classify each row as
    insert / delete / update (unchanged rows drop out). This is the
    batch CDC primitive the reference's incremental loads rationalize
    over (watermark append can't see deletes — snapshot diff can).
    One key-partitioned full-outer shuffle join; 100 TB-safe.

    Snapshots are simulated deterministically from `orders`: the old
    snapshot is keys not divisible by 10, the new snapshot keys not
    divisible by 7 with every third key's price bumped.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    old = o.where(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("old_price")
    )
    new = o.where(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 5.0)
        .otherwise(F.col("o_totalprice"))
        .alias("new_price"),
    )
    joined = old.join(new, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("old_price").isNull(), "insert")
        .when(F.col("new_price").isNull(), "delete")
        .when(F.col("old_price") != F.col("new_price"), "update")
    )
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select("o_orderkey", "change_type", "old_price", "new_price")
    )


CDC_SQL = """
WITH old AS (
  SELECT o_orderkey, o_totalprice AS old_price FROM orders WHERE o_orderkey % 10 <> 0
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 5.0 ELSE o_totalprice END AS new_price
  FROM orders WHERE o_orderkey % 7 <> 0
),
diff AS (
  SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey, old_price, new_price,
         CASE WHEN old_price IS NULL THEN 'insert'
              WHEN new_price IS NULL THEN 'delete'
              WHEN old_price <> new_price THEN 'update' END AS change_type
  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
)
SELECT o_orderkey, change_type, old_price, new_price
FROM diff WHERE change_type IS NOT NULL
"""

register(
    QuerySpec(
        "cdc_snapshot_diff",
        cdc_snapshot_diff,
        CDC_SQL,
        doc="CDC snapshot diff: insert/update/delete classification",
        cites="reference incremental loads (SURVEY §2.10) can't see deletes; CDC completes the story",
        tags=("cdc", "join"),
    )
)


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status, priority), (status), ()) with a
    grouping_id disambiguator — the sets the ROLLUP/CUBE queries can't
    express individually. Spark expands the sets inside one Aggregate
    (Expand + partial agg), so the input is scanned once."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            sum_money("o_totalprice").alias("revenue"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "revenue")
    )


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
       COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""

register(
    QuerySpec(
        "grouping_sets_revenue",
        grouping_sets_revenue,
        GROUPING_SETS_SQL,
        doc="explicit GROUPING SETS with grouping_id disambiguation",
        cites="SURVEY §2.4 note: grouping sets free in Spark",
        tags=("agg", "rollup"),
    )
)


def interval_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-side range join via the binned equi-join rewrite
    (operators/rangejoin.py): events matched into overlapping value bands
    WITHOUT a BroadcastNestedLoopJoin — the plan is a plain hash join on
    the bin id, so it survives an interval side too big to broadcast
    (plan-guarded in tests/test_plans.py). Bands deliberately overlap
    (width 40, stride 25) so the rewrite's multi-bin explode is exercised."""
    from analytics_data_platform_spark.operators.rangejoin import bin_interval_join

    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    bands = spark.range(14).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 25.0).alias("lo"),
        (F.col("id") * 25.0 + 40.0).alias("hi"),
    )
    joined = bin_interval_join(e, bands, "value", "lo", "hi", bin_width=25.0)
    return joined.groupBy("band_id", "lo", "hi").agg(
        F.count("*").alias("n_events"),
        sum_money("value").alias("value_sum"),
    )


INTERVAL_BANDS_SQL = """
WITH bands AS (
  SELECT i AS band_id, i * 25.0 AS lo, i * 25.0 + 40.0 AS hi
  FROM (SELECT unnest(range(0, 14)) AS i)
)
SELECT band_id, lo, hi, COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band_id, lo, hi
"""

register(
    QuerySpec(
        "interval_join_value_bands",
        interval_join_value_bands,
        INTERVAL_BANDS_SQL,
        doc="binned-rewrite range join (equi-join plan, no nested loop)",
        cites="SURVEY §2.3 J4 scale path; operators/rangejoin.py",
        tags=("join", "range"),
    )
)


def zscore_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature normalization: z-score of `value` within each
    event_type via an unbounded window (one shuffle on the group key;
    the same aggregate-then-broadcast shape Catalyst plans for window
    functions without frames)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    return e.select(
        "event_id",
        "event_type",
        F.round(
            (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w), 4
        ).alias("value_z"),
    )


ZSCORE_SQL = """
SELECT event_id, event_type,
       ROUND((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w, 4) AS value_z
FROM events
WINDOW w AS (PARTITION BY event_type)
"""

register(
    QuerySpec(
        "zscore_events_by_type",
        zscore_events_by_type,
        ZSCORE_SQL,
        doc="per-group z-score normalization (unbounded window aggregates)",
        cites="feature-engineering surface; SURVEY §2.5 window family",
        tags=("analytics", "window"),
    )
)


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next=to | cur=from) with counts. One shuffle on user_id for the
    lead() window (high-cardinality key — scales), then a tiny
    (|types|²-row) aggregate; the per-from normalization runs as a window
    over that aggregate, which is broadcast-sized at any corpus scale."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wf), 4).alias("p"),
    )


TRANSITION_SQL = """
WITH seq AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type), 4) AS p
FROM counts
"""

register(
    QuerySpec(
        "event_transition_matrix",
        event_transition_matrix,
        TRANSITION_SQL,
        doc="first-order Markov event-transition matrix (lead window + normalized counts)",
        cites="event-sequence analytics; SURVEY §2.5 window family",
        tags=("analytics", "window"),
    )
)


def value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event_type via median absolute deviation:
    flag |value - median| > 3 × MAD. Two exact-percentile aggregates over
    the same groupBy key (one shuffle each; the deviation pass re-reads
    the scan rather than caching — at 100 TB a double scan beats spilling
    a cached corpus) and a broadcast join of the tiny per-type stats."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = (
        e.join(F.broadcast(med), "event_type")
        .select("event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("dev"))
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"), F.percentile("dev", F.lit(0.5)).alias("mad")
    )
    out = (
        dev.drop("med")
        .join(F.broadcast(mad), "event_type")
        .where(F.col("dev") > 3 * F.col("mad"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_outliers"))
    )
    return (
        mad.join(out, "event_type", "left")
        .select(
            "event_type",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
        )
    )


MAD_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, ABS(e.value - m.med) AS dev, m.med
  FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (
  SELECT event_type, ANY_VALUE(med) AS med, quantile_cont(dev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT m.event_type, ROUND(m.med, 4) AS med, ROUND(m.mad, 4) AS mad,
       CAST(COALESCE(SUM(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_outliers
FROM mad m LEFT JOIN dev d ON d.event_type = m.event_type
GROUP BY m.event_type, m.med, m.mad
"""

register(
    QuerySpec(
        "value_mad_outliers",
        value_mad_outliers,
        MAD_SQL,
        doc="median-absolute-deviation robust outlier detection per event type",
        cites="statistical quality monitoring; SURVEY §2.4 aggregate family",
        tags=("analytics", "statistics"),
    )
)


def ks_two_sample_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between order-value
    distributions of URGENT vs LOW priority orders — the distribution-
    drift monitor a data pipeline runs between corpus snapshots.

    Exact ECDFs via one groupBy on distinct values + a distributed
    two-pass cumulative count (operators/ordered.py — distinct prices
    grow with data, so a global window would single-reduce at 100 TB),
    then D = max |F1 - F2|. Integer math until the final division; no
    collect, no sampling; deterministic because cumulative counts are
    integers and the division happens once per distinct value."""
    pri_a, pri_b = "1-URGENT", "5-LOW"
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin(pri_a, pri_b)
    )
    per_val = (
        o.select(
            "o_totalprice",
            (F.col("o_orderpriority") == pri_a).cast("long").alias("a"),
            (F.col("o_orderpriority") == pri_b).cast("long").alias("b"),
        )
        .groupBy("o_totalprice")
        .agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
    )
    tot = per_val.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    cum = with_global_order(
        per_val, "o_totalprice",
        prefix_sums={"cum_a": "ca", "cum_b": "cb"},
    ).crossJoin(F.broadcast(tot))
    return cum.agg(
        F.round(
            F.max(
                F.abs(
                    F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b")
                )
            ),
            6,
        ).alias("ks_stat"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    )


KS_SQL = """
WITH per_val AS (
  SELECT o_totalprice,
         SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS cb
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
  GROUP BY o_totalprice
),
cum AS (
  SELECT SUM(ca) OVER (ORDER BY o_totalprice ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(cb) OVER (ORDER BY o_totalprice ROWS UNBOUNDED PRECEDING) AS cum_b,
         SUM(ca) OVER () AS n_a,
         SUM(cb) OVER () AS n_b
  FROM per_val
)
SELECT ROUND(MAX(ABS(CAST(cum_a AS DOUBLE) / n_a - CAST(cum_b AS DOUBLE) / n_b)), 6) AS ks_stat,
       CAST(MAX(n_a) AS BIGINT) AS n_a,
       CAST(MAX(n_b) AS BIGINT) AS n_b
FROM cum
"""

register(
    QuerySpec(
        "ks_two_sample_drift",
        ks_two_sample_drift,
        KS_SQL,
        doc="exact two-sample KS statistic (distribution drift monitor)",
        cites="training-data ops: snapshot drift detection",
        tags=("analytics", "stats"),
    )
)


def chi_square_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test between event_type and
    hour-of-day — "does traffic mix shift by hour?", the categorical
    counterpart of the KS drift monitor.

    The contingency table is one groupBy over (type, hour); marginals are
    window sums over that tiny table; absent cells are restored by a
    distinct-types × distinct-hours cross join so zero-observation cells
    still contribute their expectation. All counts stay integers until
    the final (rounded) statistic, and every shuffle after the first
    aggregation moves at most |types|·24 rows."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hr")
    )
    cells = e.groupBy("event_type", "hr").agg(F.count("*").alias("n"))
    full = (
        cells.select("event_type").distinct()
        .crossJoin(cells.select("hr").distinct())
        .join(cells, ["event_type", "hr"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
    )
    wt = Window.partitionBy("event_type")
    wh = Window.partitionBy("hr")
    wn = Window.partitionBy()
    t = full.select(
        "n",
        F.sum("n").over(wt).alias("row_tot"),
        F.sum("n").over(wh).alias("col_tot"),
        F.sum("n").over(wn).alias("grand"),
    ).withColumn("exp", F.col("row_tot") * F.col("col_tot") / F.col("grand"))
    return t.agg(
        F.round(F.sum(F.pow(F.col("n") - F.col("exp"), 2) / F.col("exp")), 6).alias(
            "chi2"
        ),
        F.max("grand").alias("n_events"),
    )


CHI2_SQL = """
WITH e AS (SELECT event_type, EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hr FROM events),
cells AS (SELECT event_type, hr, COUNT(*) AS n FROM e GROUP BY event_type, hr),
full_t AS (
  SELECT t.event_type, h.hr, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM cells) t
  CROSS JOIN (SELECT DISTINCT hr FROM cells) h
  LEFT JOIN cells c ON c.event_type = t.event_type AND c.hr = h.hr
),
m AS (
  SELECT n,
         SUM(n) OVER (PARTITION BY event_type) AS row_tot,
         SUM(n) OVER (PARTITION BY hr) AS col_tot,
         SUM(n) OVER () AS grand
  FROM full_t
)
SELECT ROUND(SUM(POW(n - CAST(row_tot AS DOUBLE) * col_tot / grand, 2)
                  / (CAST(row_tot AS DOUBLE) * col_tot / grand)), 6) AS chi2,
       CAST(MAX(grand) AS BIGINT) AS n_events
FROM m
"""

register(
    QuerySpec(
        "chi_square_type_hour",
        chi_square_type_hour,
        CHI2_SQL,
        doc="chi-square independence of event_type vs hour-of-day",
        cites="training-data ops: categorical drift monitor (KS companion)",
        tags=("analytics", "stats"),
    )
)


def lang_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of the language mix per document source —
    the diversity metric a corpus-curation pipeline tracks per crawl.

    One groupBy builds (source, lang) counts; per-source totals are a
    window over that small table; H = -Σ p·ln p with integer counts until
    the single rounded division."""
    d = load_table(spark, sf_dir, "documents").select("source", "lang")
    cells = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy("source")
    t = cells.withColumn("tot", F.sum("n").over(w))
    return (
        t.withColumn("p", F.col("n") / F.col("tot"))
        .groupBy("source")
        .agg(
            F.max("tot").alias("n_docs"),
            F.count("*").alias("n_langs"),
            F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("lang_entropy"),
        )
    )


ENTROPY_SQL = """
WITH cells AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang),
t AS (SELECT source, lang, n, SUM(n) OVER (PARTITION BY source) AS tot FROM cells)
SELECT source,
       CAST(MAX(tot) AS BIGINT) AS n_docs,
       COUNT(*) AS n_langs,
       ROUND(-SUM((CAST(n AS DOUBLE) / tot) * LN(CAST(n AS DOUBLE) / tot)), 6) AS lang_entropy
FROM t GROUP BY source
"""

register(
    QuerySpec(
        "lang_entropy_by_source",
        lang_entropy_by_source,
        ENTROPY_SQL,
        doc="Shannon entropy of language mix per source",
        cites="corpus curation: diversity tracking",
        tags=("analytics", "stats", "text"),
    )
)


def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem numeric measures —
    the one-pass profile step before feature selection. All six
    correlations come out of ONE aggregation over the table (no per-pair
    scans), then unpivot to (col_a, col_b, corr) rows."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = load_table(spark, sf_dir, "lineitem").select(
        *[F.col(c).cast("double").alias(c) for c in cols]
    )
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.round(F.corr(a, b), 6).alias(f"{a}|{b}"))
    wide = li.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name.split("|")[0]).alias("col_a"),
                F.lit(name.split("|")[1]).alias("col_b"),
                F.col(f"`{name}`").alias("corr"),
            )
            for name in wide.columns
        ]
    )
    return wide.select(F.explode(pairs).alias("p")).select("p.col_a", "p.col_b", "p.corr")


def _corr_sql() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    rows = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            rows.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                f"ROUND(CORR(CAST({a} AS DOUBLE), CAST({b} AS DOUBLE)), 6) AS corr FROM lineitem"
            )
    return "\nUNION ALL\n".join(rows)


register(
    QuerySpec(
        "corr_matrix_lineitem",
        corr_matrix_lineitem,
        _corr_sql(),
        doc="pairwise Pearson correlation matrix in one aggregation pass",
        cites="feature profiling: one-pass co-moment statistics",
        tags=("analytics", "stats"),
    )
)


def ols_daily_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares trend of daily order revenue over time —
    slope/intercept/R² from closed-form moment sums, the scale-correct
    way to fit a line on 100 TB: ONE aggregation pass computes the five
    moments; no gradient loop, no collect of points.

    Both engines evaluate the same covariance/variance formulation
    (rounded), not their built-in regr_* functions, so the arithmetic is
    engine-portable."""
    o = load_table(spark, sf_dir, "orders").select(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("double")
        .alias("x"),
        F.col("o_totalprice").alias("y"),
    )
    daily = o.groupBy("x").agg(sum_money("y").alias("rev"))
    m = daily.agg(
        F.count("*").alias("n"),
        F.covar_pop("x", "rev").alias("sxy"),
        F.var_pop("x").alias("sxx"),
        F.var_pop("rev").alias("syy"),
        F.avg("x").alias("mx"),
        F.avg("rev").alias("my"),
    )
    slope = F.col("sxy") / F.col("sxx")
    return m.select(
        F.col("n").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), 4).alias("intercept"),
        F.round(
            (F.col("sxy") * F.col("sxy")) / (F.col("sxx") * F.col("syy")), 6
        ).alias("r2"),
    )


OLS_SQL = """
WITH pts AS (
  SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS DOUBLE) AS x,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY o_orderdate
),
m AS (
  SELECT COUNT(*) AS n, COVAR_POP(x, rev) AS sxy, VAR_POP(x) AS sxx,
         VAR_POP(rev) AS syy, AVG(x) AS mx, AVG(rev) AS my
  FROM pts
)
SELECT n AS n_days,
       ROUND(sxy / sxx, 6) AS slope,
       ROUND(my - (sxy / sxx) * mx, 4) AS intercept,
       ROUND((sxy * sxy) / (sxx * syy), 6) AS r2
FROM m
"""

register(
    QuerySpec(
        "ols_daily_revenue_trend",
        ols_daily_revenue_trend,
        OLS_SQL,
        doc="closed-form OLS trend (slope/intercept/R²) of daily revenue",
        cites="one-pass moment statistics; feature/metric trend fitting",
        tags=("analytics", "stats"),
    )
)


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law — the classic anomaly screen for fabricated numeric data, run as
    one groupBy over a digit extraction.

    Emits per-digit observed share, Benford expectation log10(1+1/d),
    and the absolute deviation; integer counts throughout, doubles only
    in the final rounded columns."""
    o = load_table(spark, sf_dir, "orders").select(
        F.substring(F.col("o_totalprice").cast("string"), 1, 1).cast("int").alias("d")
    )
    counts = o.where(F.col("d").between(1, 9)).groupBy("d").agg(
        F.count("*").alias("n")
    )
    tot = Window.partitionBy()
    return (
        counts.withColumn("total", F.sum("n").over(tot))
        .select(
            "d",
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("observed_p"),
            F.round(F.log10(1 + 1 / F.col("d")), 6).alias("benford_p"),
            F.round(
                F.abs(F.col("n") / F.col("total") - F.log10(1 + 1 / F.col("d"))), 6
            ).alias("abs_dev"),
        )
    )


BENFORD_SQL = """
WITH digits AS (
  SELECT CAST(SUBSTRING(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT) AS d
  FROM orders
),
counts AS (
  SELECT d, COUNT(*) AS n FROM digits WHERE d BETWEEN 1 AND 9 GROUP BY d
)
SELECT d, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS observed_p,
       ROUND(LOG10(1 + 1.0 / d), 6) AS benford_p,
       ROUND(ABS(CAST(n AS DOUBLE) / SUM(n) OVER () - LOG10(1 + 1.0 / d)), 6) AS abs_dev
FROM counts
"""

register(
    QuerySpec(
        "benford_first_digit",
        benford_first_digit,
        BENFORD_SQL,
        doc="Benford first-digit anomaly screen on order totals",
        cites="data-quality family: numeric-fabrication screen",
        tags=("analytics", "stats", "quality"),
    )
)


MIN_PAIR_ORDERS = 2
TOP_RULES = 20


def association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over part co-occurrence: for the
    top pairs by lift, emit support / confidence / lift — the classic
    recommendation primitive, computed with one self-join bounded by
    lines-per-order plus two small aggregations.

    Counts stay integers until the final rounded ratios; ranking is on
    the ROUNDED lift with a full key tie-break so both engines agree."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = li.select("l_orderkey").distinct().agg(F.count("*").alias("n_orders"))
    item = li.groupBy(F.col("l_partkey").alias("k")).agg(F.count("*").alias("item_n"))
    a, b = li.alias("a"), li.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count("*").alias("pair_n"))
        .where(F.col("pair_n") >= MIN_PAIR_ORDERS)
    )
    ia = item.select(F.col("k").alias("part_a"), F.col("item_n").alias("n_a"))
    ib = item.select(F.col("k").alias("part_b"), F.col("item_n").alias("n_b"))
    scored = (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_n",
            F.round(F.col("pair_n") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("pair_n") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                (F.col("pair_n") * F.col("n_orders")) / (F.col("n_a") * F.col("n_b")), 4
            ).alias("lift"),
        )
    )
    w = Window.orderBy(F.desc("lift"), "part_a", "part_b")
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= TOP_RULES)
        .select("pos", "part_a", "part_b", "pair_n", "support", "confidence", "lift")
    )


ASSOC_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
item AS (SELECT l_partkey AS k, COUNT(*) AS item_n FROM li GROUP BY l_partkey),
pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS pair_n
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {MIN_PAIR_ORDERS}
),
scored AS (
  SELECT p.part_a, p.part_b, p.pair_n,
         ROUND(CAST(p.pair_n AS DOUBLE) / n.n_orders, 6) AS support,
         ROUND(CAST(p.pair_n AS DOUBLE) / ia.item_n, 6) AS confidence,
         ROUND(CAST(p.pair_n AS DOUBLE) * n.n_orders / (ia.item_n * ib.item_n), 4) AS lift
  FROM pair p
  JOIN item ia ON p.part_a = ia.k
  JOIN item ib ON p.part_b = ib.k
  CROSS JOIN n_orders n
)
SELECT pos, part_a, part_b, pair_n, support, confidence, lift FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, part_a, part_b) AS pos FROM scored
) WHERE pos <= {TOP_RULES}
"""

register(
    QuerySpec(
        "association_rules_parts",
        association_rules_parts,
        ASSOC_SQL,
        doc="market-basket association rules (support/confidence/lift, top-k by lift)",
        cites="basket analytics: recommendation primitive",
        tags=("analytics", "join"),
    )
)


def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth: yearly totals then a lag window —
    the first chart on every revenue dashboard. Yearly sums are rounded
    before the ratio so the growth percentages are engine-portable."""
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"), "o_totalprice"
    )
    yearly = o.groupBy("yr").agg(sum_money("o_totalprice").alias("revenue"))
    w = Window.orderBy("yr")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "yr",
        "revenue",
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("yoy_growth_pct"),
    )


YOY_SQL = """
WITH yearly AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT CAST(yr AS INT) AS yr, revenue,
       ROUND((revenue - LAG(revenue) OVER (ORDER BY yr))
             / LAG(revenue) OVER (ORDER BY yr) * 100, 4) AS yoy_growth_pct
FROM yearly
"""

register(
    QuerySpec(
        "yoy_revenue_growth",
        yoy_revenue_growth,
        YOY_SQL,
        doc="year-over-year revenue growth (lag over yearly totals)",
        cites="interactive-analytics surface (SURVEY §3.3 audience)",
        tags=("analytics", "window"),
    )
)


def pareto_customer_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto analysis: the smallest set of customers covering 80% of
    revenue, with each customer's cumulative share — "how concentrated is
    the business?". Per-customer revenue is rounded to exact cents, the
    ordered cumulative sum runs as a two-pass bucketed prefix scan
    (operators/ordered.py — |customers| grows with data, so a global
    window would single-reduce at 100 TB), and the 80% cutoff compares
    in cleared-integer form (10·prev_cum < 8·total) so the selected row
    set is engine-exact; the one division per output row happens last."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    per_cust = o.groupBy("o_custkey").agg(
        sum_money("o_totalprice").alias("revenue"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"),
    )
    tot = per_cust.agg(F.sum("cents").alias("tot_cents"))
    ranked = with_global_order(
        per_cust, "revenue", descending=True, tiebreaks=["o_custkey"],
        prefix_sums={"cum_cents": "cents"},
    ).crossJoin(F.broadcast(tot))
    return (
        # keep every customer whose PREVIOUS cumulative share was below
        # the cutoff: the minimal prefix reaching 80%
        ranked.where(
            (F.col("cum_cents") - F.col("cents")) * 10 < F.col("tot_cents") * 8
        )
        .select(
            "o_custkey",
            "revenue",
            F.round(F.col("cum_cents") / F.col("tot_cents"), 6).alias("cum_share"),
        )
    )


PARETO_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot_cents FROM per_cust),
ranked AS (
  SELECT o_custkey, revenue, cents,
         CAST(SUM(cents) OVER (ORDER BY revenue DESC, o_custkey
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
  FROM per_cust
)
SELECT o_custkey, revenue,
       ROUND(CAST(cum_cents AS DOUBLE) / tot_cents, 6) AS cum_share
FROM ranked, tot
WHERE (cum_cents - cents) * 10 < tot_cents * 8
"""

register(
    QuerySpec(
        "pareto_customer_share",
        pareto_customer_share,
        PARETO_SQL,
        doc="Pareto revenue concentration: minimal customer prefix reaching 80%",
        cites="interactive-analytics surface (SURVEY §3.3 audience)",
        tags=("analytics", "window"),
    )
)


RFM_ASOF = "1998-08-02"  # day after the last order date in the corpus


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation: each
    active customer scored 1-5 by NTILE quintile on days-since-last-order,
    order count, and rounded lifetime spend, plus the classic
    champion/loyal/at-risk/hibernating labels on the R×F grid.

    One groupBy(customer) computes all three metrics; the three quintile
    assignments share full-key tie-breaks (metric, custkey) so bucket
    boundaries are engine-deterministic. |customers| grows with data, so
    each NTILE runs as the distributed two-pass rank + closed-form tile
    formula (operators/ordered.py) instead of a global sort window —
    bucket assignment is provably identical to SQL NTILE over the same
    tie-broken order."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(F.lit(RFM_ASOF).cast("date"), F.max("o_orderdate")).alias("recency_days"),
        F.count("*").alias("frequency"),
        sum_money("o_totalprice").alias("monetary"),
    )
    # three independent quintiles from ONE materialized base + one
    # batched quantile pass (multi_global_ranks) — chaining three
    # ntile_distributed calls would re-evaluate the groupBy cascade
    scored = multi_global_ranks(
        per_cust,
        on=["o_custkey"],
        specs=[
            # 1 = most recent / most frequent / highest spend
            dict(key="recency_days", out="r_score", ntile=5, tiebreaks=["o_custkey"]),
            dict(key="frequency", out="f_score", ntile=5, descending=True, tiebreaks=["o_custkey"]),
            dict(key="monetary", out="m_score", ntile=5, descending=True, tiebreaks=["o_custkey"]),
        ],
    )
    scored = scored.select(
        "o_custkey", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
    )
    seg = (
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion")
        .when(F.col("f_score") <= 2, "loyal_lapsing")
        .when(F.col("r_score") <= 2, "recent_casual")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "hibernating")
        .otherwise("middling")
    )
    return scored.withColumn("segment", seg)


RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         date_diff('day', MAX(o_orderdate), DATE '{RFM_ASOF}') AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey, CAST(recency_days AS INT) AS recency_days, frequency, monetary,
         NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
         NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
         NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
  FROM per_cust
)
SELECT *,
       CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
            WHEN f_score <= 2 THEN 'loyal_lapsing'
            WHEN r_score <= 2 THEN 'recent_casual'
            WHEN r_score >= 4 AND f_score >= 4 THEN 'hibernating'
            ELSE 'middling' END AS segment
FROM scored
"""

register(
    QuerySpec(
        "rfm_segments",
        rfm_segments,
        RFM_SQL,
        doc="RFM quintile segmentation with champion/at-risk grid labels",
        cites="interactive-analytics surface (SURVEY §3.3 audience)",
        tags=("analytics", "window"),
    )
)


def conversion_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of view→purchase conversion latency: for each user
    whose first purchase follows their first view, the hours between,
    bucketed into an hour histogram — the "how long does conversion
    take?" follow-up to funnel_conversion. Two user-keyed min-aggregations
    and one small groupBy; integer epoch math end to end."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    first_view = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    first_purchase = (
        e.where(F.col("event_type") == "purchase")
        .join(first_view, "user_id")
        .where(F.col("ts") >= F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"), F.min("view_ts").alias("view_ts2"))
    )
    hours = F.floor(
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts2")) / 3600
    )
    return (
        first_purchase.select(hours.alias("latency_hours"))
        .groupBy("latency_hours")
        .agg(F.count("*").alias("n_users"))
    )


CONV_LATENCY_SQL = """
WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
first_view AS (
  SELECT user_id, MIN(ts) AS view_ts FROM e WHERE event_type = 'view' GROUP BY user_id
),
first_purchase AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts, MIN(v.view_ts) AS view_ts2
  FROM e JOIN first_view v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= v.view_ts
  GROUP BY e.user_id
)
SELECT CAST(FLOOR((epoch(purchase_ts) - epoch(view_ts2)) / 3600) AS BIGINT) AS latency_hours,
       COUNT(*) AS n_users
FROM first_purchase
GROUP BY 1
"""

register(
    QuerySpec(
        "conversion_latency_histogram",
        conversion_latency_histogram,
        CONV_LATENCY_SQL,
        doc="view-to-purchase conversion latency histogram (hours)",
        cites="interactive-analytics surface; funnel_conversion companion",
        tags=("analytics", "window"),
    )
)


def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the windowed
    COUNT(DISTINCT) no engine can express as a plain window function.

    Scalable formulation: each (user, active-day) row contributes to the
    7 window-end days it falls in (sequence + explode — a bounded 7×
    row expansion), then ONE groupBy(day) distinct-count. This is the
    standard trick that turns an unbounded sliding-distinct into a
    shuffle keyed on (day), linear at any scale; the self-join
    formulation the oracle uses would be quadratic in window count.
    Reported days are restricted to days with any activity."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_timestamp("ts") / 86400).alias("d")
    )
    days = e.distinct()
    spine = days.select("d").distinct()
    contrib = days.select(
        "user_id", F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("win_d")
    )
    return (
        contrib.join(spine.withColumnRenamed("d", "win_d"), "win_d", "left_semi")
        .groupBy("win_d")
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
        .select(F.col("win_d").alias("day_epoch"), "active_users_7d")
    )


ROLLING_DAU_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS d
  FROM events
),
spine AS (SELECT DISTINCT d FROM days)
SELECT s.d AS day_epoch, COUNT(DISTINCT y.user_id) AS active_users_7d
FROM spine s JOIN days y ON y.d BETWEEN s.d - 6 AND s.d
GROUP BY s.d
"""

register(
    QuerySpec(
        "rolling_7d_active_users",
        rolling_7d_active_users,
        ROLLING_DAU_SQL,
        doc="rolling 7-day distinct actives via contribution explode (no sliding-distinct window)",
        cites="interactive-analytics surface; scalable windowed-distinct pattern",
        tags=("analytics", "window"),
    )
)


def cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly new users + running cumulative uniques — the growth curve.

    Running COUNT(DISTINCT) needs no distinct at all: a user is "new" in
    exactly one hour (their min-hour row), so one user-keyed aggregation
    plus a tiny hour-level window gives the exact cumulative uniques.
    The groupBy(user) shuffle is the only data-sized move."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_timestamp("ts") / 3600).alias("h")
    )
    first_hour = e.groupBy("user_id").agg(F.min("h").alias("h"))
    hourly_new = first_hour.groupBy("h").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    return hourly_new.select(
        F.col("h").alias("hour_epoch"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


CUM_NEW_USERS_SQL = """
WITH e AS (
  SELECT user_id, CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS h
  FROM events
),
first_hour AS (SELECT user_id, MIN(h) AS h FROM e GROUP BY user_id),
hourly_new AS (SELECT h, COUNT(*) AS new_users FROM first_hour GROUP BY h)
SELECT h AS hour_epoch, new_users,
       CAST(SUM(new_users) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cumulative_users
FROM hourly_new
"""

register(
    QuerySpec(
        "cumulative_new_users",
        cumulative_new_users,
        CUM_NEW_USERS_SQL,
        doc="hourly new users + exact running cumulative uniques (first-seen trick)",
        cites="interactive-analytics surface; growth-curve primitive",
        tags=("analytics", "window"),
    )
)


# Poisson(1) CDF thresholds: resample count k is the number of thresholds
# below the row's deterministic uniform draw.
_POIS_CDF = (
    0.3678794411714423,
    0.7357588823428846,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)
BOOTSTRAP_B = 32


def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean order value: B=32 deterministic
    resamples computed in ONE pass — the scalable bootstrap (each row
    draws an independent Poisson(1) replication count per resample from
    a seeded md5 uniform, so no resample ever materializes and no
    sampling shuffle exists; the pass is embarrassingly parallel).

    Determinism: prices are converted to exact integer cents and summed
    as DECIMAL (order-independent), so each resample mean is bit-stable
    across engines and partitionings — the driver hashes all 32 rows."""
    # the orders scan is a handful of splits at test SFs while the per-row
    # hash work is large — spread() widens compute to the session's cores
    # (a no-op on real wide scans)
    o = spread(load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"))
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)")

    # Expressions are built as SQL strings (one py4j call per column, not
    # one per operator node — the fluent form spent ~2.5 s of DRIVER time
    # constructing 32x8 comparison Columns). Four 32-bit uniforms per md5:
    # resamples 4j..4j+3 slice hash j. The CDF inversion stays a chained
    # comparison — it codegens (an equivalent size(filter(...)) HOF form
    # executes interpreted and measured ~6x slower at sf0.1).
    def draw(b: int) -> str:
        u = (
            f"(CAST(conv(substring(md5(concat_ws('#', o_orderkey, {b // 4})), "
            f"{(b % 4) * 8 + 1}, 8), 16, 10) AS BIGINT) / 4294967296.0D)"
        )
        c = " + ".join(f"CAST({u} >= {t!r}D AS INT)" for t in _POIS_CDF)
        return f"({c}) AS c{b}"

    proj = o.select(
        cents.alias("cents"),
        *[F.expr(draw(b)) for b in range(BOOTSTRAP_B)],
    )
    wide = proj.agg(
        *[F.expr(e) for b in range(BOOTSTRAP_B) for e in (
            f"sum(cents * c{b}) AS s{b}", f"CAST(sum(c{b}) AS BIGINT) AS n{b}"
        )]
    )
    rows = F.expr(
        "array(" + ", ".join(
            f"struct({b} AS resample, n{b} AS n_eff, "
            f"round(CAST(s{b} AS DOUBLE) / n{b} / 100.0D, 4) AS resample_mean)"
            for b in range(BOOTSTRAP_B)
        ) + ")"
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def _bootstrap_sql() -> str:
    cols = []
    for b in range(BOOTSTRAP_B):
        u = (
            f"(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '#{b // 4}'), "
            f"{(b % 4) * 8 + 1}, 8))::BIGINT / 4294967296.0)"
        )
        c = " + ".join(f"CASE WHEN {u} >= {t!r} THEN 1 ELSE 0 END" for t in _POIS_CDF)
        cols.append(f"({c}) AS c{b}")
    sums = ", ".join(
        f"SUM(cents * c{b}) AS s{b}, CAST(SUM(c{b}) AS BIGINT) AS n{b}"
        for b in range(BOOTSTRAP_B)
    )
    rows = " UNION ALL ".join(
        f"SELECT {b} AS resample, n{b} AS n_eff,"
        f" ROUND(CAST(s{b} AS DOUBLE) / n{b} / 100.0, 4) AS resample_mean FROM wide"
        for b in range(BOOTSTRAP_B)
    )
    return f"""
WITH proj AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS DECIMAL(18,0)) AS cents,
         {', '.join(cols)}
  FROM orders
),
wide AS (SELECT {sums} FROM proj)
{rows}
"""


register(
    QuerySpec(
        "bootstrap_mean_ci",
        bootstrap_mean_ci,
        _bootstrap_sql(),
        doc="Poisson bootstrap of mean order value (32 one-pass deterministic resamples)",
        cites="scalable resampling: Poisson bootstrap (Chamandy et al.)",
        tags=("analytics", "stats", "sampling"),
    )
)


# ---- time-constrained funnel ------------------------------------------------

_FUNNEL_WINDOW_H = 24


def timed_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel with per-step time budgets: first view → first click within
    24 h of that view → first purchase within 24 h of that click.
    `funnel_conversion` orders steps but never bounds the wait; bounded
    steps are what campaign/journey analysis actually measures.

    Greedy-earliest semantics make the chain unique and deterministic:
    v₀ = user's first view; c₀ = first click in (v₀, v₀+24h]; p₀ = first
    purchase in (c₀, c₀+24h]. Three user-keyed aggregations/joins (the
    sessionization shuffle key), integer epoch-µs arithmetic end to end;
    latency sums stay BIGINT seconds until two final rounded divisions.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("unix_micros(ts)").alias("us")
    )
    win = _FUNNEL_WINDOW_H * 3_600_000_000
    v0 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v0"))
    )
    c0 = (
        e.where(F.col("event_type") == "click")
        .join(v0, "user_id")
        .where((F.col("us") > F.col("v0")) & (F.col("us") <= F.col("v0") + F.lit(win)))
        .groupBy("user_id")
        .agg(F.min("us").alias("c0"), F.min("v0").alias("v0"))
    )
    p0 = (
        e.where(F.col("event_type") == "purchase")
        .join(c0, "user_id")
        .where((F.col("us") > F.col("c0")) & (F.col("us") <= F.col("c0") + F.lit(win)))
        .groupBy("user_id")
        .agg(F.min("us").alias("p0"), F.min("c0").alias("c0"), F.min("v0").alias("v0"))
    )
    counts = (
        v0.agg(F.count(F.lit(1)).alias("users_view"))
        .crossJoin(c0.agg(F.count(F.lit(1)).alias("users_click_24h")))
        .crossJoin(
            p0.agg(
                F.count(F.lit(1)).alias("users_purchase_24h"),
                F.sum(F.expr("(c0 - v0) div 1000000")).alias("s_vc"),
                F.sum(F.expr("(p0 - c0) div 1000000")).alias("s_cp"),
            )
        )
    )
    return counts.selectExpr(
        "users_view",
        "users_click_24h",
        "users_purchase_24h",
        "round(CAST(s_vc AS DOUBLE) / users_purchase_24h / 3600.0, 4) AS avg_view_to_click_h",
        "round(CAST(s_cp AS DOUBLE) / users_purchase_24h / 3600.0, 4) AS avg_click_to_buy_h",
    )


def _timed_funnel_sql() -> str:
    win = _FUNNEL_WINDOW_H * 3_600_000_000
    return f"""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v0 AS (SELECT user_id, MIN(us) AS v0 FROM ev WHERE event_type = 'view' GROUP BY 1),
c0 AS (
  SELECT e.user_id, MIN(e.us) AS c0, MIN(v.v0) AS v0
  FROM ev e JOIN v0 v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.us > v.v0 AND e.us <= v.v0 + {win}
  GROUP BY 1
),
p0 AS (
  SELECT e.user_id, MIN(e.us) AS p0, MIN(c.c0) AS c0, MIN(c.v0) AS v0
  FROM ev e JOIN c0 c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.us > c.c0 AND e.us <= c.c0 + {win}
  GROUP BY 1
),
agg AS (
  SELECT (SELECT COUNT(*) FROM v0) AS users_view,
         (SELECT COUNT(*) FROM c0) AS users_click_24h,
         (SELECT COUNT(*) FROM p0) AS users_purchase_24h,
         (SELECT CAST(SUM((c0 - v0) // 1000000) AS BIGINT) FROM p0) AS s_vc,
         (SELECT CAST(SUM((p0 - c0) // 1000000) AS BIGINT) FROM p0) AS s_cp
)
SELECT users_view, users_click_24h, users_purchase_24h,
       ROUND(CAST(s_vc AS DOUBLE) / users_purchase_24h / 3600.0, 4) AS avg_view_to_click_h,
       ROUND(CAST(s_cp AS DOUBLE) / users_purchase_24h / 3600.0, 4) AS avg_click_to_buy_h
FROM agg
"""


register(
    QuerySpec(
        "timed_funnel_conversion",
        timed_funnel_conversion,
        _timed_funnel_sql(),
        doc="funnel with 24h per-step budgets: greedy-earliest chains, integer epoch arithmetic",
        cites="bounded-step twin of funnel_conversion",
        tags=("analytics", "funnel", "behavior"),
    )
)


def benford_second_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford SECOND-digit screen on order values — the follow-up test
    auditors run when the first digit passes (fabricated numbers often
    fake the leading digit but draw the second uniformly). Expected
    P(d₂=d) = Σ_{d₁=1..9} log10(1 + 1/(10·d₁+d)), written as the same
    fixed-order 9-term sum on both engines."""
    o = load_table(spark, sf_dir, "orders")
    digits = o.selectExpr(
        "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 2, 1) AS INT) AS d"
    ).where("d IS NOT NULL")
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    exp_case = _benford2_case()
    # deviation from the ROUNDED components: the 9-term log10 sums differ
    # between libm implementations in the last ulp, which flips the 6th
    # decimal exactly on rounding boundaries (verify-skill float rule)
    rounded = counts.selectExpr(
        "d",
        "n",
        "round(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS observed_p",
        f"round({exp_case}, 6) AS benford_p",
    )
    return rounded.selectExpr(
        "d", "n", "observed_p", "benford_p",
        "round(ABS(observed_p - benford_p), 6) AS abs_dev",
    ).orderBy("d")


def _benford2_case() -> str:
    """Expected second-digit probabilities as PRECOMPUTED literals — the
    9-term log10 sums evaluated per-engine disagree in the last ulp and
    flip the 6-decimal rounding; a shared Python-computed constant cannot."""
    import math

    def expected(d: int) -> float:
        return sum(math.log10(1 + 1.0 / (10 * d1 + d)) for d1 in range(1, 10))

    return (
        "CASE "
        + " ".join(f"WHEN d = {d} THEN CAST({expected(d)!r} AS DOUBLE)" for d in range(10))
        + " END"
    )


def _benford2_sql() -> str:
    exp_case = _benford2_case()
    return f"""
WITH digits AS (
  SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 2, 1) AS INT) AS d
  FROM orders
),
counts AS (SELECT d, COUNT(*) AS n FROM digits WHERE d IS NOT NULL GROUP BY d)
SELECT d, n, observed_p, benford_p,
       ROUND(ABS(observed_p - benford_p), 6) AS abs_dev
FROM (
  SELECT d, n,
         ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS observed_p,
         ROUND({exp_case}, 6) AS benford_p
  FROM counts
) ORDER BY d
"""


register(
    QuerySpec(
        "benford_second_digit",
        benford_second_digit,
        _benford2_sql(),
        doc="Benford second-digit deviation screen (fixed-order expected-probability sums)",
        cites="forensic pair of benford_first_digit",
        tags=("analytics", "forensics", "stats"),
    )
)


def customer_aliveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn screen: for each repeat customer, the BG/NBD-flavored
    heuristic  log P(alive) = n · ln((T − recency)/T)  — a customer who
    ordered often (large n) but not recently (large recency) gets a very
    negative score. The log STAYS an integer (micro-nat quantization, the
    naive-Bayes idiom), so ranking needs no cross-engine libm exp and
    the output hash-verifies exactly. One orders aggregation; output the
    25 highest-value customers most likely to have churned."""
    o = load_table(spark, sf_dir, "orders")
    horizon = o.agg(F.max("o_orderdate").alias("t_end"))
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("o_orderdate").alias("last_order"),
            F.expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)").alias(
                "rev_cents"
            ),
        )
        .where(F.col("n_orders") >= 3)
        .crossJoin(F.broadcast(horizon))
        .select(
            "o_custkey",
            "n_orders",
            "rev_cents",
            F.expr("CAST(datediff(t_end, last_order) AS BIGINT)").alias("recency_days"),
            F.expr(
                "CAST(datediff(t_end, DATE'1992-01-01') AS BIGINT)"
            ).alias("t_days"),
        )
        .where(F.col("recency_days") < F.col("t_days"))
    )
    scored = per.select(
        "o_custkey",
        "n_orders",
        "recency_days",
        "rev_cents",
        F.expr(
            "n_orders * CAST(round(ln(CAST(t_days - recency_days AS DOUBLE) / t_days)"
            " * 1000000) AS BIGINT)"
        ).alias("log_p_alive_micronats"),
    )
    w = Window.orderBy("log_p_alive_micronats", F.desc("rev_cents"), "o_custkey")
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= 25)
        .select(
            "pos",
            F.col("o_custkey").alias("cust_key"),
            "n_orders",
            "recency_days",
            "rev_cents",
            "log_p_alive_micronats",
        )
    )


ALIVENESS_SQL = """
WITH horizon AS (SELECT MAX(o_orderdate) AS t_end FROM orders),
per AS (
  SELECT o_custkey, COUNT(*) AS n_orders, MAX(o_orderdate) AS last_order,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
  HAVING COUNT(*) >= 3
),
feat AS (
  SELECT p.o_custkey, p.n_orders, p.rev_cents,
         CAST(date_diff('day', p.last_order, h.t_end) AS BIGINT) AS recency_days,
         CAST(date_diff('day', DATE '1992-01-01', h.t_end) AS BIGINT) AS t_days
  FROM per p, horizon h
),
scored AS (
  SELECT o_custkey, n_orders, recency_days, rev_cents,
         n_orders * CAST(ROUND(ln(CAST(t_days - recency_days AS DOUBLE) / t_days)
                               * 1000000) AS BIGINT) AS log_p_alive_micronats
  FROM feat WHERE recency_days < t_days
)
SELECT ROW_NUMBER() OVER (ORDER BY log_p_alive_micronats, rev_cents DESC, o_custkey) AS pos,
       o_custkey AS cust_key, n_orders, recency_days, rev_cents, log_p_alive_micronats
FROM scored
QUALIFY pos <= 25
ORDER BY pos
"""


register(
    QuerySpec(
        "customer_aliveness",
        customer_aliveness,
        ALIVENESS_SQL,
        doc="BG/NBD-style churn screen: n·ln((T-recency)/T) kept integer in micro-nats",
        cites="lifecycle family with rfm_segments/kaplan_meier; quantized-log idiom",
        tags=("analytics", "lifecycle", "ml"),
    )
)


def new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per quarter, revenue split into NEW customers
    (first-ever order falls in that quarter — the first-seen trick, no
    sequential scan) vs returning ones. Exact cent sums; the shares are
    single divisions. The decomposition every board deck wants and every
    naive 'revenue is up' reading misses."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    q = F.expr(
        "CONCAT(CAST(year(o_orderdate) AS STRING), '-Q', CAST(quarter(o_orderdate) AS STRING))"
    )
    with_q = o.select(
        "o_custkey",
        q.alias("qtr"),
        F.expr("year(o_orderdate) * 10 + quarter(o_orderdate)").alias("qord"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    first_q = with_q.groupBy("o_custkey").agg(F.min("qord").alias("first_qord"))
    j = with_q.join(first_q, "o_custkey").select(
        "qtr",
        "qord",
        "cents",
        (F.col("qord") == F.col("first_qord")).cast("int").alias("is_new"),
    )
    return (
        j.groupBy("qtr", "qord")
        .agg(
            F.sum(F.expr("IF(is_new = 1, cents, 0)")).alias("new_cents"),
            F.sum(F.expr("IF(is_new = 0, cents, 0)")).alias("returning_cents"),
            F.sum(F.expr("is_new")).alias("n_new_orders"),
        )
        .selectExpr(
            "qtr",
            "new_cents",
            "returning_cents",
            "round(CAST(new_cents AS DOUBLE) / (new_cents + returning_cents), 6)"
            " AS new_share",
        )
        .orderBy("qord")
        .drop("qord")
    )


NEW_RETURNING_SQL = """
WITH with_q AS (
  SELECT o_custkey,
         CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) || '-Q'
           || CAST(EXTRACT(quarter FROM o_orderdate) AS VARCHAR) AS qtr,
         EXTRACT(year FROM o_orderdate) * 10 + EXTRACT(quarter FROM o_orderdate) AS qord,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
first_q AS (SELECT o_custkey, MIN(qord) AS first_qord FROM with_q GROUP BY 1)
SELECT w.qtr,
       CAST(SUM(CASE WHEN w.qord = f.first_qord THEN w.cents ELSE 0 END) AS BIGINT)
         AS new_cents,
       CAST(SUM(CASE WHEN w.qord <> f.first_qord THEN w.cents ELSE 0 END) AS BIGINT)
         AS returning_cents,
       ROUND(CAST(SUM(CASE WHEN w.qord = f.first_qord THEN w.cents ELSE 0 END) AS DOUBLE)
             / SUM(w.cents), 6) AS new_share
FROM with_q w JOIN first_q f ON w.o_custkey = f.o_custkey
GROUP BY w.qtr, w.qord
ORDER BY w.qord
"""


register(
    QuerySpec(
        "new_vs_returning_revenue",
        new_vs_returning_revenue,
        NEW_RETURNING_SQL,
        doc="quarterly revenue split into new vs returning customers (first-seen trick)",
        cites="growth accounting beside cumulative_new_users",
        tags=("analytics", "growth"),
    )
)


def bestseller_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stability of the top-20 bestseller list between adjacent quarters:
    |top20(q) ∩ top20(q+1)| / 20 — the assortment-churn metric. Ranks by
    exact cent revenue with part-key tie-break; the overlap is an integer
    set intersection, so every number is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    qrev = li.groupBy(
        F.expr("year(l_shipdate) * 10 + quarter(l_shipdate)").alias("qord"),
        "l_partkey",
    ).agg(
        F.expr(
            "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)"
        ).alias("rev")
    )
    w = Window.partitionBy("qord").orderBy(F.desc("rev"), "l_partkey")
    top = qrev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 20)
    a, b = top.alias("a"), top.alias("b")
    return (
        a.join(b, F.col("a.qord") + 1 == F.col("b.qord"))
        .where(F.col("a.l_partkey") == F.col("b.l_partkey"))
        .groupBy(F.col("a.qord").alias("qord"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .selectExpr(
            "qord",
            "n_common",
            "round(CAST(n_common AS DOUBLE) / 20, 4) AS retention_of_top20",
        )
        .orderBy("qord")
    )


BESTSELLER_SQL = """
WITH qrev AS (
  SELECT EXTRACT(year FROM l_shipdate) * 10 + EXTRACT(quarter FROM l_shipdate) AS qord,
         l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS rev
  FROM lineitem GROUP BY 1, 2
),
top AS (
  SELECT qord, l_partkey,
         ROW_NUMBER() OVER (PARTITION BY qord ORDER BY rev DESC, l_partkey) AS rn
  FROM qrev QUALIFY rn <= 20
)
SELECT a.qord, COUNT(*) AS n_common,
       ROUND(CAST(COUNT(*) AS DOUBLE) / 20, 4) AS retention_of_top20
FROM top a JOIN top b ON a.qord + 1 = b.qord AND a.l_partkey = b.l_partkey
GROUP BY 1 ORDER BY 1
"""


register(
    QuerySpec(
        "bestseller_stability",
        bestseller_stability,
        BESTSELLER_SQL,
        doc="quarter-over-quarter retention of the top-20 bestseller set (exact overlap)",
        cites="assortment churn beside nation_rank_momentum",
        tags=("analytics", "ranking"),
    )
)


# --- session path analysis: top full event-type sequences ------------------

PATH_TOP = 15


def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the most common COMPLETE event-type sequences per
    30-min session ('view>click>purchase'), with session counts and the
    exact-decimal value total. Generalizes the first-order transition
    matrix (event_transition_matrix) to whole paths.

    Scale shape: sessionization and the ordered path concat share ONE
    user-keyed shuffle — the path is built by array_sort over collected
    (ts, event_id, type) structs inside the session group, not by a
    second ordering pass. Path cardinality, not event volume, feeds the
    final bounded top-k."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts", 1).over(w)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev)
    is_new = F.when(prev.isNull() | (gap_us > 30 * 60 * 1000000), 1).otherwise(0)
    sess = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    per_session = (
        e.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda s: s.event_type,
                ),
                ">",
            ).alias("path"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sess_value"),
        )
    )
    return (
        per_session.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("sess_value").cast("double").alias("total_value"),
        )
        .withColumn("pos", F.row_number().over(Window.orderBy(F.desc("n_sessions"), "path")))
        .where(F.col("pos") <= PATH_TOP)
        .select("pos", "path", "n_sessions", "total_value")
    )


SESSION_PATH_SQL = f"""
WITH e AS (SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
flagged AS (
  SELECT *,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id,
         STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path,
         SUM(CAST(value AS DECIMAL(18,2))) AS sess_value
  FROM sessions GROUP BY user_id, session_id
)
SELECT pos, path, n_sessions, total_value FROM (
  SELECT path, COUNT(*) AS n_sessions,
         CAST(SUM(sess_value) AS DOUBLE) AS total_value,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS pos
  FROM per_session GROUP BY path
) WHERE pos <= {PATH_TOP}
"""

register(
    QuerySpec(
        "session_path_topk",
        session_path_topk,
        SESSION_PATH_SQL,
        doc="top complete session paths (ordered event-type sequences) with value totals",
        cites="path-analysis family; generalizes event_transition_matrix",
        tags=("analytics", "window", "text"),
    )
)


# --- SLA compliance: fulfilment-day percentiles per month ------------------

SLA_DAYS = 30


def sla_fulfilment_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational SLA report: per order-month, the p50/p90 fulfilment
    time (order date → last line shipped) selected by exact integer ROW
    POSITION (ceil(q·n), ties by order key — no interpolated quantiles,
    so the value is a real observation and engine-exact), plus the % of
    orders inside the 30-day SLA. One lineitem max-reduce, one month
    window for ranks."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    days = (
        li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("done"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").alias("m"),
            F.greatest(F.datediff(F.to_date("done"), F.to_date("o_orderdate")), F.lit(0)).alias("d"),
        )
    )
    w_rank = Window.partitionBy("m").orderBy("d", "o_orderkey")
    w_m = Window.partitionBy("m")
    ranked = days.select(
        "m", "d",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_m).alias("n"),
    )
    return ranked.groupBy("m", "n").agg(
        F.max(F.when(F.col("rn") == F.ceil(F.col("n") * 0.5), F.col("d"))).alias("p50_days"),
        F.max(F.when(F.col("rn") == F.ceil(F.col("n") * 0.9), F.col("d"))).alias("p90_days"),
        F.round(
            F.sum((F.col("d") <= SLA_DAYS).cast("bigint")) / F.col("n").cast("double"), 4
        ).alias("pct_within_sla"),
    ).select(F.col("m").alias("month"), "n", "p50_days", "p90_days", "pct_within_sla")


SLA_SQL = f"""
WITH days AS (
  SELECT o_orderkey, date_trunc('month', o_orderdate) AS m,
         GREATEST(date_diff('day', CAST(o_orderdate AS DATE), CAST(done AS DATE)), 0) AS d
  FROM (SELECT l_orderkey, MAX(l_shipdate) AS done FROM lineitem GROUP BY l_orderkey) x
  JOIN orders ON l_orderkey = o_orderkey
),
ranked AS (
  SELECT m, d,
         ROW_NUMBER() OVER (PARTITION BY m ORDER BY d, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY m) AS n
  FROM days
)
SELECT m AS month, n,
       MAX(CASE WHEN rn = CEIL(n * 0.5) THEN d END) AS p50_days,
       MAX(CASE WHEN rn = CEIL(n * 0.9) THEN d END) AS p90_days,
       ROUND(SUM(CASE WHEN d <= {SLA_DAYS} THEN 1 ELSE 0 END) / CAST(n AS DOUBLE), 4)
         AS pct_within_sla
FROM ranked GROUP BY m, n
"""

register(
    QuerySpec(
        "sla_fulfilment_percentiles",
        sla_fulfilment_percentiles,
        SLA_SQL,
        doc="monthly fulfilment p50/p90 by exact row position + SLA compliance rate",
        cites="ops-analytics family; position-selected percentiles, no interpolation",
        tags=("analytics", "window"),
    )
)


# --- discrete churn hazard by tenure month ---------------------------------

CHURN_CUTOFF = "1998-05-01"  # quarter before the corpus end: no orders after = churned


def churn_hazard_by_tenure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn hazard: customers enter at their first order;
    tenure is measured in 90-day periods to their LAST order (censored at
    the cutoff). hazard(t) = churners-at-t / at-risk-at-t, the
    life-table form (Kaplan-Meier's sibling that reads as a per-period
    churn probability). at-risk counts come from a reverse cumulative
    window over the tenure histogram — one orders aggregation, one tiny
    window."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    span = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_o"), F.max("o_orderdate").alias("last_o")
    )
    cutoff = F.to_timestamp(F.lit(CHURN_CUTOFF))
    per_cust = span.select(
        F.expr("CAST(datediff(to_date(last_o), to_date(first_o)) div 90 AS BIGINT)").alias("tenure_p"),
        (F.col("last_o") < cutoff).cast("int").alias("churned"),
    )
    hist = per_cust.groupBy("tenure_p").agg(
        F.count(F.lit(1)).alias("ended_here"),
        F.sum("churned").alias("churned_here"),
    )
    w_risk = Window.orderBy(F.desc("tenure_p")).rowsBetween(Window.unboundedPreceding, 0)
    return (
        hist.select(
            "tenure_p", "churned_here",
            F.sum("ended_here").over(w_risk).alias("at_risk"),
        )
        .select(
            "tenure_p", "churned_here", "at_risk",
            F.round(F.col("churned_here") / F.col("at_risk").cast("double"), 4).alias("hazard"),
        )
        .orderBy("tenure_p")
    )


CHURN_SQL = f"""
WITH span AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_o, MAX(o_orderdate) AS last_o
  FROM orders GROUP BY o_custkey
),
per_cust AS (
  SELECT CAST(date_diff('day', CAST(first_o AS DATE), CAST(last_o AS DATE)) // 90 AS BIGINT)
           AS tenure_p,
         CASE WHEN last_o < TIMESTAMP '{CHURN_CUTOFF}' THEN 1 ELSE 0 END AS churned
  FROM span
),
hist AS (
  SELECT tenure_p, COUNT(*) AS ended_here, CAST(SUM(churned) AS BIGINT) AS churned_here
  FROM per_cust GROUP BY tenure_p
)
SELECT tenure_p, churned_here,
       CAST(SUM(ended_here) OVER (ORDER BY tenure_p DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS at_risk,
       ROUND(churned_here / CAST(SUM(ended_here) OVER (ORDER BY tenure_p DESC
                                                       ROWS UNBOUNDED PRECEDING) AS DOUBLE), 4)
         AS hazard
FROM hist
ORDER BY tenure_p
"""

register(
    QuerySpec(
        "churn_hazard_by_tenure",
        churn_hazard_by_tenure,
        CHURN_SQL,
        doc="discrete life-table churn hazard per 90-day tenure period",
        cites="retention family; kaplan_meier_retention's per-period sibling",
        tags=("analytics", "window", "survival"),
    )
)


# --- duplicate-invoice screen (fraud/ops audit) ----------------------------

DUP_INV_WINDOW_DAYS = 7
DUP_INV_TOP = 20


def duplicate_invoice_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: pairs of orders from the SAME customer
    with the IDENTICAL total (exact cents) within 7 days — the classic
    accounts-payable audit. The self-join is an EQUI-join on
    (custkey, amount_cents) — the date window is a post-filter — so
    candidate volume is bounded by per-(customer, amount) multiplicity,
    never orders². Top pairs by narrowest gap."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.cents") == F.col("b.cents"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
    ).select(
        F.col("a.o_custkey").alias("custkey"),
        F.col("a.o_orderkey").alias("order_1"),
        F.col("b.o_orderkey").alias("order_2"),
        F.col("a.cents").alias("cents"),
        F.abs(F.datediff(F.col("b.o_orderdate"), F.col("a.o_orderdate"))).alias("day_gap"),
    ).where(F.col("day_gap") <= DUP_INV_WINDOW_DAYS)
    w = Window.orderBy("day_gap", "custkey", "order_1", "order_2")
    return (
        pairs.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= DUP_INV_TOP)
        .select("pos", "custkey", "order_1", "order_2", "cents", "day_gap")
    )


DUP_INV_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
pairs AS (
  SELECT a.o_custkey AS custkey, a.o_orderkey AS order_1, b.o_orderkey AS order_2,
         a.cents,
         ABS(date_diff('day', CAST(a.o_orderdate AS DATE), CAST(b.o_orderdate AS DATE)))
           AS day_gap
  FROM o a JOIN o b
    ON a.o_custkey = b.o_custkey AND a.cents = b.cents AND a.o_orderkey < b.o_orderkey
)
SELECT pos, custkey, order_1, order_2, cents, day_gap FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY day_gap, custkey, order_1, order_2) AS pos
  FROM pairs WHERE day_gap <= {DUP_INV_WINDOW_DAYS}
) WHERE pos <= {DUP_INV_TOP}
"""

register(
    QuerySpec(
        "duplicate_invoice_screen",
        duplicate_invoice_screen,
        DUP_INV_SQL,
        doc="same-customer same-amount orders within 7 days (AP audit screen)",
        cites="fraud/ops audit family; equi-join on (customer, exact cents)",
        tags=("analytics", "dq", "join"),
    )
)
