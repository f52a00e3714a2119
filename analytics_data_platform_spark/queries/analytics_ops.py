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
