"""Model/experiment evaluation queries: ROC AUC, A/B testing, attribution.

The platform's downstream users score corpora and run experiments; these
queries close the loop with the standard evaluation statistics, each as
one or two aggregation passes and each exactly reproducible:

- **AUC** via the Mann-Whitney rank-sum identity with midrank tie
  handling — ranks are integers, midranks are half-integers, so the
  statistic is an exact rational and the hash is bit-stable.
- **A/B test** arms are assigned by md5 (deterministic, rerun-safe —
  never `rand()`); conversion counts are integers and the z statistic is
  one textually-mirrored expression over them.
- **Linear multi-touch attribution** splits purchase value across
  preceding clicks by *integer* division with the remainder assigned to
  the earliest touch — allocations sum exactly to the purchase amount
  (the money-splitting pattern), so per-touch credit sums stay integers
  end to end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.operators.ordered import with_global_order
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table


def roc_auc_value_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of `value` as a classifier score for event_type='purchase',
    overall and per weekday.

    AUC = (R⁺ - n⁺(n⁺+1)/2) / (n⁺·n⁻) where R⁺ is the positive-class
    midrank sum. Midranks come from one rank() window plus a per-value
    tie count — (2·min_rank + ties - 1)/2 — summed as integer halves, so
    the whole computation is exact until the final division. One
    sort-shuffle on the group key serves the ranking; the aggregate is
    group-sized.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        F.dayofweek("ts").alias("grp"),
        (F.col("event_type") == "purchase").cast("int").alias("pos"),
        # quantize once so both engines rank the identical key (value is
        # already 2-decimal data; the cast is exact)
        F.round(F.col("value") * 100).cast("bigint").alias("score"),
    )
    w = Window.partitionBy("grp").orderBy("score")
    ranked = base.select(
        "grp",
        "pos",
        "score",
        F.rank().over(w).alias("min_rank"),
        F.count(F.lit(1)).over(Window.partitionBy("grp", "score")).alias("ties"),
    )
    # midrank*2 = 2*min_rank + ties - 1 stays integral
    agg = ranked.groupBy("grp").agg(
        F.sum("pos").alias("n_pos"),
        F.sum(F.lit(1) - F.col("pos")).alias("n_neg"),
        F.sum(
            F.col("pos") * (2 * F.col("min_rank") + F.col("ties") - 1)
        ).alias("rank2_pos"),
    )
    auc = (
        F.col("rank2_pos") / 2.0 - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
    ) / (F.col("n_pos") * F.col("n_neg"))
    return agg.select(
        F.col("grp").alias("weekday"),
        "n_pos",
        "n_neg",
        F.round(auc, 6).alias("auc"),
    )


ROC_AUC_SQL = """
WITH base AS (
  SELECT dayofweek(ts) + 1 AS grp,
         CAST(event_type = 'purchase' AS INT) AS pos,
         CAST(ROUND(value * 100) AS BIGINT) AS score
  FROM events
),
ranked AS (
  SELECT grp, pos,
         RANK() OVER (PARTITION BY grp ORDER BY score) AS min_rank,
         COUNT(*) OVER (PARTITION BY grp, score) AS ties
  FROM base
),
agg AS (
  SELECT grp, CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(1 - pos) AS BIGINT) AS n_neg,
         CAST(SUM(pos * (2 * min_rank + ties - 1)) AS BIGINT) AS rank2_pos
  FROM ranked GROUP BY grp
)
SELECT grp AS weekday, n_pos, n_neg,
       ROUND((rank2_pos / 2.0 - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6) AS auc
FROM agg
"""

register(
    QuerySpec(
        "roc_auc_value_purchase",
        roc_auc_value_purchase,
        ROC_AUC_SQL,
        doc="ROC AUC via Mann-Whitney midrank sums (exact rational statistic)",
        cites="model-evaluation family",
        tags=("ml", "evaluation", "window"),
    )
)


def ab_test_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-arm experiment readout: users are hash-assigned (md5 of
    user_id — deterministic under reruns and repartitioning, the same
    rule the sampling operators use), the metric is per-user purchase
    spend, and the output is each arm's mean plus Welch's t statistic.

    Per-user spend is quantized to cents at the event level, so user
    totals and the arm-level Σx, Σx² moments are exact BIGINT sums and
    the t expression — textually mirrored on both sides — sees identical
    inputs. One groupBy(user_id), one tiny per-arm aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    users = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    )
    arms = users.select(
        (F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
         .cast("bigint") % 2).alias("arm"),
        "cents",
    )
    per_arm = arms.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    wide = per_arm.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("arm") == 0, F.col("ss"))).alias("ss0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("arm") == 1, F.col("ss"))).alias("ss1"),
    )
    # sample variance s² = (ss - s²/n) / (n-1); Welch t on the means
    v0 = "((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE)*s0/n0) / (n0 - 1))"
    v1 = "((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n1) / (n1 - 1))"
    denom = f"sqrt({v0}/n0 + {v1}/n1)"
    t = (
        f"CASE WHEN {denom} > 0.0 THEN"
        f" (CAST(s1 AS DOUBLE)/n1 - CAST(s0 AS DOUBLE)/n0) / {denom}"
        " ELSE NULL END"
    )
    return wide.selectExpr(
        "n0",
        "n1",
        "round(CAST(s0 AS DOUBLE)/n0/100.0, 4) AS mean_spend0",
        "round(CAST(s1 AS DOUBLE)/n1/100.0, 4) AS mean_spend1",
        f"round({t}, 4) AS t_welch",
    )


def _ab_sql() -> str:
    v0 = "((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE)*s0/n0) / (n0 - 1))"
    v1 = "((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n1) / (n1 - 1))"
    denom = f"sqrt({v0}/n0 + {v1}/n1)"
    t = (
        f"CASE WHEN {denom} > 0.0 THEN"
        f" (CAST(s1 AS DOUBLE)/n1 - CAST(s0 AS DOUBLE)/n0) / {denom}"
        " ELSE NULL END"
    )
    return f"""
WITH users AS (
  SELECT user_id, SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
arms AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm,
         cents
  FROM users
),
per_arm AS (
  SELECT arm, COUNT(*) AS n, SUM(cents) AS s, SUM(cents * cents) AS ss
  FROM arms GROUP BY arm
),
wide AS (
  SELECT CAST(MAX(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n0,
         CAST(MAX(CASE WHEN arm = 0 THEN s END) AS BIGINT) AS s0,
         CAST(MAX(CASE WHEN arm = 0 THEN ss END) AS BIGINT) AS ss0,
         CAST(MAX(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n1,
         CAST(MAX(CASE WHEN arm = 1 THEN s END) AS BIGINT) AS s1,
         CAST(MAX(CASE WHEN arm = 1 THEN ss END) AS BIGINT) AS ss1
  FROM per_arm
)
SELECT n0, n1,
       ROUND(CAST(s0 AS DOUBLE)/n0/100.0, 4) AS mean_spend0,
       ROUND(CAST(s1 AS DOUBLE)/n1/100.0, 4) AS mean_spend1,
       ROUND({t}, 4) AS t_welch
FROM wide
"""


register(
    QuerySpec(
        "ab_test_spend",
        ab_test_spend,
        _ab_sql(),
        doc="hash-assigned A/B arms with Welch's t on per-user spend (exact integer moments)",
        cites="experimentation family; md5 assignment matches the sampling operators",
        tags=("ml", "statistics"),
    )
)


ATTR_WINDOW_HOURS = 24


def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch linear attribution: each purchase's value (in cents)
    is split across the same user's clicks in the preceding 24 h; the
    integer remainder goes to the EARLIEST touch so allocations sum
    exactly to the purchase amount. Credit is aggregated per click-hour.

    The purchase⋈click pairing is a user-keyed range join (equi on
    user_id + time-band predicate) — one shuffle on a high-cardinality
    key; everything after is integer arithmetic, which is what makes a
    fractional-allocation query hashable at all.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("purchase_id"),
        us.alias("p_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("click_id"),
        us.alias("c_us"),
    )
    span = ATTR_WINDOW_HOURS * 3_600_000_000
    touched = purchases.join(
        clicks,
        (purchases.u == clicks.u)
        & (F.col("c_us") <= F.col("p_us"))
        & (F.col("c_us") > F.col("p_us") - span),
    ).select("purchase_id", "cents", "click_id", "c_us")
    w_cnt = Window.partitionBy("purchase_id")
    w_first = Window.partitionBy("purchase_id").orderBy("c_us", "click_id")
    n_touch = F.count(F.lit(1)).over(w_cnt)
    alloc = touched.select(
        "click_id",
        "c_us",
        "cents",
        n_touch.alias("nt"),
        (F.row_number().over(w_first) == 1).cast("int").alias("is_first"),
    ).select(
        "click_id",
        "c_us",
        (
            F.expr("cents div nt") + F.expr("cents % nt") * F.col("is_first")
        ).alias("credit_cents"),
    )
    return (
        alloc.groupBy(F.date_trunc("hour", F.timestamp_micros("c_us")).alias("click_hour"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("credit_cents").alias("credit_cents"),
        )
    )


ATTRIBUTION_SQL = f"""
WITH purchases AS (
  SELECT user_id AS u, event_id AS purchase_id, epoch_us(ts) AS p_us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id AS u, event_id AS click_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
),
touched AS (
  SELECT p.purchase_id, p.cents, c.click_id, c.c_us
  FROM purchases p JOIN clicks c
    ON p.u = c.u AND c.c_us <= p.p_us
   AND c.c_us > p.p_us - {ATTR_WINDOW_HOURS} * 3600000000
),
alloc AS (
  SELECT click_id, c_us,
         cents // COUNT(*) OVER (PARTITION BY purchase_id)
         + (cents % COUNT(*) OVER (PARTITION BY purchase_id))
           * CASE WHEN ROW_NUMBER() OVER (PARTITION BY purchase_id ORDER BY c_us, click_id) = 1
                  THEN 1 ELSE 0 END AS credit_cents
  FROM touched
)
SELECT date_trunc('hour', make_timestamp(c_us)) AS click_hour,
       COUNT(*) AS n_touches,
       CAST(SUM(credit_cents) AS BIGINT) AS credit_cents
FROM alloc
GROUP BY date_trunc('hour', make_timestamp(c_us))
"""

register(
    QuerySpec(
        "linear_attribution",
        linear_attribution,
        ATTRIBUTION_SQL,
        doc="multi-touch linear attribution with exact integer allocation (remainder to first touch)",
        cites="marketing-analytics family; range-join + money-splitting pattern",
        tags=("analytics", "join", "window"),
    )
)


def next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the first-order Markov next-event model: transitions
    trained on 80% of users (md5 bucket) predict the held-out users' next
    event as argmax P(to|from); output per-from accuracy.

    Train is one |types|²-row aggregate; evaluation joins the held-out
    transition pairs (one lead() window) against the broadcast model.
    Counts are integers so the argmax (count desc, type asc) and the
    accuracy ratio are engine-exact.
    """
    e = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 5
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        bucket.alias("b"),
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = (
        seq.where(F.col("b") != 0)
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_best = Window.partitionBy("from_type").orderBy(F.desc("n"), "to_type")
    model = (
        counts.withColumn("rn", F.row_number().over(w_best))
        .where(F.col("rn") == 1)
        .select("from_type", F.col("to_type").alias("predicted"))
    )
    test = seq.where(F.col("b") == 0)
    return (
        test.join(F.broadcast(model), "from_type")
        .groupBy("from_type")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum((F.col("to_type") == F.col("predicted")).cast("int")).alias("n_correct"),
        )
        .select(
            "from_type",
            "n_transitions",
            "n_correct",
            F.round(F.col("n_correct") / F.col("n_transitions"), 6).alias("accuracy"),
        )
    )


NEXT_EVENT_SQL = """
WITH seq AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 5 AS b,
         event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
),
pairs AS (SELECT * FROM seq WHERE to_type IS NOT NULL),
counts AS (
  SELECT from_type, to_type, COUNT(*) AS n FROM pairs WHERE b <> 0
  GROUP BY from_type, to_type
),
model AS (
  SELECT from_type, to_type AS predicted FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY from_type ORDER BY n DESC, to_type) AS rn
    FROM counts
  ) WHERE rn = 1
)
SELECT p.from_type, COUNT(*) AS n_transitions,
       CAST(SUM(CAST(p.to_type = m.predicted AS INT)) AS BIGINT) AS n_correct,
       ROUND(CAST(SUM(CAST(p.to_type = m.predicted AS INT)) AS DOUBLE) / COUNT(*), 6) AS accuracy
FROM pairs p JOIN model m ON p.from_type = m.from_type
WHERE p.b = 0
GROUP BY p.from_type
"""

register(
    QuerySpec(
        "next_event_accuracy",
        next_event_accuracy,
        NEXT_EVENT_SQL,
        doc="Markov next-event model backtest on held-out users (per-state accuracy)",
        cites="sequence-model evaluation; pairs with event_transition_matrix",
        tags=("ml", "evaluation", "window"),
    )
)


def ltv_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative lifetime value per signup cohort: users cohorted by the
    epoch-week of their first event, purchase cents accumulated over
    weeks-since-signup. Epoch-week integer division sidesteps ISO-week /
    timezone semantics entirely; cents cumsums are exact.

    One groupBy(user_id) for cohorts, one join back (user-keyed), one
    bounded |cohorts × weeks| aggregate with an ordered cumsum window.
    """
    e = load_table(spark, sf_dir, "events")
    week_us = 7 * 86_400_000_000
    firsts = e.groupBy("user_id").agg(
        F.expr(f"min(unix_micros(ts)) div {week_us}").alias("cohort_week")
    )
    spend = (
        e.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr(f"unix_micros(ts) div {week_us}").alias("wk"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .join(firsts, "user_id")
        .groupBy("cohort_week", (F.col("wk") - F.col("cohort_week")).alias("weeks_since"))
        .agg(F.sum("cents").alias("cents"))
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_users"))
    w_cum = (
        Window.partitionBy("cohort_week")
        .orderBy("weeks_since")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spend.withColumn("cum_cents", F.sum("cents").over(w_cum))
        .join(F.broadcast(sizes), "cohort_week")
        .select("cohort_week", "weeks_since", "n_users", "cents", "cum_cents")
    )


LTV_SQL = """
WITH firsts AS (
  SELECT user_id, MIN(epoch_us(ts)) // 604800000000 AS cohort_week
  FROM events GROUP BY user_id
),
spend AS (
  SELECT f.cohort_week,
         epoch_us(e.ts) // 604800000000 - f.cohort_week AS weeks_since,
         SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS cents
  FROM events e JOIN firsts f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
),
sizes AS (SELECT cohort_week, COUNT(*) AS n_users FROM firsts GROUP BY cohort_week)
SELECT s.cohort_week, s.weeks_since, z.n_users, CAST(s.cents AS BIGINT) AS cents,
       CAST(SUM(s.cents) OVER (PARTITION BY s.cohort_week ORDER BY s.weeks_since
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
FROM spend s JOIN sizes z ON s.cohort_week = z.cohort_week
"""

register(
    QuerySpec(
        "ltv_cohort_curve",
        ltv_cohort_curve,
        LTV_SQL,
        doc="cumulative LTV per epoch-week signup cohort (exact cent cumsums)",
        cites="business-analytics family; pairs with cohort_retention",
        tags=("analytics", "window"),
    )
)


# ---- CUPED variance reduction + difference-in-differences ------------------

_SPLIT_TS = "2024-01-16 00:00:00"


def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B readout: per-user PRE-period spend is the
    covariate, POST-period spend the metric; the adjusted metric
    y − θ(x − x̄) removes the variance that pre-existing behavior
    explains (θ = cov(x,y)/var(x)).

    Everything is moment algebra over exact BIGINT sums (n, Σx, Σy, Σx²,
    Σy², Σxy per arm): θ clears denominators to a ratio of two integer
    expressions, the adjusted means/variances expand algebraically —
    NO per-row float adjustment ever happens, so there is no float-sum
    reassociation and the result hash-matches. One groupBy(user_id), one
    per-arm aggregate, one scalar combine: the ab_test_spend shuffle
    shape with a covariate riding along.
    """
    e = load_table(spark, sf_dir, "events")
    users = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("ts") < F.lit(_SPLIT_TS).cast("timestamp"),
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(F.lit(0))
            ).alias("x"),
            F.sum(
                F.when(
                    F.col("ts") >= F.lit(_SPLIT_TS).cast("timestamp"),
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(F.lit(0))
            ).alias("y"),
        )
    )
    arms = users.select(
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 2
        ).alias("arm"),
        "x",
        "y",
    )
    per_arm = arms.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    tot = per_arm.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
    )
    j = per_arm.crossJoin(F.broadcast(tot))
    theta = (
        "(CAST(tn * tsxy - tsx * tsy AS DOUBLE) / CAST(tn * tsxx - tsx * tsx AS DOUBLE))"
    )
    mean_adj = (
        f"(CAST(sy AS DOUBLE)/n - {theta} * (CAST(sx AS DOUBLE)/n - CAST(tsx AS DOUBLE)/tn))"
    )
    var_y = "((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*sy/n) / (n - 1))"
    var_x = "((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n) / (n - 1))"
    cov_xy = "((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n) / (n - 1))"
    var_adj = f"({var_y} - 2*{theta}*{cov_xy} + {theta}*{theta}*{var_x})"
    return j.selectExpr(
        "arm",
        "n",
        "round(CAST(sy AS DOUBLE)/n/100.0, 4) AS mean_post",
        f"round({mean_adj}/100.0, 4) AS mean_cuped",
        f"round((1.0 - {var_adj}/{var_y}) * 100.0, 2) AS var_reduction_pct",
    ).orderBy("arm")


def _cuped_sql() -> str:
    theta = (
        "(CAST(tn * tsxy - tsx * tsy AS DOUBLE) / CAST(tn * tsxx - tsx * tsx AS DOUBLE))"
    )
    mean_adj = (
        f"(CAST(sy AS DOUBLE)/n - {theta} * (CAST(sx AS DOUBLE)/n - CAST(tsx AS DOUBLE)/tn))"
    )
    var_y = "((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*sy/n) / (n - 1))"
    var_x = "((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*sx/n) / (n - 1))"
    cov_xy = "((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*sy/n) / (n - 1))"
    var_adj = f"({var_y} - 2*{theta}*{cov_xy} + {theta}*{theta}*{var_x})"
    return f"""
WITH users AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{_SPLIT_TS}'
                       THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_SPLIT_TS}'
                       THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
arms AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm, x, y
  FROM users
),
per_arm AS (
  SELECT arm, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM arms GROUP BY arm
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(sx) AS BIGINT) AS tsx,
         CAST(SUM(sy) AS BIGINT) AS tsy, CAST(SUM(sxx) AS BIGINT) AS tsxx,
         CAST(SUM(sxy) AS BIGINT) AS tsxy
  FROM per_arm
)
SELECT arm, n,
       ROUND(CAST(sy AS DOUBLE)/n/100.0, 4) AS mean_post,
       ROUND({mean_adj}/100.0, 4) AS mean_cuped,
       ROUND((1.0 - {var_adj}/{var_y}) * 100.0, 2) AS var_reduction_pct
FROM per_arm, tot
ORDER BY arm
"""


register(
    QuerySpec(
        "cuped_adjusted_ab",
        cuped_adjusted_ab,
        _cuped_sql(),
        doc="CUPED variance-reduced A/B means via pure moment algebra (no per-row adjustment)",
        cites="experimentation family; extends ab_test_spend with a pre-period covariate",
        tags=("eval", "experimentation", "stats"),
    )
)


def did_spend_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: arm 1 relative to arm 0, post-period
    relative to pre-period — the causal-effect template when assignment
    correlates with level. Four cell means from ONE conditional-agg pass
    over exact cent sums; the DiD point estimate is pure arithmetic on
    those four means."""
    e = load_table(spark, sf_dir, "events")
    cells = e.where(F.col("event_type") == "purchase").select(
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 2
        ).alias("arm"),
        (F.col("ts") >= F.lit(_SPLIT_TS).cast("timestamp")).cast("int").alias("post"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    wide = cells.agg(
        *[
            F.sum(
                F.when((F.col("arm") == a) & (F.col("post") == p), F.col("cents")).otherwise(
                    F.lit(0)
                )
            ).alias(f"s{a}{p}")
            for a in (0, 1)
            for p in (0, 1)
        ],
        *[
            F.sum(
                F.when((F.col("arm") == a) & (F.col("post") == p), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"n{a}{p}")
            for a in (0, 1)
            for p in (0, 1)
        ],
    )
    m = {f"m{a}{p}": f"(CAST(s{a}{p} AS DOUBLE)/n{a}{p}/100.0)" for a in (0, 1) for p in (0, 1)}
    did = f"(({m['m11']} - {m['m10']}) - ({m['m01']} - {m['m00']}))"
    return wide.selectExpr(
        "n00", "n01", "n10", "n11",
        f"round({m['m00']}, 4) AS mean_ctrl_pre",
        f"round({m['m01']}, 4) AS mean_ctrl_post",
        f"round({m['m10']}, 4) AS mean_treat_pre",
        f"round({m['m11']}, 4) AS mean_treat_post",
        f"round({did}, 4) AS did_estimate",
    )


def _did_sql() -> str:
    m = {f"m{a}{p}": f"(CAST(s{a}{p} AS DOUBLE)/n{a}{p}/100.0)" for a in (0, 1) for p in (0, 1)}
    did = f"(({m['m11']} - {m['m10']}) - ({m['m01']} - {m['m00']}))"
    sums = ", ".join(
        f"CAST(SUM(CASE WHEN arm = {a} AND post = {p} THEN cents ELSE 0 END) AS BIGINT) AS s{a}{p}"
        for a in (0, 1) for p in (0, 1)
    )
    counts = ", ".join(
        f"CAST(SUM(CASE WHEN arm = {a} AND post = {p} THEN 1 ELSE 0 END) AS BIGINT) AS n{a}{p}"
        for a in (0, 1) for p in (0, 1)
    )
    return f"""
WITH cells AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm,
         CASE WHEN ts >= TIMESTAMP '{_SPLIT_TS}' THEN 1 ELSE 0 END AS post,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
wide AS (SELECT {sums}, {counts} FROM cells)
SELECT n00, n01, n10, n11,
       ROUND({m['m00']}, 4) AS mean_ctrl_pre,
       ROUND({m['m01']}, 4) AS mean_ctrl_post,
       ROUND({m['m10']}, 4) AS mean_treat_pre,
       ROUND({m['m11']}, 4) AS mean_treat_post,
       ROUND({did}, 4) AS did_estimate
FROM wide
"""


register(
    QuerySpec(
        "did_spend_effect",
        did_spend_effect,
        _did_sql(),
        doc="difference-in-differences from one conditional-agg pass over exact cent cells",
        cites="causal-inference twin of ab_test_spend",
        tags=("eval", "experimentation", "causal"),
    )
)


def stratified_effect_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (post-stratification) treatment-effect estimate: users
    are md5-assigned to arms, stratified into PRE-period spend quintiles
    (integer-position cuts over ALL users), and the effect is the
    stratum-weighted mean difference — the estimator that removes
    covariate imbalance a plain difference of means keeps.

    Per-stratum rows carry exact integer cell sums; each stratum effect
    is one double expression; the weighted combination uses fixed
    textual order over the 5 strata (the Hurst pivot idiom) so nothing
    reassociates. Output = per-stratum effects + the combined estimate.
    """
    e = load_table(spark, sf_dir, "events")
    users = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("ts") < F.lit(_SPLIT_TS).cast("timestamp"),
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(F.lit(0))
            ).alias("x"),
            F.sum(
                F.when(
                    F.col("ts") >= F.lit(_SPLIT_TS).cast("timestamp"),
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(F.lit(0))
            ).alias("y"),
        )
    )
    # distributed global rank over |users| (operators/ordered.py) — the
    # quintile cut positions need a total order but not a global window
    n_tot = users.agg(F.count(F.lit(1)).alias("_n"))
    strat = (
        with_global_order(users, "x", tiebreaks=["user_id"], rank_col="_rn")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "user_id",
            "x",
            "y",
            (
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
                .cast("bigint")
                % 2
            ).alias("arm"),
            F.expr("CAST(ceil(_rn * 5 / _n) AS BIGINT)").alias("stratum"),
        )
    )
    cells = strat.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.expr("IF(arm = 0, 1, 0)")).alias("n0"),
        F.sum(F.expr("IF(arm = 0, y, 0)")).alias("s0"),
        F.sum(F.expr("IF(arm = 1, 1, 0)")).alias("n1"),
        F.sum(F.expr("IF(arm = 1, y, 0)")).alias("s1"),
    ).where((F.col("n0") > 0) & (F.col("n1") > 0))
    eff = cells.selectExpr(
        "stratum",
        "n_users",
        "round((CAST(s1 AS DOUBLE)/n1 - CAST(s0 AS DOUBLE)/n0)/100.0, 4) AS stratum_effect",
    )
    piv = cells.agg(
        *[
            F.max(F.when(F.col("stratum") == k, F.col(c))).alias(f"{c}_{k}")
            for k in range(1, 6)
            for c in ("n_users", "n0", "s0", "n1", "s1")
        ]
    )
    terms = " + ".join(
        f"CAST(n_users_{k} AS DOUBLE) * "
        f"(CAST(s1_{k} AS DOUBLE)/n1_{k} - CAST(s0_{k} AS DOUBLE)/n0_{k})"
        for k in range(1, 6)
    )
    tot = " + ".join(f"CAST(n_users_{k} AS DOUBLE)" for k in range(1, 6))
    combined = piv.selectExpr(
        "CAST(0 AS BIGINT) AS stratum",
        f"CAST({tot} AS BIGINT) AS n_users",
        f"round(({terms}) / ({tot}) / 100.0, 4) AS stratum_effect",
    )
    return eff.unionByName(combined).orderBy("stratum")


def _stratified_sql() -> str:
    terms = " + ".join(
        f"CAST(n_users_{k} AS DOUBLE) * "
        f"(CAST(s1_{k} AS DOUBLE)/n1_{k} - CAST(s0_{k} AS DOUBLE)/n0_{k})"
        for k in range(1, 6)
    )
    tot = " + ".join(f"CAST(n_users_{k} AS DOUBLE)" for k in range(1, 6))
    piv_cols = ",\n         ".join(
        f"MAX(CASE WHEN stratum = {k} THEN {c} END) AS {c}_{k}"
        for k in range(1, 6)
        for c in ("n_users", "n0", "s0", "n1", "s1")
    )
    return f"""
WITH users AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '{_SPLIT_TS}'
                       THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_SPLIT_TS}'
                       THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
strat AS (
  SELECT user_id, x, y,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm,
         CAST(CEIL(ROW_NUMBER() OVER (ORDER BY x, user_id) * 5.0
              / COUNT(*) OVER ()) AS BIGINT) AS stratum
  FROM users
),
cells AS (
  SELECT stratum, COUNT(*) AS n_users,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS s0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS s1
  FROM strat GROUP BY 1
  HAVING SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) > 0
     AND SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) > 0
),
eff AS (
  SELECT stratum, n_users,
         ROUND((CAST(s1 AS DOUBLE)/n1 - CAST(s0 AS DOUBLE)/n0)/100.0, 4) AS stratum_effect
  FROM cells
),
piv AS (
  SELECT {piv_cols}
  FROM cells
),
combined AS (
  SELECT CAST(0 AS BIGINT) AS stratum,
         CAST({tot} AS BIGINT) AS n_users,
         ROUND(({terms}) / ({tot}) / 100.0, 4) AS stratum_effect
  FROM piv
)
SELECT * FROM eff UNION ALL SELECT * FROM combined ORDER BY stratum
"""


register(
    QuerySpec(
        "stratified_effect_spend",
        stratified_effect_spend,
        _stratified_sql(),
        doc="post-stratified treatment effect: quintile strata on pre-spend, fixed-order weighting",
        cites="causal family with did_spend_effect/cuped_adjusted_ab",
        tags=("eval", "experimentation", "causal"),
    )
)


# --- offline bandit policy evaluation by replay ----------------------------

_ARMS = ["click", "error", "purchase", "signup", "view"]  # sorted event types


def bandit_replay_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline policy evaluation by REPLAY (Li et al., WSDM'11): treat each
    event as a logged (context, arm, reward) pull — arm = event_type,
    reward = value — and score three candidate policies on exactly the
    pulls where the policy's choice matches the logged arm (an unbiased
    estimate when logging is uniform). Policies are pure context
    functions: a constant arm, a user-hash arm, and an md5 ε-greedy mix —
    all engine-exact md5 arithmetic, so both engines replay the identical
    subset.

    One scan computes every policy's choice as a projection; the replay
    filter + per-policy aggregate is a single unpivoted groupBy. No
    per-policy passes, no driver loop."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    arm_arr = F.array(*[F.lit(a) for a in _ARMS])
    h_user = F.conv(F.substring(F.md5(F.concat(F.lit("arm:"), F.col("user_id").cast("string"))), 1, 8), 16, 10).cast("bigint")
    h_eps = F.conv(F.substring(F.md5(F.concat(F.lit("eps:"), F.col("event_id").cast("string"))), 1, 8), 16, 10).cast("bigint")
    pol_constant = F.lit("view")
    pol_userhash = F.element_at(arm_arr, (h_user % 5 + 1).cast("int"))
    pol_eps = F.when(h_eps % 10 == 0, F.element_at(arm_arr, (h_eps % 5 + 1).cast("int"))).otherwise(F.lit("view"))
    tagged = e.select(
        "event_type", "value",
        F.explode(
            F.array(
                F.struct(F.lit("constant_view").alias("policy"), pol_constant.alias("chosen")),
                F.struct(F.lit("user_hash").alias("policy"), pol_userhash.alias("chosen")),
                F.struct(F.lit("eps_greedy_10").alias("policy"), pol_eps.alias("chosen")),
            )
        ).alias("p"),
    ).select("event_type", "value", "p.policy", "p.chosen")
    matched = tagged.where(F.col("chosen") == F.col("event_type"))
    from analytics_data_platform_spark.queries.exact import sum_money
    return matched.groupBy("policy").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.round(sum_money("value") / F.count(F.lit(1)), 4).alias("est_reward"),
    )


BANDIT_SQL = """
WITH e AS (SELECT event_id, user_id, event_type, value FROM events),
arms(i, arm) AS (VALUES (0, 'click'), (1, 'error'), (2, 'purchase'), (3, 'signup'), (4, 'view')),
scored AS (
  SELECT event_type, value,
         ('0x' || substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 5 AS iu,
         ('0x' || substr(md5('eps:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS he
  FROM e
),
tagged AS (
  SELECT event_type, value, 'constant_view' AS policy, 'view' AS chosen FROM scored
  UNION ALL
  SELECT s.event_type, s.value, 'user_hash', a.arm FROM scored s JOIN arms a ON a.i = s.iu
  UNION ALL
  SELECT s.event_type, s.value, 'eps_greedy_10',
         CASE WHEN s.he % 10 = 0 THEN a.arm ELSE 'view' END
  FROM scored s JOIN arms a ON a.i = s.he % 5
)
SELECT policy, COUNT(*) AS n_matched,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS est_reward
FROM tagged WHERE chosen = event_type
GROUP BY policy
"""

register(
    QuerySpec(
        "bandit_replay_eval",
        bandit_replay_eval,
        BANDIT_SQL,
        doc="offline bandit policy evaluation by replay over logged events",
        cites="experimentation family; unbiased replay estimator, md5-deterministic policies",
        tags=("eval", "experiment"),
    )
)


# --- time-decay multi-touch attribution (dyadic weights, exact split) ------


def time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution: clicks in the 24 h before a purchase share
    its value with weight halving every 6 h — recent touches earn more.
    Weights are DYADIC integers (8 >> (hours-before div 6) ∈ {8,4,2,1}),
    so the split is exact integer arithmetic: credit = cents·w div Σw,
    remainder to the most recent touch. No float pow — cross-engine libm
    differences can flip a hash even when the math is 'the same formula'.

    Same one-shuffle user-keyed range join as linear_attribution; only
    the weighting differs."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("purchase_id"),
        us.alias("p_us"), F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("click_id"), us.alias("c_us"),
    )
    span = ATTR_WINDOW_HOURS * 3_600_000_000
    touched = purchases.join(
        clicks,
        (purchases.u == clicks.u)
        & (F.col("c_us") <= F.col("p_us"))
        & (F.col("c_us") > F.col("p_us") - span),
    ).select(
        "purchase_id", "cents", "click_id", "c_us",
        F.expr("shiftright(8, CAST((p_us - c_us) div 21600000000 AS INT))").cast("bigint").alias("w"),
    )
    w_p = Window.partitionBy("purchase_id")
    w_recent = Window.partitionBy("purchase_id").orderBy(F.desc("c_us"), "click_id")
    alloc = touched.select(
        "purchase_id", "click_id", "c_us", "cents",
        F.sum("w").over(w_p).alias("sw"),
        (F.row_number().over(w_recent) == 1).cast("int").alias("is_recent"),
        "w",
    ).withColumn("base_credit", F.expr("(cents * w) div sw"))
    # remainder = cents - Σ base over the purchase, paid to the most recent
    rem = F.col("cents") - F.sum("base_credit").over(w_p)
    final = alloc.select(
        "click_id", "c_us",
        (F.col("base_credit") + rem * F.col("is_recent")).alias("credit_cents"),
    )
    return (
        final.groupBy(F.date_trunc("hour", F.timestamp_micros("c_us")).alias("click_hour"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("credit_cents").alias("credit_cents"),
        )
    )


TIME_DECAY_SQL = f"""
WITH purchases AS (
  SELECT user_id AS u, event_id AS purchase_id, epoch_us(ts) AS p_us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id AS u, event_id AS click_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
),
touched AS (
  SELECT p.purchase_id, p.cents, c.click_id, c.c_us,
         CAST(8 // power(2, CAST((p.p_us - c.c_us) // 21600000000 AS INT)) AS BIGINT) AS w
  FROM purchases p JOIN clicks c
    ON p.u = c.u AND c.c_us <= p.p_us
   AND c.c_us > p.p_us - {ATTR_WINDOW_HOURS} * 3600000000
),
alloc AS (
  SELECT click_id, c_us, purchase_id, cents, w,
         (cents * w) // SUM(w) OVER (PARTITION BY purchase_id) AS base_credit,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY purchase_id ORDER BY c_us DESC, click_id) = 1
              THEN 1 ELSE 0 END AS is_recent
  FROM touched
),
final AS (
  SELECT click_id, c_us,
         base_credit + (cents - SUM(base_credit) OVER (PARTITION BY purchase_id)) * is_recent
           AS credit_cents
  FROM alloc
)
SELECT date_trunc('hour', make_timestamp(c_us)) AS click_hour,
       COUNT(*) AS n_touches,
       CAST(SUM(credit_cents) AS BIGINT) AS credit_cents
FROM final
GROUP BY 1
"""

register(
    QuerySpec(
        "time_decay_attribution",
        time_decay_attribution,
        TIME_DECAY_SQL,
        doc="time-decay multi-touch attribution with exact dyadic-integer splits",
        cites="marketing-analytics family; dyadic weights avoid cross-engine pow",
        tags=("analytics", "join", "window"),
    )
)


# --- sample-ratio-mismatch (SRM) guardrail ---------------------------------


def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the md5 A/B assignment: with a
    50/50 split, chi-square for two cells reduces to (a−b)²/n; flag when
    it exceeds the 3.84 critical value (p<0.05, df=1). SRM is the first
    validity check every experimentation platform runs — a biased
    assignment invalidates every downstream readout. Pure integer counts
    from one aggregation; the statistic is one exact-integer ratio."""
    c = load_table(spark, sf_dir, "customer")
    arm = F.conv(F.substring(F.md5(F.concat(F.lit("ab:"), F.col("c_custkey").cast("string"))), 1, 8), 16, 10).cast("bigint") % 2
    counts = c.select(arm.alias("arm")).groupBy().agg(
        F.sum((F.col("arm") == 0).cast("bigint")).alias("n_a"),
        F.sum((F.col("arm") == 1).cast("bigint")).alias("n_b"),
    )
    chi2 = (
        (F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))
    ).cast("double") / (F.col("n_a") + F.col("n_b")).cast("double")
    return counts.select(
        "n_a", "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_detected"),
    )


SRM_SQL = """
WITH counts AS (
  SELECT
    CAST(SUM(CASE WHEN ('0x' || substr(md5('ab:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN ('0x' || substr(md5('ab:' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 2 = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM customer
)
SELECT n_a, n_b,
       ROUND(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / CAST(n_a + n_b AS DOUBLE), 6) AS chi2,
       CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) > 3.841 AS srm_detected
FROM counts
"""

register(
    QuerySpec(
        "ab_srm_check",
        ab_srm_check,
        SRM_SQL,
        doc="sample-ratio-mismatch chi-square guardrail for the md5 A/B split",
        cites="experimentation family; validity gate before any readout",
        tags=("eval", "experiment"),
    )
)

