"""Distributed classifiers as DataFrame plans: logistic regression
(IRLS), decision stump, k-means separation quality, kNN, and the
in-engine NB language classifier evaluation.

Split out of ml_ops.py purely to keep query modules under the
1,500-line hygiene bound; every query keeps its name, oracle, and tags,
and the shared quantized-k-means helpers stay in ml_ops (single source
for the bit-stability constants). See ml_ops.py's module docstring for
the integer-quantization strategy that makes iterative ML oracle-able.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.operators.ordered import with_global_order
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.queries.ml_ops import (
    IRLS_ROUNDS,
    KM_ITERS,
    KM_K,
    _W_FLOOR,
    _Z_CLAMP,
    _cramer_exprs,
    _km_quantize,
    kmeans_embeddings,
)
from analytics_data_platform_spark.sources.testdata import load_table


def logistic_purchase_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression P(event is a purchase | value, hour) trained by
    2 fixed IRLS rounds, fully distributed.

    Each round is ONE aggregation pass: with the current coefficients
    attached as a broadcast 1-row table, every event contributes its
    weighted moments (w = p(1-p), working response z + (y-p)/w), and the
    3×3 weighted normal equations solve in the projection via the same
    mirrored Cramer expressions the OLS family uses — no driver-side
    math, no collect. z is clamped to ±30 and w floored at 1e-6 in both
    engines so saturated rows cannot divide by zero. Rounds are fixed so
    the oracle unrolls them; float sums cross engines agree to ~1e-15
    relative, far inside the round-4 output quantum.
    """
    e = load_table(spark, sf_dir, "events")
    feats = e.select(
        (F.col("event_type") == "purchase").cast("double").alias("y"),
        F.col("value").alias("x1"),
        F.hour("ts").cast("double").alias("x2"),
    )
    b = spark.range(1).select(
        F.lit(0.0).alias("b0"), F.lit(0.0).alias("b1"), F.lit(0.0).alias("b2")
    )
    b0c, b1c, b2c = _cramer_exprs("m_")
    for _ in range(IRLS_ROUNDS):
        z = F.greatest(
            F.lit(-_Z_CLAMP),
            F.least(
                F.lit(_Z_CLAMP),
                F.col("b0") + F.col("b1") * F.col("x1") + F.col("b2") * F.col("x2"),
            ),
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        w = F.greatest(F.lit(_W_FLOOR), p * (F.lit(1.0) - p))
        u = z + (F.col("y") - p) / w
        m = (
            feats.crossJoin(F.broadcast(b))
            .select("x1", "x2", w.alias("w"), u.alias("u"))
            .agg(
                F.sum("w").alias("m_n"),
                F.sum(F.col("w") * F.col("x1")).alias("m_s1"),
                F.sum(F.col("w") * F.col("x2")).alias("m_s2"),
                F.sum(F.col("w") * F.col("u")).alias("m_sy"),
                F.sum(F.col("w") * F.col("x1") * F.col("x1")).alias("m_s11"),
                F.sum(F.col("w") * F.col("x1") * F.col("x2")).alias("m_s12"),
                F.sum(F.col("w") * F.col("x2") * F.col("x2")).alias("m_s22"),
                F.sum(F.col("w") * F.col("x1") * F.col("u")).alias("m_s1y"),
                F.sum(F.col("w") * F.col("x2") * F.col("u")).alias("m_s2y"),
            )
        )
        b = m.selectExpr(
            f"{b0c} AS b0", f"{b1c} AS b1", f"{b2c} AS b2"
        )
    z = F.greatest(
        F.lit(-_Z_CLAMP),
        F.least(
            F.lit(_Z_CLAMP),
            F.col("b0") + F.col("b1") * F.col("x1") + F.col("b2") * F.col("x2"),
        ),
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    scored = feats.crossJoin(F.broadcast(b))
    return scored.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.first("b0"), 4).alias("b0"),
        F.round(F.first("b1"), 4).alias("b1"),
        F.round(F.first("b2"), 4).alias("b2"),
        F.round(
            F.avg(F.when((p >= 0.5) == (F.col("y") == 1.0), 1.0).otherwise(0.0)), 4
        ).alias("train_accuracy"),
    )


def _logistic_sql() -> str:
    b0c, b1c, b2c = _cramer_exprs("m_")

    def z_expr(bsrc: str) -> str:
        return (
            f"GREATEST(-{_Z_CLAMP}, LEAST({_Z_CLAMP},"
            f" {bsrc}.b0 + {bsrc}.b1 * f.x1 + {bsrc}.b2 * f.x2))"
        )

    rounds = [
        """WITH feats AS (
  SELECT CAST(event_type = 'purchase' AS DOUBLE) AS y,
         value AS x1,
         CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS x2
  FROM events
),
b0_t AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)"""
    ]
    for i in range(1, IRLS_ROUNDS + 1):
        z = z_expr(f"b{i - 1}_t")
        rounds.append(
            f""",
m{i} AS (
  SELECT SUM(w) AS m_n, SUM(w*x1) AS m_s1, SUM(w*x2) AS m_s2, SUM(w*u) AS m_sy,
         SUM(w*x1*x1) AS m_s11, SUM(w*x1*x2) AS m_s12, SUM(w*x2*x2) AS m_s22,
         SUM(w*x1*u) AS m_s1y, SUM(w*x2*u) AS m_s2y
  FROM (
    SELECT f.x1, f.x2,
           GREATEST({_W_FLOOR}, pp * (1.0 - pp)) AS w,
           zz + (f.y - pp) / GREATEST({_W_FLOOR}, pp * (1.0 - pp)) AS u
    FROM (
      SELECT f.x1, f.x2, f.y, {z} AS zz,
             1.0 / (1.0 + EXP(-({z}))) AS pp
      FROM feats f CROSS JOIN b{i - 1}_t
    ) f
  )
),
b{i}_t AS (SELECT {b0c} AS b0, {b1c} AS b1, {b2c} AS b2 FROM m{i})"""
        )
    zf = z_expr("b")
    rounds.append(
        f"""
SELECT COUNT(*) AS n_events,
       ROUND(ANY_VALUE(b.b0), 4) AS b0,
       ROUND(ANY_VALUE(b.b1), 4) AS b1,
       ROUND(ANY_VALUE(b.b2), 4) AS b2,
       ROUND(AVG(CASE WHEN (1.0 / (1.0 + EXP(-({zf}))) >= 0.5) = (f.y = 1.0)
                      THEN 1.0 ELSE 0.0 END), 4) AS train_accuracy
FROM feats f CROSS JOIN b{IRLS_ROUNDS}_t b"""
    )
    return "".join(rounds)


register(
    QuerySpec(
        "logistic_purchase_model",
        logistic_purchase_model,
        _logistic_sql(),
        doc="distributed logistic regression (2 fixed IRLS rounds, no driver math)",
        cites="iterative-ML family; weighted-moment Cramer solve shared with OLS/CV",
        tags=("ml", "iterative"),
    )
)


# ---- decision stump (1-split tree) -----------------------------------------


def decision_stump_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a depth-1 decision tree: the single value-threshold split
    that minimizes weighted Gini impurity for "is this event a purchase?"
    — the building block of every tree ensemble, expressed as declarative
    aggregation.

    Candidate cuts are the 9 internal deciles of `value` chosen by
    integer row position (the winsorization idiom — no interpolated
    quantiles). Each cut's split counts come from one broadcast-join +
    conditional aggregation pass (9 small groups, map-side partials);
    weighted Gini is a few IEEE ops over those exact BIGINT counts, and
    the argmin breaks ties on the smaller cut, so the chosen split is
    engine-stable.
    """
    e = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (F.col("event_type") == "purchase").cast("bigint").alias("buy"),
        "event_id",
    )
    n_tot = e.agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        # distributed global position over |events| (operators/ordered.py
        # two-pass scan — no global sort window at 100 TB)
        with_global_order(
            e.select("cents", "event_id"), "cents", tiebreaks=["event_id"],
            rank_col="rn",
        )
        .crossJoin(F.broadcast(n_tot))
    )
    cuts = (
        ranked.where(F.expr("exists(sequence(1, 9), k -> rn = (k * n) div 10)"))
        .select(F.col("cents").alias("cut"))
        .distinct()
    )
    cells = (
        e.crossJoin(F.broadcast(cuts))
        .groupBy("cut")
        .agg(
            F.sum((F.col("cents") <= F.col("cut")).cast("bigint")).alias("nl"),
            F.sum(F.when(F.col("cents") <= F.col("cut"), F.col("buy")).otherwise(F.lit(0))).alias(
                "pl"
            ),
            F.sum((F.col("cents") > F.col("cut")).cast("bigint")).alias("nr"),
            F.sum(F.when(F.col("cents") > F.col("cut"), F.col("buy")).otherwise(F.lit(0))).alias(
                "pr"
            ),
        )
        .where((F.col("nl") > 0) & (F.col("nr") > 0))
    )
    gini = (
        "2.0 * (CAST(pl AS DOUBLE) * (nl - pl) / nl"
        " + CAST(pr AS DOUBLE) * (nr - pr) / nr)"
        " / (nl + nr)"
    )
    scored = cells.selectExpr("cut", "nl", "pl", "nr", "pr", f"round({gini}, 8) AS gini")
    best = scored.agg(
        F.min(F.struct("gini", "cut", "nl", "pl", "nr", "pr")).alias("b")
    )
    g0 = (
        "2.0 * CAST(b.pl + b.pr AS DOUBLE) * ((b.nl + b.nr) - (b.pl + b.pr))"
        " / (b.nl + b.nr) / (b.nl + b.nr)"
    )
    return best.selectExpr(
        "b.cut AS split_cents",
        "b.nl AS n_left",
        "b.nr AS n_right",
        "round(CAST(b.pl AS DOUBLE) / b.nl, 6) AS purchase_rate_left",
        "round(CAST(b.pr AS DOUBLE) / b.nr, 6) AS purchase_rate_right",
        f"round({g0} - b.gini, 8) AS gini_gain",
    )


STUMP_SQL = """
WITH e AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS buy,
         event_id
  FROM events
),
ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, event_id) AS rn,
         COUNT(*) OVER () AS n
  FROM e
),
cuts AS (
  SELECT DISTINCT cents AS cut
  FROM ranked, (SELECT UNNEST(generate_series(1, 9)) AS k) ks
  WHERE rn = (k * n) // 10
),
cells AS (
  SELECT c.cut,
         CAST(SUM(CASE WHEN e.cents <= c.cut THEN 1 ELSE 0 END) AS BIGINT) AS nl,
         CAST(SUM(CASE WHEN e.cents <= c.cut THEN e.buy ELSE 0 END) AS BIGINT) AS pl,
         CAST(SUM(CASE WHEN e.cents > c.cut THEN 1 ELSE 0 END) AS BIGINT) AS nr,
         CAST(SUM(CASE WHEN e.cents > c.cut THEN e.buy ELSE 0 END) AS BIGINT) AS pr
  FROM e CROSS JOIN cuts c
  GROUP BY 1
  HAVING SUM(CASE WHEN e.cents <= c.cut THEN 1 ELSE 0 END) > 0
     AND SUM(CASE WHEN e.cents > c.cut THEN 1 ELSE 0 END) > 0
),
scored AS (
  SELECT cut, nl, pl, nr, pr,
         ROUND(2.0 * (CAST(pl AS DOUBLE) * (nl - pl) / nl
                      + CAST(pr AS DOUBLE) * (nr - pr) / nr) / (nl + nr), 8) AS gini
  FROM cells
),
best AS (
  SELECT cut, nl, pl, nr, pr, gini,
         ROW_NUMBER() OVER (ORDER BY gini, cut) AS rk
  FROM scored
)
SELECT cut AS split_cents, nl AS n_left, nr AS n_right,
       ROUND(CAST(pl AS DOUBLE) / nl, 6) AS purchase_rate_left,
       ROUND(CAST(pr AS DOUBLE) / nr, 6) AS purchase_rate_right,
       ROUND(2.0 * CAST(pl + pr AS DOUBLE) * ((nl + nr) - (pl + pr))
             / (nl + nr) / (nl + nr) - gini, 8) AS gini_gain
FROM best WHERE rk = 1
"""


register(
    QuerySpec(
        "decision_stump_purchase",
        decision_stump_purchase,
        STUMP_SQL,
        doc="depth-1 Gini decision tree over decile cuts (exact contingency counts, stable argmin)",
        cites="tree-family member of the classical-ML queries; decile idiom of winsorized_stats_by_type",
        tags=("ml", "tree", "stats"),
    )
)


# ---- k-means cluster separation quality ------------------------------------


def kmeans_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality readout for the SAME k-means fit as
    kmeans_embeddings: per cluster, the pooled ratio of nearest-OTHER-
    centroid to own-centroid squared distance (simplified silhouette —
    ratio ≫ 1 means well-separated, ≈ 1 means the cluster bleeds into a
    neighbor). Both sums are exact BIGINT (the quantized-distance
    arithmetic of the fit); pooling avoids a float mean-of-ratios.
    Re-runs the identical 3-iteration fit, so the oracle reuses the
    kmeans CTE chain verbatim."""
    e = load_table(spark, sf_dir, "embeddings")
    data = _km_quantize(e)
    cent = (
        data.where(F.col("vec_id") < KM_K)
        .select(F.col("vec_id").alias("cid"), "pos", F.col("xq").alias("cq"))
    )

    def all_d2(centroids: DataFrame) -> DataFrame:
        return (
            data.join(F.broadcast(centroids), "pos")
            .groupBy("vec_id", "cid")
            .agg(F.sum((F.col("xq") - F.col("cq")) * (F.col("xq") - F.col("cq"))).alias("d2"))
        )

    def assign(centroids: DataFrame) -> DataFrame:
        w = Window.partitionBy("vec_id").orderBy("d2", "cid")
        return (
            all_d2(centroids)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "cid", "d2")
        )

    for _ in range(KM_ITERS):
        asg = assign(cent)
        sums = (
            asg.join(data, "vec_id")
            .groupBy("cid", "pos")
            .agg(F.sum("xq").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        cent = (
            cent.join(sums, ["cid", "pos"], "left")
            .select(
                "cid",
                "pos",
                F.coalesce(
                    F.floor(F.col("s") / F.col("n") + F.lit(0.5)).cast("bigint"),
                    F.col("cq"),
                ).alias("cq"),
            )
            # truncate per round: centroids are k×dims rows, but without
            # this each round nests the previous round's full assignment
            # into one deep multi-scan plan (54 exchanges at 3 iters)
            .localCheckpoint(eager=True)
        )

    alld = all_d2(cent).localCheckpoint(eager=False)  # reused by own + other
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    own = (
        alld.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("own_cid"), F.col("d2").alias("a2"))
    )
    other = (
        own.join(alld, "vec_id")
        .where(F.col("cid") != F.col("own_cid"))
        .groupBy("vec_id")
        .agg(F.min("d2").alias("b2"))
    )
    return (
        own.join(other, "vec_id")
        .groupBy(F.col("own_cid").alias("cid"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum("a2").alias("sum_intra2"),
            F.sum("b2").alias("sum_nearest_other2"),
        )
        .selectExpr(
            "cid",
            "n_vectors",
            "sum_intra2",
            "sum_nearest_other2",
            "CASE WHEN sum_intra2 > 0 THEN"
            " round(CAST(sum_nearest_other2 AS DOUBLE) / sum_intra2, 4) END"
            " AS separation_ratio",
        )
        .orderBy("cid")
    )


def _kmeans_separation_sql() -> str:
    from analytics_data_platform_spark.queries import REGISTRY

    base = REGISTRY["kmeans_embeddings"].oracle
    head = base[: base.index("finalasg AS (")].rstrip().rstrip(",")
    return f"""{head},
alld AS (
  SELECT d.vec_id, c.cid, CAST(SUM((d.xq - c.cq) * (d.xq - c.cq)) AS BIGINT) AS d2
  FROM data d JOIN cent3 c ON d.pos = c.pos
  GROUP BY 1, 2
),
own AS (
  SELECT vec_id, cid AS own_cid, d2 AS a2
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM alld)
  WHERE rn = 1
),
other AS (
  SELECT o.vec_id, CAST(MIN(l.d2) AS BIGINT) AS b2
  FROM own o JOIN alld l ON l.vec_id = o.vec_id AND l.cid <> o.own_cid
  GROUP BY 1
)
SELECT o.own_cid AS cid,
       COUNT(*) AS n_vectors,
       CAST(SUM(o.a2) AS BIGINT) AS sum_intra2,
       CAST(SUM(t.b2) AS BIGINT) AS sum_nearest_other2,
       CASE WHEN CAST(SUM(o.a2) AS BIGINT) > 0 THEN
         ROUND(CAST(SUM(t.b2) AS DOUBLE) / CAST(SUM(o.a2) AS BIGINT), 4) END
         AS separation_ratio
FROM own o JOIN other t ON o.vec_id = t.vec_id
GROUP BY 1 ORDER BY 1
"""


register(
    QuerySpec(
        "kmeans_separation",
        kmeans_separation,
        _kmeans_separation_sql(),
        doc="per-cluster nearest-other vs own centroid distance ratio (simplified silhouette, exact sums)",
        cites="quality gate over kmeans_embeddings' fit; pooled-ratio idiom of minhash_calibration",
        tags=("ml", "eval", "clustering"),
    )
)


# --- k-NN classification via the two-phase top-k similarity plan -----------

KNN_K = 5


def knn_label_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN classifier evaluation: every 10th vector is held out and
    classified by majority label among its 5 nearest training vectors
    (cosine); reports per-true-label accuracy. This is the eval loop a
    labeling/QA pipeline runs over embedding spaces.

    Scale shape: the held-out side broadcasts, the training corpus
    streams once, and neighbor selection is the TWO-PHASE top-k
    (operators.similarity.topk_per_query) — per-partition local top-k
    then a bounded global window, never a full-corpus sort per query.
    Votes rank on (count DESC, label ASC) so ties are engine-stable;
    similarities rank on ROUND(cos, 4) with vec_id tie-break."""
    from analytics_data_platform_spark.functions import vectors as V
    from analytics_data_platform_spark.operators.similarity import topk_per_query

    e = load_table(spark, sf_dir, "embeddings")
    test = e.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("q_emb"),
        V.norm("embedding").alias("q_nrm"),
    )
    train = e.where(F.col("vec_id") % 10 != 0).select(
        "vec_id", F.col("label").alias("n_label"), "embedding",
        V.norm("embedding").alias("c_nrm"),
    )
    cos = F.when(
        (F.col("q_nrm") > 0) & (F.col("c_nrm") > 0),
        V.dot("q_emb", "embedding") / (F.col("q_nrm") * F.col("c_nrm")),
    )
    scored = train.join(F.broadcast(test), F.lit(True)).select(
        "q_id", "vec_id", F.round(cos, 4).alias("cos_sim")
    )
    # phase-1 pruning keeps only (q_id, vec_id, score); labels rejoin after.
    # The top-k result is bounded (k × |queries|) — IT broadcasts against
    # the big training side, never the reverse.
    topk = topk_per_query(scored, KNN_K, "q_id", "vec_id", "cos_sim")
    nn = (
        train.select("vec_id", "n_label")
        .join(F.broadcast(topk), "vec_id")
        .join(F.broadcast(test.select("q_id", "true_label")), "q_id")
    )
    votes = nn.groupBy("q_id", "true_label", "n_label").agg(
        F.count(F.lit(1)).alias("v")
    )
    w_vote = Window.partitionBy("q_id").orderBy(F.desc("v"), "n_label")
    pred = (
        votes.withColumn("rn", F.row_number().over(w_vote))
        .where(F.col("rn") == 1)
        .select("q_id", "true_label", F.col("n_label").alias("pred_label"))
    )
    return pred.groupBy("true_label").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum((F.col("pred_label") == F.col("true_label")).cast("bigint")).alias("n_correct"),
        F.round(
            F.sum((F.col("pred_label") == F.col("true_label")).cast("bigint"))
            / F.count(F.lit(1)), 4
        ).alias("accuracy"),
    )


KNN_SQL = f"""
WITH test AS (
  SELECT vec_id AS q_id, label AS true_label, embedding AS q_emb
  FROM embeddings WHERE vec_id % 10 = 0
),
train AS (
  SELECT vec_id, label AS n_label, embedding FROM embeddings WHERE vec_id % 10 <> 0
),
scored AS (
  SELECT t.q_id, t.true_label, tr.vec_id, tr.n_label,
         ROUND(
           list_sum(list_transform(list_zip(t.q_emb, tr.embedding),
                                   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(t.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(tr.embedding,
                                             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
           AS cos_sim
  FROM train tr CROSS JOIN test t
),
nn AS (
  SELECT q_id, true_label, n_label FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rank
    FROM scored
  ) WHERE rank <= {KNN_K}
),
votes AS (
  SELECT q_id, true_label, n_label, COUNT(*) AS v FROM nn GROUP BY 1, 2, 3
),
pred AS (
  SELECT q_id, true_label, n_label AS pred_label FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY v DESC, n_label) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT true_label, COUNT(*) AS n_test,
       CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       ROUND(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS accuracy
FROM pred GROUP BY true_label
"""

register(
    QuerySpec(
        "knn_label_classifier",
        knn_label_classifier,
        KNN_SQL,
        doc="5-NN majority-vote classifier eval per label (two-phase top-k plan)",
        cites="ml-eval family; operators/similarity.topk_per_query",
        tags=("ml", "vector", "topk"),
    )
)


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes language classifier, trained AND evaluated
# in-engine (fastText-style supervised baseline, exact fixed-point)
# ---------------------------------------------------------------------------

NB_LOGSCALE = 1_000_000  # micro-nat fixed point


def nb_lang_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a multinomial Naive Bayes classifier P(lang | tokens) on the
    corpus and evaluate it on the same corpus (resubstitution confusion
    matrix) — the supervised counterpart of the n-gram-heuristic
    ``lang_id_confusion``: that row audits a hand-built scorer, this one
    audits the trainable baseline every data pipeline reaches for first
    (fastText's linear recipe, minus the embedding layer).

    Exactness: token log-likelihoods ln((c_tl+1)/(n_l+V)) are computed
    once per (token, lang) SEEN pair and fixed-pointed to integer
    micro-nats; the unseen-token contribution collapses to a per-lang
    constant u_l = ln(1/(n_l+V)) because Laplace smoothing makes every
    unseen count identical — so each document score is an exact integer
    dot product plus (n_tokens − matched)·u_l + prior, and argmax with a
    lang tie-break is bit-stable across engines and partitionings.

    Scale: one token-keyed groupBy for the model (vocab-bounded, not
    corpus-bounded), one token-keyed join for scoring, one doc-keyed agg;
    the lang dimension (|L| rows) broadcasts. No per-row Python anywhere.
    """
    d = load_table(spark, sf_dir, "documents").where(F.length(F.trim("text")) > 0)
    toks = d.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    )
    doc_toks = toks.groupBy("doc_id", "true_lang", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    # model: per-lang token counts, totals, vocab size, doc priors
    tl = doc_toks.groupBy("tok", F.col("true_lang").alias("lang")).agg(
        F.sum("c").alias("c_tl")
    )
    lang_tot = tl.groupBy("lang").agg(F.sum("c_tl").alias("n_l"))
    vocab = tl.select("tok").distinct().agg(F.count(F.lit(1)).alias("v"))
    n_docs_total = d.agg(F.count(F.lit(1)).alias("n_docs"))
    priors = (
        d.groupBy(F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_lang_docs"))
        .crossJoin(F.broadcast(n_docs_total))
        .select(
            "lang",
            F.round(
                F.log(F.col("n_lang_docs").cast("double") / F.col("n_docs").cast("double"))
                * NB_LOGSCALE
            )
            .cast("bigint")
            .alias("prior_micro"),
        )
    )
    lang_const = (
        lang_tot.crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "n_l",
            "v",
            F.round(
                -F.log((F.col("n_l") + F.col("v")).cast("double")) * NB_LOGSCALE
            )
            .cast("bigint")
            .alias("u_micro"),  # ln(1/(n_l+V)) for any unseen token
        )
    )
    seen = (
        tl.join(lang_const.select("lang", "n_l", "v"), "lang")
        .select(
            "tok",
            "lang",
            F.round(
                F.log(
                    (F.col("c_tl") + 1).cast("double")
                    / (F.col("n_l") + F.col("v")).cast("double")
                )
                * NB_LOGSCALE
            )
            .cast("bigint")
            .alias("s_micro"),
        )
    )
    doc_len = doc_toks.groupBy("doc_id", "true_lang").agg(F.sum("c").alias("n_tok"))
    matched = (
        doc_toks.join(seen, "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("c") * F.col("s_micro")).alias("seen_micro"),
            F.sum("c").alias("n_matched"),
        )
    )
    langs = priors.select("lang", "prior_micro").join(
        lang_const.select("lang", "u_micro"), "lang"
    )
    scored = (
        doc_len.crossJoin(F.broadcast(langs))
        .join(matched, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "true_lang",
            "lang",
            (
                F.coalesce("seen_micro", F.lit(0))
                + (F.col("n_tok") - F.coalesce("n_matched", F.lit(0))) * F.col("u_micro")
                + F.col("prior_micro")
            ).alias("score"),
        )
    )
    # deterministic argmax: highest score, then SMALLEST lang string
    pred = (
        scored.withColumn("_neg", -F.col("score"))
        .groupBy("doc_id", "true_lang")
        .agg(F.min(F.struct(F.col("_neg"), F.col("lang"))).alias("best"))
        .select("doc_id", "true_lang", F.col("best.lang").alias("pred_lang"))
    )
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


NB_SQL = f"""
WITH d AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS t
           FROM documents WHERE length(trim(text)) > 0),
doc_toks AS (
  SELECT doc_id, lang AS true_lang, tok, COUNT(*) AS c
  FROM (SELECT doc_id, lang, unnest(t) AS tok FROM d)
  GROUP BY 1, 2, 3
),
tl AS (SELECT tok, true_lang AS lang, SUM(c) AS c_tl FROM doc_toks GROUP BY 1, 2),
lang_tot AS (SELECT lang, SUM(c_tl) AS n_l FROM tl GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM tl),
n_docs_total AS (SELECT COUNT(*) AS n_docs FROM d),
priors AS (
  SELECT lang,
         CAST(ROUND(LN(CAST(COUNT(*) AS DOUBLE) / (SELECT CAST(n_docs AS DOUBLE) FROM n_docs_total))
                    * {NB_LOGSCALE}) AS BIGINT) AS prior_micro
  FROM d GROUP BY lang
),
lang_const AS (
  SELECT lang, n_l, v,
         CAST(ROUND(-LN(CAST(n_l + v AS DOUBLE)) * {NB_LOGSCALE}) AS BIGINT) AS u_micro
  FROM lang_tot CROSS JOIN vocab
),
seen AS (
  SELECT tl.tok, tl.lang,
         CAST(ROUND(LN(CAST(tl.c_tl + 1 AS DOUBLE) / CAST(lc.n_l + lc.v AS DOUBLE))
                    * {NB_LOGSCALE}) AS BIGINT) AS s_micro
  FROM tl JOIN lang_const lc ON tl.lang = lc.lang
),
doc_len AS (SELECT doc_id, true_lang, SUM(c) AS n_tok FROM doc_toks GROUP BY 1, 2),
matched AS (
  SELECT dt.doc_id, s.lang,
         SUM(dt.c * s.s_micro) AS seen_micro,
         SUM(dt.c) AS n_matched
  FROM doc_toks dt JOIN seen s ON dt.tok = s.tok
  GROUP BY 1, 2
),
langs AS (
  SELECT p.lang, p.prior_micro, lc.u_micro
  FROM priors p JOIN lang_const lc ON p.lang = lc.lang
),
scored AS (
  SELECT dl.doc_id, dl.true_lang, l.lang,
         COALESCE(m.seen_micro, 0)
           + (dl.n_tok - COALESCE(m.n_matched, 0)) * l.u_micro
           + l.prior_micro AS score
  FROM doc_len dl CROSS JOIN langs l
  LEFT JOIN matched m ON dl.doc_id = m.doc_id AND l.lang = m.lang
),
pred AS (
  SELECT doc_id, true_lang, lang AS pred_lang FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2 ORDER BY 1, 2
"""

register(
    QuerySpec(
        "nb_lang_classifier_eval",
        nb_lang_classifier_eval,
        NB_SQL,
        doc="multinomial Naive Bayes lang classifier trained + confusion-evaluated in-engine (exact fixed-point)",
        cites="training-data ops: supervised quality/domain classification (fastText-recipe baseline)",
        tags=("ml", "text", "training"),
    )
)
