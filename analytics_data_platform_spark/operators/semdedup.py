"""SemDeDup operator form: semantic near-dup removal with a BOUNDED
per-cluster quadratic term (Abbas et al. 2023, arXiv:2303.09540 §3 —
"recluster oversized clusters" is the paper's own skew knob; the query
form in ``queries/vector_ops.py::semantic_dedup_clusters`` keeps the flat
single-level clustering so its DuckDB oracle stays unchanged).

Why this exists: SemDeDup's pair work is Σ cluster². That bound is only
useful while clusters stay balanced — at 100 TB one hot cluster (all the
near-identical boilerplate pages, say 50% of the corpus) re-introduces an
n²/4 pair join. ``semdedup`` therefore takes ``max_cluster_size`` and
recursively RE-CLUSTERS any oversized cluster on a secondary deterministic
centroid set (the k member vectors with the smallest ids — the same
first-k rule as the top level, so both levels are reproducible without a
random seed). After ``max_split_rounds`` a cluster that refuses to shrink
(e.g. thousands of bit-identical vectors: every sub-centroid coincides, so
re-clustering cannot separate them) is hash-salted on the id, and any
bucket the salt leaves oversized (hash uniformity is only expected) is
rank-split exactly — so the size bound is HARD, not probabilistic. The
rank-split's per-cluster window sort is acceptable only there: its input
is already salt-bounded, never the original hot cluster. Recall cost is
confined to those degenerate clusters (pairs across salt/rank buckets are
not compared; for bit-identical members exact dedup upstream is the right
tool anyway).

Scale shape per split round:
- sizes ride a groupBy(cluster) count (map-side partial, one shuffle);
- sub-centroid selection is a two-level min-k (per-input-partition
  ``collect_list`` slice, then a ≤ k·P-element merge) — NEVER a
  whole-cluster window sort, which would put 50% of the corpus in one task;
- assignment joins members against a BROADCAST sub-centroid table
  (k × #oversized-clusters rows) — the skewed cluster key never shuffles;
- per-round lineage is truncated with localCheckpoint (the PQ/k-means
  pattern — iterative plans otherwise re-evaluate every round per
  reference).

The driver loop runs one tiny action per round (``isEmpty`` on the
oversized set) and is bounded by ``max_split_rounds`` — this is control
flow, not data movement.
"""

from __future__ import annotations

from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def quantize_vectors(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """(id, xq: array<bigint>, n2: bigint) — the exact-integer form every
    downstream similarity test uses (no float re-association anywhere)."""
    xq = F.transform(
        vec_col, lambda x: F.round(x.cast("double") * scale).cast("bigint")
    ).alias("xq")
    out = df.select(F.col(id_col), xq)
    return out.withColumn(
        "n2",
        F.aggregate(
            F.transform("xq", lambda v: v * v),
            F.lit(0).cast("bigint"),
            lambda a, v: a + v,
        ),
    )


def _min_k_centroids(members: DataFrame, id_col: str, k: int) -> DataFrame:
    """k smallest-id members per cluster as (cluster, scid, cq) — two-level
    min-k so no single task ever sorts a whole (possibly huge) cluster."""
    item = F.struct(F.col(id_col).alias("_id"), F.col("xq").alias("_xq"))
    stage1 = (
        members.groupBy("cluster", F.spark_partition_id().alias("_p"))
        .agg(F.slice(F.array_sort(F.collect_list(item)), 1, k).alias("_cands"))
    )
    stage2 = stage1.groupBy("cluster").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("_cands"))), 1, k).alias("_top")
    )
    return stage2.select(
        "cluster", F.posexplode("_top").alias("_i", "_c")
    ).select(
        "cluster",
        F.col("_i").cast("int").alias("scid"),
        F.col("_c._xq").alias("cq"),
    )


def _assign_to_centroids(
    members: DataFrame, centroids: DataFrame, id_col: str
) -> DataFrame:
    """argmin_{scid} ||xq - cq||² with scid tie-break; centroids broadcast
    (k × #clusters rows), so the skewed cluster key never shuffles."""
    d2 = F.aggregate(
        F.zip_with("xq", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return (
        members.join(F.broadcast(centroids), "cluster")
        .select(members["*"], "scid", d2.alias("_d2"))
        .groupBy(id_col)
        .agg(
            F.min(F.struct("_d2", "scid")).alias("_best"),
            F.first("cluster").alias("cluster"),
            F.first("xq").alias("xq"),
            F.first("n2").alias("n2"),
        )
        .select(
            F.col(id_col),
            F.concat_ws(":", "cluster", F.col("_best.scid").cast("string")).alias(
                "cluster"
            ),
            "xq",
            "n2",
        )
    )


def semdedup(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    k: int = 8,
    threshold: tuple[int, int] = (4, 25),
    max_cluster_size: Optional[int] = None,
    max_split_rounds: int = 8,
) -> DataFrame:
    """SemDeDup over quantized vectors (``quantize_vectors`` output).

    Returns (id, cluster, is_dropped): ``is_dropped`` is true when a
    smaller-id member of the SAME final cluster is cosine-similar above
    sqrt(threshold[0]/threshold[1]) — the deterministic min-id keeper rule.
    With ``max_cluster_size`` set, no final cluster exceeds it, so pair
    work is ≤ Σ min(cᵢ, max)² regardless of input skew.
    """
    t_num, t_den = threshold
    members = vectors.select(
        F.col(id_col),
        F.lit("r").alias("cluster"),  # single root; level-0 split below
        "xq",
        "n2",
    )
    # level 0: the flat SemDeDup clustering (first-k global centroids),
    # expressed as one split round over the root cluster
    members = _assign_to_centroids(
        members, _min_k_centroids(members, id_col, k), id_col
    ).localCheckpoint(eager=False)

    if max_cluster_size is not None:
        for _ in range(max_split_rounds):
            sizes = members.groupBy("cluster").agg(F.count(F.lit(1)).alias("_csz"))
            # no forced broadcast: cluster cardinality grows ~n/max at scale
            # (unbounded), so let AQE pick broadcast-vs-shuffle by observed
            # size; forced broadcast is reserved for the k-row centroid table
            members = members.join(sizes, "cluster")
            over = members.where(F.col("_csz") > max_cluster_size).drop("_csz")
            ok = members.where(F.col("_csz") <= max_cluster_size).drop("_csz")
            if over.isEmpty():
                members = ok
                break
            resplit = _assign_to_centroids(
                over, _min_k_centroids(over, id_col, k), id_col
            )
            members = ok.unionByName(resplit).localCheckpoint(eager=True)
        else:
            # degenerate clusters (coincident vectors) cannot be separated
            # by re-clustering: modulo-salt them — deterministic, bounded,
            # recall loss confined to these clusters (see module docstring)
            sizes = members.groupBy("cluster").agg(F.count(F.lit(1)).alias("_csz"))
            # hash the id first: raw ids can be arithmetically correlated
            # with the bucket count (e.g. all-even ids mod 2), a hash mixes
            # 2× headroom: hash buckets are uniform only in expectation, the
            # factor keeps the expected bucket load at max/2 so exceeding
            # max is vanishingly unlikely even for adversarial sizes
            salt = F.pmod(
                F.xxhash64(F.col(id_col)),
                (F.ceil(F.col("_csz") / F.lit(max_cluster_size)) * 2).cast("bigint"),
            )
            members = (
                members.join(sizes, "cluster")
                .select(
                    F.col(id_col),
                    F.when(
                        F.col("_csz") > max_cluster_size,
                        F.concat_ws(":", "cluster", F.lit("s"), salt.cast("string")),
                    )
                    .otherwise(F.col("cluster"))
                    .alias("cluster"),
                    "xq",
                    "n2",
                )
            )
            # HARD bound: hash buckets are uniform only in expectation, so a
            # residual bucket can still exceed max. Rank-split whatever
            # remains oversized — an exact equal-width cut via a per-cluster
            # window sort, acceptable ONLY here because each such bucket is
            # already salt-bounded (≤ the pre-salt cluster / 2·ceil factor),
            # never the original 50%-of-corpus cluster.
            from pyspark.sql import Window as _W

            sizes2 = members.groupBy("cluster").agg(F.count(F.lit(1)).alias("_csz"))
            # no forced broadcast here either: sizes2 has one row per cluster
            # (~n/max at scale — unbounded), the same argument as the main
            # split loop above; AQE decides broadcast-vs-shuffle
            joined = members.join(sizes2, "cluster")
            fine = joined.where(F.col("_csz") <= max_cluster_size).drop("_csz")
            residue = joined.where(F.col("_csz") > max_cluster_size).drop("_csz")
            rank = F.row_number().over(_W.partitionBy("cluster").orderBy(id_col))
            residue = residue.select(
                F.col(id_col),
                F.concat_ws(
                    ":",
                    "cluster",
                    F.lit("r"),
                    F.floor((rank - 1) / max_cluster_size).cast("string"),
                ).alias("cluster"),
                "xq",
                "n2",
            )
            members = fine.unionByName(residue)

    a = members.select(
        F.col(id_col).alias("_a_id"),
        F.col("xq").alias("_a_xq"),
        F.col("n2").alias("_a_n2"),
        "cluster",
    )
    b = members.select(
        F.col(id_col).alias("_b_id"),
        F.col("xq").alias("_b_xq"),
        F.col("n2").alias("_b_n2"),
        "cluster",
    )
    dot = F.aggregate(
        F.zip_with("_a_xq", "_b_xq", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    dec = "decimal(38,0)"
    pairs = (
        a.join(b, "cluster")
        .where(F.col("_a_id") < F.col("_b_id"))
        .select("cluster", "_b_id", "_a_n2", "_b_n2", dot.alias("_dot"))
        .where(
            (F.col("_dot") > 0)
            & (
                F.lit(t_den) * F.col("_dot").cast(dec) * F.col("_dot").cast(dec)
                >= F.lit(t_num) * F.col("_a_n2").cast(dec) * F.col("_b_n2").cast(dec)
            )
        )
    )
    dropped = pairs.select(F.col("_b_id").alias(id_col)).distinct()
    return members.join(
        dropped.withColumn("_drop", F.lit(True)), id_col, "left"
    ).select(
        F.col(id_col),
        "cluster",
        F.coalesce("_drop", F.lit(False)).alias("is_dropped"),
    )
