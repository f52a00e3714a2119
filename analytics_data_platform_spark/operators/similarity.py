"""Similarity search over embedding columns: brute-force baseline,
LSH-bucketed and IVF (coarse-quantized) scale paths.

Scale design (100 TB / billions of vectors):
- brute force: one corpus pass per query batch, broadcast queries,
  per-partition top-k then global top-k (no full sort).
- random-hyperplane LSH: deterministic projection matrix (seeded numpy)
  baked into the plan as literal arrays; signature = sign-bit string;
  probing joins query buckets to corpus buckets — only bucket collisions
  are scored.
- IVF: k-means coarse centroids (seeded); corpus partitioned by nearest
  centroid (nprobe-nearest centroids scanned per query). Centroid
  assignment is a broadcast-join + argmin over a literal centroid array —
  the same shape a Faiss IVF index distributes to.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from analytics_data_platform_spark.functions.vectors import cosine, dot


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
) -> DataFrame:
    """Exact cosine top-k per query. Queries broadcast; corpus streams."""
    scored = corpus.join(F.broadcast(queries), F.col(id_col) != F.col(q_id_col)).select(
        q_id_col, id_col, cosine(q_vec_col, vec_col).alias("cos_sim")
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_bits, dim).round(6).tolist()


def lsh_signature_col(vec_col: str, planes: list[list[float]]):
    """Sign-bit signature string, e.g. '1011…' — computed with JVM
    higher-order functions against literal plane arrays."""
    bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in p])) >= 0, "1").otherwise("0")
        for p in planes
    ]
    return F.concat(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only same-bucket (equal signature) vectors.

    Recall/cost tradeoff via n_bits (bucket count ≈ 2^n_bits). Multi-probe
    (flipping low-confidence bits) is the standard extension; single-probe
    keeps the plan one equi-join.
    """
    planes = _hyperplanes(dim, n_bits, seed)
    c = corpus.withColumn("_sig", lsh_signature_col(vec_col, planes))
    q = queries.withColumn("_qsig", lsh_signature_col(q_vec_col, planes))
    scored = c.join(
        F.broadcast(q),
        (F.col("_sig") == F.col("_qsig")) & (F.col(id_col) != F.col(q_id_col)),
    ).select(q_id_col, id_col, cosine(q_vec_col, vec_col).alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# --- IVF ------------------------------------------------------------------


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    max_iter: int = 10,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Seeded k-means on the driver over a bounded sample.

    Coarse-quantizer training needs only a corpus sample (Faiss trains IVF
    on ~30-256 vectors/centroid) — sampling keeps driver memory O(sample),
    independent of corpus size.
    """
    if sample_fraction is None:
        vecs = np.array(corpus.select(vec_col).limit(n_centroids * 256).toPandas()[vec_col].tolist())
    else:
        vecs = np.array(
            corpus.select(vec_col).sample(sample_fraction, seed=seed).toPandas()[vec_col].tolist()
        )
    rng = np.random.RandomState(seed)
    cents = vecs[rng.choice(len(vecs), size=min(n_centroids, len(vecs)), replace=False)].astype(
        np.float64
    )
    for _ in range(max_iter):
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = vecs[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents.round(6).tolist()


def assign_centroid_col(vec_col: str, centroids: list[list[float]]):
    """argmin over literal centroid array — pure JVM expression."""
    dists = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in c]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    arr = F.array(*dists)
    return F.array_position(arr, F.array_min(arr)) - 1


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
) -> DataFrame:
    """IVF search: scan only the nprobe nearest centroid cells per query.

    At scale the corpus is written partitioned by `_cell` (partition
    pruning turns each probe into a file-skip scan).
    """
    c = corpus.withColumn("_cell", assign_centroid_col(vec_col, centroids))
    # per-query nprobe nearest cells, via the same literal-centroid distances
    dists = [
        F.aggregate(
            F.zip_with(
                F.col(q_vec_col),
                F.array(*[F.lit(float(x)) for x in cent]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"d{i}")
        for i, cent in enumerate(centroids)
    ]
    q = queries.select(q_id_col, q_vec_col, F.array(*dists).alias("_qd"))
    cells = F.slice(
        F.transform(
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                    lambda i: F.struct(F.element_at("_qd", i + 1).alias("d"), i.alias("cell")),
                )
            ),
            lambda s: s["cell"],
        ),
        1,
        nprobe,
    )
    q = q.select(q_id_col, q_vec_col, F.explode(cells).alias("_qcell"))
    scored = c.join(
        F.broadcast(q), (F.col("_cell") == F.col("_qcell")) & (F.col(id_col) != F.col(q_id_col))
    ).select(q_id_col, id_col, cosine(q_vec_col, vec_col).alias("cos_sim"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
