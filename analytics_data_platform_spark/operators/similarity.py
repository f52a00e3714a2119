"""Similarity search over embedding columns: brute-force baseline,
LSH-bucketed and IVF (coarse-quantized) scale paths.

Scale design (100 TB / billions of vectors):
- brute force: one corpus pass per query batch, broadcast queries,
  TWO-PHASE top-k — per-input-partition local top-k (map-parallel,
  parallelism = #partitions), then a global top-k window whose input is
  bounded by k × numPartitions rows per query. The naive single window
  over all scored candidates funnels the whole corpus for one query
  through one task; the two-phase form never does.
- random-hyperplane LSH: deterministic projection matrix (seeded numpy);
  signature = sign-bit string; probing joins query buckets to corpus
  buckets — only bucket collisions are scored.
- IVF: k-means coarse centroids (seeded); corpus partitioned by nearest
  centroid (nprobe-nearest centroids scanned per query). Centroid
  assignment has two physical strategies:
    * n_centroids ≤ 32 — pure-JVM literal-array argmin (zero Python);
    * larger nlist (Faiss-realistic 1024-65536) — an Arrow-batched
      pandas_udf doing one numpy matmul per batch; the centroid matrix
      travels once per executor in the serialized function (closure
      broadcast), keeping the plan O(1) in n_centroids instead of
      O(n_centroids × dim) literal nodes that blow up the analyzer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from analytics_data_platform_spark.functions.expr import spread
from analytics_data_platform_spark.functions.vectors import cosine, dot

# literal-argmin plan nodes grow O(n_centroids × dim); past this the
# pandas_udf path is both smaller-plan and faster (one BLAS matmul/batch)
MAX_LITERAL_CENTROIDS = 32


# --- two-phase top-k -------------------------------------------------------


def local_topk(
    scored: DataFrame,
    k: int,
    q_id_col: str = "q_id",
    id_col: str = "vec_id",
    score_col: str = "cos_sim",
) -> DataFrame:
    """Phase 1: top-k per (input partition, query).

    groupBy(spark_partition_id(), q_id) keeps every group inside the map
    task that produced it, so the heavy sort+slice runs with parallelism
    = #input-partitions (not #queries), and at most k rows per
    (partition, query) survive into phase 2.

    The candidate struct leads with the NEGATED score (nulls → +inf) so
    plain ascending ``array_sort`` yields score DESC NULLS LAST, id ASC —
    the exact total order of ``Window.orderBy(desc_nulls_last, asc)`` —
    through codegen'd struct comparison instead of a per-comparison
    interpreted lambda (a comparator HOF here measured ~2× slower on the
    whole query).
    """
    neg = -F.coalesce(F.col(score_col).cast("double"), F.lit(float("-inf")))
    packed = scored.select(
        F.spark_partition_id().alias("_pid"),
        F.col(q_id_col),
        F.struct(
            neg.alias("nscore"),
            F.col(id_col).alias("id"),
            F.col(score_col).alias("score"),
        ).alias("_cand"),
    )
    return (
        packed.groupBy("_pid", q_id_col)
        .agg(F.slice(F.array_sort(F.collect_list("_cand")), 1, k).alias("_top"))
        .select(q_id_col, F.explode("_top").alias("_t"))
        .select(q_id_col, F.col("_t.id").alias(id_col), F.col("_t.score").alias(score_col))
    )


def local_topk_mapside(
    scored: DataFrame,
    k: int,
    q_id_col: str = "q_id",
    id_col: str = "vec_id",
    score_col: str = "cos_sim",
) -> DataFrame:
    """Phase 1 with ZERO-shuffle map-side pruning (``mapInPandas``).

    The JVM ``local_topk`` groups on (partition_id, q_id): the aggregation
    collapses each group to one row before the exchange, but that row
    carries the group's FULL candidate list packed as an array — shuffle
    bytes stay O(candidates). This variant prunes inside the map task
    with bounded state (a running top-k per query, folded batch by
    batch), so only k rows per (partition, query) ever leave the task:
    shuffle rows AND bytes are O(k × partitions × queries).

    Tradeoff: crosses the Python boundary (Arrow-batched; three scalar
    columns only). Prefer it when per-partition candidate volume is much
    larger than k — the 100-TB brute-force scan — and the JVM form when
    candidates are already thin (post-LSH/IVF pruning).
    """
    slim = scored.select(q_id_col, id_col, score_col)
    schema = slim.schema

    def prune(batches):
        best: dict = {}  # q_id -> pdf of current top-k
        for pdf in batches:
            for q, grp in pdf.groupby(q_id_col, sort=False):
                cur = best.get(q)
                merged = grp if cur is None else pd.concat((cur, grp), ignore_index=True)
                merged = merged.sort_values(
                    [score_col, id_col], ascending=[False, True], kind="mergesort"
                )
                best[q] = merged.head(k)
        if best:
            yield pd.concat(best.values(), ignore_index=True)

    return slim.mapInPandas(prune, schema=schema)


def topk_per_query(
    scored: DataFrame,
    k: int,
    q_id_col: str = "q_id",
    id_col: str = "vec_id",
    score_col: str = "cos_sim",
    rank_col: str = "rank",
    prune: str = "jvm",
) -> DataFrame:
    """Exact top-k per query in two phases.

    Phase 2's window sees ≤ k × numPartitions rows per query — a few KB —
    so the single-task-per-query sort that kills the naive plan at scale
    is over a bounded, tiny input. Result is identical to the one-window
    form (same total order, including tie-breaks).

    ``prune`` picks phase 1: ``"jvm"`` (codegen'd, whole-stage, shuffles
    packed per-group arrays) or ``"arrow"`` (``local_topk_mapside``:
    Python boundary but only k rows per partition per query cross the
    wire — the right choice for full-corpus scans at 100 TB).
    """
    if prune not in ("jvm", "arrow"):
        raise ValueError(f"prune {prune!r} not in ('jvm', 'arrow')")
    phase1 = local_topk if prune == "jvm" else local_topk_mapside
    pruned = phase1(scored, k, q_id_col, id_col, score_col)
    w = Window.partitionBy(q_id_col).orderBy(
        F.desc_nulls_last(score_col), F.asc(id_col)
    )
    return pruned.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
) -> DataFrame:
    """Exact cosine top-k per query. Queries broadcast; corpus streams;
    two-phase top-k keeps parallelism at #partitions."""
    scored = spread(corpus).join(F.broadcast(queries), F.col(id_col) != F.col(q_id_col)).select(
        q_id_col, id_col, cosine(q_vec_col, vec_col).alias("cos_sim")
    )
    return topk_per_query(scored, k, q_id_col, id_col, "cos_sim")


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_bits, dim).round(6).tolist()


def lsh_signature_col(vec_col: str, planes: list[list[float]]):
    """Sign-bit signature string, e.g. '1011…' — computed with JVM
    higher-order functions against literal plane arrays (n_bits is small,
    so the literal form stays compact; see signature_udf for huge dims)."""
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
    score_round: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only same-bucket (equal signature) vectors.

    Recall/cost tradeoff via n_bits (bucket count ≈ 2^n_bits). Multi-probe
    (flipping low-confidence bits) is the standard extension; single-probe
    keeps the plan one equi-join. Final selection is the same two-phase
    top-k as the brute-force path. ``score_round`` rounds cos_sim BEFORE
    ranking (with the id tie-break) so an external oracle computing the
    same rounded score ranks identically despite float ulp differences.
    """
    planes = _hyperplanes(dim, n_bits, seed)
    c = spread(corpus).withColumn("_sig", lsh_signature_col(vec_col, planes))
    q = queries.withColumn("_qsig", lsh_signature_col(q_vec_col, planes))
    score = cosine(q_vec_col, vec_col)
    if score_round is not None:
        score = F.round(score, score_round)
    scored = c.join(
        F.broadcast(q),
        (F.col("_sig") == F.col("_qsig")) & (F.col(id_col) != F.col(q_id_col)),
    ).select(q_id_col, id_col, score.alias("cos_sim"))
    return topk_per_query(scored, k, q_id_col, id_col, "cos_sim")


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
    """argmin over literal centroid array — pure JVM expression.

    Plan size is O(n_centroids × dim) literal nodes: right choice up to
    ~32 centroids (zero Python boundary), analyzer blowup past that — the
    caller switches to :func:`assign_centroid_udf` above
    ``MAX_LITERAL_CENTROIDS``.
    """
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


def assign_centroid_udf(centroids: list[list[float]]):
    """Vectorized nearest-centroid assignment for realistic nlist.

    One numpy matmul per Arrow batch: argmin ‖v−c‖² = argmin(‖c‖² − 2v·c).
    The (nlist × dim) centroid matrix ships once per executor inside the
    serialized function — the plan itself stays O(1) regardless of nlist.
    Distances computed in float64; first-min-index tie-break matches the
    literal path's array_position semantics.
    """
    cents = np.asarray(centroids, dtype=np.float64)
    cn = (cents**2).sum(axis=1)

    @F.pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        d = cn[None, :] - 2.0 * (m @ cents.T)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return _assign


def nprobe_cells_udf(centroids: list[list[float]], nprobe: int):
    """Per-query nprobe nearest cells (array<int>), vectorized like
    :func:`assign_centroid_udf`; stable argsort ties by cell index asc —
    the same order as the literal struct-sort path."""
    cents = np.asarray(centroids, dtype=np.float64)
    cn = (cents**2).sum(axis=1)
    n = min(nprobe, len(centroids))

    @F.pandas_udf("array<int>")
    def _cells(vecs: pd.Series) -> pd.Series:
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        d = cn[None, :] - 2.0 * (m @ cents.T)
        idx = np.argsort(d, axis=1, kind="stable")[:, :n].astype("int32")
        return pd.Series(list(idx))

    return _cells


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
    score_round: int | None = None,
) -> DataFrame:
    """IVF search: scan only the nprobe nearest centroid cells per query.

    At scale the corpus is written partitioned by `_cell` (partition
    pruning turns each probe into a file-skip scan). Cell assignment is
    pure-JVM literals for small nlist, an Arrow-batched matmul UDF for
    Faiss-scale nlist (plan stays O(1)); final selection is two-phase
    top-k.
    """
    if len(centroids) > MAX_LITERAL_CENTROIDS:
        c = spread(corpus).withColumn("_cell", assign_centroid_udf(centroids)(F.col(vec_col)))
    else:
        c = spread(corpus).withColumn("_cell", assign_centroid_col(vec_col, centroids))
    q = _probe_queries(queries, centroids, nprobe, q_id_col, q_vec_col)
    score = cosine(q_vec_col, vec_col)
    if score_round is not None:
        # round BEFORE ranking (id tie-break) — oracle-stable ordering
        score = F.round(score, score_round)
    scored = c.join(
        F.broadcast(q), (F.col("_cell") == F.col("_qcell")) & (F.col(id_col) != F.col(q_id_col))
    ).select(q_id_col, id_col, score.alias("cos_sim"))
    return topk_per_query(scored, k, q_id_col, id_col, "cos_sim")


def _probe_queries(
    queries: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    q_id_col: str,
    q_vec_col: str,
) -> DataFrame:
    """(q_id, q_vec, _qcell) with one row per probed cell — literal-
    distance struct-sort for small nlist, Arrow matmul above
    MAX_LITERAL_CENTROIDS (identical cell order either way)."""
    if len(centroids) > MAX_LITERAL_CENTROIDS:
        return queries.select(
            q_id_col,
            q_vec_col,
            F.explode(nprobe_cells_udf(centroids, nprobe)(F.col(q_vec_col))).alias("_qcell"),
        )
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
    return q.select(q_id_col, q_vec_col, F.explode(cells).alias("_qcell"))


def sq8_codes(vec_col: str):
    """Per-vector symmetric int8 quantization: scale = max|x_i|, code_i =
    round(x_i·127/scale) ∈ [-127, 127] — the Faiss ScalarQuantizer
    QT_8bit analog (per-vector scale travels implicitly: the cosine of
    the codes is scale-invariant). The scale is let-bound (one evaluation
    per row — functions/expr.py::bind) so CollapseProject cannot re-run
    the array_max per element. Scoring then happens on INTEGER codes,
    which is what makes cross-engine parity robust: the quantized cosine
    is a pure function of exact ints."""
    from analytics_data_platform_spark.functions.expr import bind

    c = F.col(vec_col)
    scale = F.array_max(F.transform(c, lambda x: F.abs(x.cast("double"))))
    return bind(
        scale,
        lambda s: F.when(
            s > 0,
            F.transform(c, lambda x: F.round(x.cast("double") * 127.0 / s).cast("int")),
        ).otherwise(F.transform(c, lambda x: F.lit(0))),
    )


def int_sq_norm(col):
    """Exact integer squared norm of an int-code array (long fold)."""
    return F.aggregate(
        F.transform(col, lambda x: (x * x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sq8_cosine(q_codes: str, c_codes: str, q_sq: str, c_sq: str):
    """Cosine over int8 codes: integer dot product / sqrt of the exact
    integer squared norms — the only float ops are two sqrts and one
    division over exact ints, so rounded rankings cannot drift across
    engines. NULL (excluded by rank's NULLS LAST) on zero vectors."""
    idot = F.aggregate(
        F.zip_with(q_codes, c_codes, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.when(
        (F.col(q_sq) > 0) & (F.col(c_sq) > 0),
        idot
        / (F.sqrt(F.col(q_sq).cast("double")) * F.sqrt(F.col(c_sq).cast("double"))),
    )


def ivf_table_topk_sq8(
    io,
    table: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    score_round: int | None = 4,
) -> DataFrame:
    """IVF search against a CODED table layout (rows carry ``codes`` +
    ``c_sq`` instead of the float vector — the Faiss IVF,SQ8 storage):
    queries probe with full-precision centroid distances (standard
    layout — coarse-quantize originals, compress residents), are
    quantized with the SAME rule, and score as integer dot products over
    only the probed cells (dynamic partition pruning on ``_cell``, same
    contract as :func:`ivf_table_topk`)."""
    c = io.read(table)
    q = _probe_queries(queries, centroids, nprobe, q_id_col, q_vec_col)
    q = q.select(
        q_id_col, "_qcell", sq8_codes(q_vec_col).alias("_q_codes")
    ).withColumn("_q_sq", int_sq_norm("_q_codes"))
    score = sq8_cosine("_q_codes", "codes", "_q_sq", "c_sq")
    if score_round is not None:
        score = F.round(score, score_round)
    scored = c.join(
        F.broadcast(q),
        (F.col("_cell") == F.col("_qcell")) & (F.col(id_col) != F.col(q_id_col)),
    ).select(q_id_col, id_col, score.alias("cos_sim"))
    return topk_per_query(scored, k, q_id_col, id_col, "cos_sim")


def write_ivf_table(
    io,
    corpus: DataFrame,
    table: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus as an IVF index IN THE TABLE LAYOUT: rows are
    partitioned by nearest-centroid cell, so the inverted lists are
    parquet partitions and a probe is a partition prune, not a scan.

    This is the 100 TB form of the index — Faiss keeps inverted lists in
    RAM; a lakehouse keeps them as partition directories that any engine
    (and Spark's dynamic partition pruning) can skip without reading."""
    if len(centroids) > MAX_LITERAL_CENTROIDS:
        cell = assign_centroid_udf(centroids)(F.col(vec_col))
    else:
        cell = assign_centroid_col(vec_col, centroids)
    df = spread(corpus).withColumn("_cell", cell.cast("int"))
    io.write_table(df, table, mode="replace", partition_spec={"_cell": "identity"})


def ivf_table_topk(
    io,
    table: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    score_round: int | None = None,
) -> DataFrame:
    """IVF search against a :func:`write_ivf_table` layout.

    The probe side (queries × nprobe cells) broadcasts; joining it to the
    table on the PARTITION column lets dynamic partition pruning skip
    every unprobed cell directory at scan time — the executed plan reads
    only nprobe/nlist of the data, which a plan test asserts. Results are
    identical to :func:`ivf_topk` over the raw corpus with the same
    centroids (same assignment, same probe order, same two-phase top-k).
    """
    c = io.read(table)
    q = _probe_queries(queries, centroids, nprobe, q_id_col, q_vec_col)
    score = cosine(q_vec_col, vec_col)
    if score_round is not None:
        score = F.round(score, score_round)
    scored = c.join(
        F.broadcast(q), (F.col("_cell") == F.col("_qcell")) & (F.col(id_col) != F.col(q_id_col))
    ).select(q_id_col, id_col, score.alias("cos_sim"))
    return topk_per_query(scored, k, q_id_col, id_col, "cos_sim")


# --- embedding-cosine near-dup pairs --------------------------------------


def lsh_band_keys(
    vec_col: str, planes: list[list[float]], n_bands: int, bits_per_band: int
) -> Column:
    """Array of banded signature keys ('band,bitstring') — a pair is a
    near-dup CANDIDATE when ANY band matches (the OR-construction:
    P[candidate] = 1 − (1 − p^r)^b for per-bit agreement p)."""
    # one F.expr SQL string: the fluent build spent seconds of DRIVER
    # py4j time constructing n_bits×dim literal Columns. The expression
    # is semantically identical — in particular the dot product stays the
    # ORDERED zip_with+aggregate fold, so sign bits remain bit-stable
    # against the oracle's sequential list_sum.
    def bit_sql(p: list[float]) -> str:
        arr = "array(" + ", ".join(f"{float(x)!r}D" for x in p) + ")"
        d = (
            f"aggregate(zip_with({vec_col}, {arr}, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        return f"IF({d} >= 0.0D, '1', '0')"

    bands = []
    for b in range(n_bands):
        bits = ", ".join(
            bit_sql(p) for p in planes[b * bits_per_band : (b + 1) * bits_per_band]
        )
        bands.append(f"concat_ws(',', '{b}', concat({bits}))")
    return F.expr("array(" + ", ".join(bands) + ")")


def lsh_near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    n_bands: int = 8,
    bits_per_band: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_round: int | None = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded-LSH candidates +
    exact cosine verification.

    Scale design: candidates come from an any-band equi-join —
    O(Σ bucket²) not O(n²) — and the exact cosine runs on candidate pairs
    only (two semi-joins back to the corpus). The all-pairs form this
    replaces is the classic 100 TB anti-pattern. ``score_round`` rounds
    before the threshold so an external oracle filters identically.
    """
    planes = _hyperplanes(dim, n_bands * bits_per_band, seed)
    keys = lsh_band_keys(vec_col, planes, n_bands, bits_per_band)
    # both sides of the candidate self-join reference the banding; the
    # n_bands·bits_per_band interpreted projections are the expensive part,
    # so materialize them once instead of evaluating per join side
    banded = (
        spread(corpus)
        .select(F.col(id_col), F.explode(keys).alias("_bucket"))
        .localCheckpoint(eager=False)
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    ea = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_emb_a"))
    eb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_emb_b"))
    score = cosine("_emb_a", "_emb_b")
    if score_round is not None:
        score = F.round(score, score_round)
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select("id_a", "id_b", score.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


# --- multi-probe LSH ------------------------------------------------------


def _probe_signatures(vec_col: str, planes: list[list[float]], n_probes: int) -> Column:
    """Array of probe signatures: the base sign-bit signature plus
    ``n_probes`` variants with the LEAST-CONFIDENT bit flipped (smallest
    |projection| — the standard multi-probe heuristic). All JVM HOFs.
    """
    n = len(planes)
    dots = F.array(
        *[dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in p])) for p in planes]
    )
    # bit characters of the base signature, as an array for per-index flips
    bits = F.transform(dots, lambda d: F.when(d >= 0, "1").otherwise("0"))
    # plane indices ordered by |projection| ascending (least confident first)
    order = F.transform(
        F.array_sort(
            F.zip_with(
                F.transform(dots, lambda d: F.abs(d)),
                F.sequence(F.lit(0), F.lit(n - 1)),
                lambda a, i: F.struct(a.alias("a"), i.alias("i")),
            )
        ),
        lambda s: s["i"],
    )
    flips = F.slice(order, 1, n_probes)
    probes = F.concat(
        F.array(F.array_join(bits, "")),
        F.transform(
            flips,
            lambda fi: F.array_join(
                F.zip_with(
                    bits,
                    F.sequence(F.lit(0), F.lit(n - 1)),
                    lambda ch, k: F.when(k == fi, F.when(ch == "1", "0").otherwise("1")).otherwise(ch),
                ),
                "",
            ),
        ),
    )
    return probes


def lsh_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 12,
    n_probes: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
    seed: int = 42,
    score_round: int | None = None,
) -> DataFrame:
    """Multi-probe LSH top-k: each query probes its own bucket plus the
    ``n_probes`` buckets reached by flipping its least-confident sign bits.

    Recall rises toward brute-force at the cost of (n_probes+1)× the probe
    rows on the (broadcast, tiny) query side — the corpus side is still
    hashed ONCE and joined by signature equality, so the scan/shuffle
    profile is identical to single-probe; candidates stay deduplicated by
    construction (probe signatures of one query are distinct, and a corpus
    vector has exactly one signature).
    """
    planes = _hyperplanes(dim, n_bits, seed)
    c = spread(corpus).withColumn("_sig", lsh_signature_col(vec_col, planes))
    q = queries.select(
        q_id_col,
        q_vec_col,
        F.explode(_probe_signatures(q_vec_col, planes, n_probes)).alias("_qsig"),
    )
    score = cosine(q_vec_col, vec_col)
    if score_round is not None:
        score = F.round(score, score_round)
    scored = c.join(
        F.broadcast(q),
        (F.col("_sig") == F.col("_qsig")) & (F.col(id_col) != F.col(q_id_col)),
    ).select(q_id_col, id_col, score.alias("cos_sim"))
    return topk_per_query(scored, k, q_id_col, id_col, "cos_sim")


# --- product quantization (PQ) --------------------------------------------


def _kmeans_np(vecs, k: int, max_iter: int, seed: int):
    rng = np.random.RandomState(seed)
    cents = vecs[rng.choice(len(vecs), size=min(k, len(vecs)), replace=False)].astype(np.float64)
    for _ in range(max_iter):
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = vecs[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    max_iter: int = 10,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split the vector into ``m``
    subspaces of dim/m and k-means each on a bounded driver sample —
    Faiss-style PQ training (driver memory O(sample), like IVF)."""
    if dim % m:
        raise ValueError("dim must be divisible by m")
    dsub = dim // m
    vecs = np.array(corpus.select(vec_col).limit(k * 256).toPandas()[vec_col].tolist())
    books = []
    for j in range(m):
        sub = vecs[:, j * dsub : (j + 1) * dsub]
        books.append(_kmeans_np(sub, k, max_iter, seed + j).round(6).tolist())
    return books


def pq_encode_col(vec_col: str, codebooks: list[list[list[float]]]):
    """Code array (m int8-range entries): per-subspace argmin over the
    sub-codebook — pure JVM literal expressions (m×k×dsub literal nodes;
    at Faiss-scale k=256 switch to a pandas_udf as with IVF centroids)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = []
    for j, book in enumerate(codebooks):
        sub = F.slice(F.col(vec_col), j * dsub + 1, dsub)
        dists = [
            F.aggregate(
                F.zip_with(
                    sub,
                    F.array(*[F.lit(float(x)) for x in cent]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for cent in book
        ]
        best = F.array_position(
            F.array(*dists), F.array_min(F.array(*dists))
        ) - 1  # 0-based code
        codes.append(best.cast("int"))
    return F.array(*codes)


def pq_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine: int = 4,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC).

    The corpus is scanned ONCE as compact codes (m bytes per vector, a
    64x compression at m=8 over 64 floats); each query contributes an
    m×k lookup table of exact partial distances (computed on the driver
    with numpy), and the scan scores a vector as the sum of m table
    lookups — no float vector math per candidate. Selection is the same
    two-phase top-k as every other ANN path. This is the memory-bound
    regime's answer at 100 TB: the code table fits where raw vectors
    cannot.

    ``refine`` (Faiss-style refine stage): ADC quantization cannot rank
    within a tight cluster — many vectors share identical codes, so the
    top-k boundary is an arbitrary tie-break. The scan therefore keeps
    ``k × refine`` ADC candidates per query and re-ranks ONLY those with
    exact L2 against the raw vectors (a semi-join back to the corpus —
    touches k×refine×queries vectors, not the corpus). ``refine=1``
    disables re-ranking (pure ADC).
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    coded = spread(corpus).select(id_col, pq_encode_col(vec_col, codebooks).alias("_codes"))

    rows = []
    for q_id, q in queries:
        qv = np.asarray(q, dtype=np.float64)
        lut = [
            [
                float(((qv[j * dsub : (j + 1) * dsub] - np.asarray(c)) ** 2).sum())
                for c in codebooks[j]
            ]
            for j in range(m)
        ]
        rows.append((q_id, lut))
    luts = corpus.sparkSession.createDataFrame(
        rows, f"q_id long, lut array<array<double>>"
    )

    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.element_at("lut", j + 1), F.element_at("_codes", j + 1) + 1
        ),
    )
    scored = coded.join(F.broadcast(luts)).select(
        "q_id", id_col, F.round(-adc, 6).alias("neg_dist")
    )
    if refine <= 1:
        return topk_per_query(scored, k, "q_id", id_col, "neg_dist")

    cands = topk_per_query(scored, k * refine, "q_id", id_col, "neg_dist").select(
        "q_id", id_col
    )
    qdf = corpus.sparkSession.createDataFrame(
        [(qid, [float(x) for x in qv]) for qid, qv in queries],
        "q_id long, q_emb array<double>",
    )
    exact = (
        cands.join(corpus.select(id_col, vec_col), id_col)
        .join(F.broadcast(qdf), "q_id")
        .select(
            "q_id",
            id_col,
            F.round(
                -F.aggregate(
                    F.zip_with(
                        F.col(vec_col).cast("array<double>"),
                        "q_emb",
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("neg_dist"),
        )
    )
    return topk_per_query(exact, k, "q_id", id_col, "neg_dist")


def ivfpq_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: coarse cell pruning, then ADC over codes, then exact
    refine — the composition Faiss ships as its workhorse index.

    The scan touches only the ``nprobe`` nearest cells per query (at
    scale: partition pruning on a ``_cell``-partitioned table), scores
    survivors from m-byte PQ codes via per-query lookup tables, and
    re-ranks the k×refine ADC winners with exact L2. Each stage reuses
    the standalone operator (assign_centroid / pq_encode_col / two-phase
    top-k) — this function is only the composition.
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    assigned = spread(corpus).withColumn("_cell", assign_centroid_col(vec_col, centroids))
    coded = assigned.select(
        id_col, "_cell", pq_encode_col(vec_col, codebooks).alias("_codes")
    )

    cents = np.asarray(centroids, dtype=np.float64)
    rows = []
    for q_id, q in queries:
        qv = np.asarray(q, dtype=np.float64)
        cells = np.argsort(((cents - qv) ** 2).sum(axis=1))[:nprobe]
        lut = [
            [
                float(((qv[j * dsub : (j + 1) * dsub] - np.asarray(c)) ** 2).sum())
                for c in codebooks[j]
            ]
            for j in range(m)
        ]
        for cell in cells:
            rows.append((q_id, int(cell), lut))
    probes = corpus.sparkSession.createDataFrame(
        rows, "q_id long, _cell int, lut array<array<double>>"
    )

    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(F.element_at("lut", j + 1), F.element_at("_codes", j + 1) + 1),
    )
    scored = coded.join(F.broadcast(probes), "_cell").select(
        "q_id", id_col, F.round(-adc, 6).alias("neg_dist")
    )
    cands = topk_per_query(scored, k * refine, "q_id", id_col, "neg_dist").select(
        "q_id", id_col
    )
    qdf = corpus.sparkSession.createDataFrame(
        [(qid, [float(x) for x in qv]) for qid, qv in queries],
        "q_id long, q_emb array<double>",
    )
    exact = (
        cands.join(corpus.select(id_col, vec_col), id_col)
        .join(F.broadcast(qdf), "q_id")
        .select(
            "q_id",
            id_col,
            F.round(
                -F.aggregate(
                    F.zip_with(
                        F.col(vec_col).cast("array<double>"),
                        "q_emb",
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("neg_dist"),
        )
    )
    return topk_per_query(exact, k, "q_id", id_col, "neg_dist")


def brute_force_topk_numpy(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_emb",
) -> DataFrame:
    """Exact cosine top-k with a FUSED Arrow scorer: one ``mapInPandas``
    pass does the dense math (numpy matmul against the in-closure query
    matrix) AND the phase-1 top-k prune, so only k rows per (partition,
    query) ever shuffle.

    The JVM path (:func:`brute_force_topk`) evaluates the dot product as
    an interpreted higher-order-function fold per pair — fine for narrow
    query sets, but dense linear algebra is where vectorized BLAS wins:
    one b×d @ d×q matmul per Arrow batch replaces b·q interpreted folds.
    The query set must be small (it is collected into the closure — the
    same boundedness assumption F.broadcast makes on the JVM path).

    Scores are rounded to 4dp with id tie-break before ranking — the
    contract of the oracle-pinned registry query (queries.vector_ops.
    ann_cosine_topk), so this path is its drop-in accelerated twin. The
    raw :func:`brute_force_topk` ranks on UNROUNDED scores and may order
    4dp-ties differently.
    """
    q_rows = queries.select(q_id_col, q_vec_col).collect()
    if not q_rows:
        return brute_force_topk(corpus, queries, k, id_col, vec_col, q_id_col, q_vec_col)
    q_ids = np.array([r[0] for r in q_rows])
    Q = np.asarray([r[1] for r in q_rows], dtype=np.float64)  # nq×d
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0.0] = np.inf  # zero-norm query scores 0 everywhere
    Qt = Q.T

    out_schema = f"{q_id_col} long, {id_col} long, cos_sim double"

    def score(batches):
        best: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(list(pdf[vec_col]), dtype=np.float64)  # b×d
            vn = np.linalg.norm(V, axis=1)
            vn[vn == 0.0] = np.inf
            S = (V @ Qt) / vn[:, None] / qn[None, :]  # b×nq
            ids = pdf[id_col].to_numpy()
            for j, qid in enumerate(q_ids):
                s = np.round(S[:, j], 4)
                keep = ids != qid  # exclude self-match
                grp = pd.DataFrame(
                    {q_id_col: qid, id_col: ids[keep], "cos_sim": s[keep]}
                )
                cur = best.get(qid)
                merged = (
                    grp
                    if cur is None
                    else pd.concat((cur, grp), ignore_index=True)
                )
                merged = merged.sort_values(
                    ["cos_sim", id_col], ascending=[False, True], kind="mergesort"
                )
                best[qid] = merged.head(k)
        if best:
            yield pd.concat(best.values(), ignore_index=True)

    pruned = spread(corpus.select(id_col, vec_col)).mapInPandas(score, out_schema)
    w = Window.partitionBy(q_id_col).orderBy(
        F.desc_nulls_last("cos_sim"), F.asc(id_col)
    )
    return pruned.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def self_nearest_neighbor(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact cosine 1-NN for EVERY vector (corpus against itself) with
    the fused Arrow scorer — the embedding data-quality screen shape.

    The JVM formulation of all-pairs 1-NN is a non-equi self-join
    (BroadcastNestedLoopJoin) evaluating an interpreted HOF fold per
    pair: n² folds (30 s for n=2000 at sf0.1). Here the id-ASCENDING
    corpus matrix rides the serialized closure (one copy per executor —
    the same boundedness assumption the BNLJ's broadcast side already
    made), each Arrow batch does ONE b×d @ d×n BLAS matmul, rounds to
    4dp, masks self, and emits exactly one row per vector; because
    columns sit in ascending-id order, numpy's first-argmax IS the
    min-id tie-break on the rounded score. Only n rows ever shuffle.

    Beyond closure-broadcast size, screen with LSH/IVF candidate pairs +
    exact refine (the lsh/ivf paths above) — this exact variant is the
    oracle baseline, the same split as brute_force vs IVF top-k.
    """
    rows = corpus.select(id_col, vec_col).orderBy(id_col).collect()
    ids = np.array([r[0] for r in rows])
    M = np.asarray([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0.0] = np.inf
    Mt = (M / norms[:, None]).T  # d×n, unit columns in ascending-id order

    fields = {f.name: f.dataType.simpleString() for f in corpus.schema.fields}
    out_schema = ", ".join(
        [f"{id_col} {fields[id_col]}"]
        + [f"{c} {fields[c]}" for c in carry_cols]
        + ["nn_id " + fields[id_col], "nn_sim double"]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            qn = np.linalg.norm(Q, axis=1)
            qn[qn == 0.0] = np.inf
            S = (Q / qn[:, None]) @ Mt  # b×n
            np.round(S, 4, out=S)
            qids = pdf[id_col].to_numpy()
            pos = np.searchsorted(ids, qids)
            hit = (pos < len(ids)) & (ids[np.minimum(pos, len(ids) - 1)] == qids)
            S[np.arange(len(qids))[hit], pos[hit]] = -np.inf  # mask self
            best = S.argmax(axis=1)
            out = pdf[[id_col, *carry_cols]].copy()
            out["nn_id"] = ids[best]
            out["nn_sim"] = S[np.arange(len(qids)), best]
            yield out

    slim = corpus.select(id_col, *carry_cols, vec_col)
    return spread(slim).mapInPandas(score, out_schema)
