"""Deterministic, engine-portable sketches: HyperLogLog, count-min, Bloom.

Classic cardinality / frequency / membership sketches built ONLY from
md5-derived integer hashes — ``conv(substr(md5(s),1,8),16,10)`` in Spark
is bit-identical to ``('0x'||substr(md5(s),1,8))::BIGINT`` in DuckDB — so
an external engine can rebuild the exact same sketch state from the same
rows. That turns "approximate" operators into hard oracle rows: the
estimate is approximate w.r.t. the true value, but exactly reproducible.

All constructions are single-pass groupBy aggregations over hashed rows
(register/bucket space is tiny and fixed), so they scale as one shuffle
whose output is O(m) per group — the canonical 100 TB cardinality plan.

Float determinism in the HLL estimator: the register sum Σ 2^-M_j is a
sum of dyadic rationals spanning < 32 powers of two, so every partial sum
is exactly representable — the fold order (which Spark does not fix)
cannot change the result. The only non-dyadic step is the final
alpha·m²/S division (and ln() in the linear-counting branch), identical
expression trees on both engines, rounded before comparison.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# ---- portable 32-bit hash -------------------------------------------------


def h32(s: Column) -> Column:
    """First 32 bits of md5(s) as a non-negative BIGINT (engine-portable)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def h32_sql(s: str) -> str:
    """DuckDB rendering of :func:`h32` over SQL fragment ``s``."""
    return f"('0x' || substr(md5({s}), 1, 8))::BIGINT"


# ---- HyperLogLog ----------------------------------------------------------

HLL_P = 7  # 2^7 = 128 registers
HLL_M = 1 << HLL_P
HLL_REM_BITS = 32 - HLL_P
# Flajolet et al. bias constant for m >= 128; embedded as the SAME Python
# float literal in the generated oracle SQL so both engines multiply by
# the identical double.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_registers(df: DataFrame, item: Column, *group_cols: str) -> DataFrame:
    """Per-group HLL registers: (group..., idx, mj) with mj = max rank.

    idx = top ``HLL_P`` hash bits; rank rho = 1 + leading zeros of the
    remaining ``HLL_REM_BITS`` bits, computed via minimal-binary-string
    length (``bin()`` is minimal in both Spark and DuckDB) — no float
    log2 edge cases.
    """
    h = h32(item)
    idx = (h / F.lit(1 << HLL_REM_BITS)).cast("bigint")  # exact: h < 2^32 < 2^53
    rem = h % F.lit(1 << HLL_REM_BITS)
    rho = F.when(rem == 0, F.lit(HLL_REM_BITS + 1)).otherwise(
        F.lit(HLL_REM_BITS + 1) - F.length(F.bin(rem))
    )
    return (
        df.select(*group_cols, idx.alias("idx"), rho.alias("rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("mj"))
    )


def hll_estimate(registers: DataFrame, *group_cols: str) -> DataFrame:
    """Fold registers into (group..., v_empty, est_distinct).

    Raw estimate alpha·m²/S with S = Σ 2^-M_j (+1 per empty register);
    small-range (linear counting) correction m·ln(m/V) when the raw
    estimate is under 2.5m and V empty registers remain.
    """
    per_group = registers.groupBy(*group_cols).agg(
        F.count("*").alias("used"),
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("s_present"),
    )
    v = F.lit(HLL_M) - F.col("used")
    s_all = F.col("s_present") + v.cast("double")
    e_raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / s_all
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(e_raw)
    return per_group.select(
        *group_cols,
        v.alias("v_empty"),
        F.round(est, 4).alias("est_distinct"),
    )


def hll_sql(item: str, group_col: str, source_cte: str) -> str:
    """DuckDB mirror of registers+estimate over CTE ``source_cte`` which
    must yield columns (``group_col``, ``item``)."""
    rem_bits = HLL_REM_BITS
    return f"""
hashed AS (
  SELECT {group_col},
         ({h32_sql(item)} // {1 << rem_bits}) AS idx,
         ({h32_sql(item)} % {1 << rem_bits}) AS rem
  FROM {source_cte}
),
regs AS (
  SELECT {group_col}, idx,
         MAX(CASE WHEN rem = 0 THEN {rem_bits + 1}
                  ELSE {rem_bits + 1} - length(bin(rem)) END) AS mj
  FROM hashed GROUP BY {group_col}, idx
),
folded AS (
  SELECT {group_col}, COUNT(*) AS used,
         SUM(power(2.0, -mj)) AS s_present
  FROM regs GROUP BY {group_col}
),
hll AS (
  SELECT {group_col},
         ({HLL_M} - used) AS v_empty,
         ROUND(
           CASE WHEN CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M}
                     / (s_present + CAST({HLL_M} - used AS DOUBLE)) <= CAST({2.5 * HLL_M!r} AS DOUBLE)
                 AND ({HLL_M} - used) > 0
                THEN CAST({HLL_M} AS DOUBLE) * LN(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - used))
                ELSE CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M}
                     / (s_present + CAST({HLL_M} - used AS DOUBLE))
           END, 4) AS est_distinct
  FROM folded
)
"""


# ---- count-min sketch -----------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket(item: Column, row: Column) -> Column:
    """Bucket of ``item`` in sketch row ``row`` (salted md5 % width)."""
    return (
        h32(F.concat(F.lit("cms"), row.cast("string"), F.lit(":"), item))
        % F.lit(CMS_WIDTH)
    )


def cms_build(counts: DataFrame, item_col: str, count_col: str) -> DataFrame:
    """(row, bucket, bsum): the d×w sketch from per-item counts.

    Input is the per-item aggregate (vocab-sized), so the 4× row
    expansion happens AFTER the corpus-sized shuffle, not before.
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("row")
    return (
        counts.select(F.col(item_col), F.col(count_col), rows)
        .select(
            "row",
            cms_bucket(F.col(item_col), F.col("row")).alias("bucket"),
            F.col(count_col),
        )
        .groupBy("row", "bucket")
        .agg(F.sum(count_col).alias("bsum"))
    )


def cms_query(sketch: DataFrame, probes: DataFrame, item_col: str) -> DataFrame:
    """(item, est_count): min over rows of the probed buckets.

    Empty buckets read as 0; the sketch (≤ d·w rows) broadcasts.
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])).alias("row")
    probed = probes.select(F.col(item_col), rows).select(
        item_col,
        "row",
        cms_bucket(F.col(item_col), F.col("row")).alias("bucket"),
    )
    return (
        probed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .select(item_col, F.coalesce(F.col("bsum"), F.lit(0)).alias("b"))
        .groupBy(item_col)
        .agg(F.min("b").alias("est_count"))
    )


# ---- Bloom filter ---------------------------------------------------------

BLOOM_K = 3
BLOOM_BITS = 4096


def bloom_positions(item: Column) -> Column:
    """Array of the k bit positions of ``item`` (salted md5 % bits)."""
    return F.array(
        *[
            h32(F.concat(F.lit("bloom"), F.lit(str(j)), F.lit(":"), item))
            % F.lit(BLOOM_BITS)
            for j in range(BLOOM_K)
        ]
    )


def bloom_build(df: DataFrame, item: Column) -> DataFrame:
    """(pos): the distinct set bit positions for the member set."""
    return (
        df.select(F.explode(bloom_positions(item)).alias("pos")).distinct()
    )


def bloom_maybe_contains(
    candidates: DataFrame, item_col: str, bloom: DataFrame
) -> DataFrame:
    """Adds ``maybe_member``: true iff ALL k positions are set.

    Implemented as position explode → broadcast semi-join against the
    set-bit table → per-candidate match count == k. Integer-only, so the
    verdict (including false positives) is exactly reproducible.
    """
    keys = [c for c in candidates.columns]
    exploded = candidates.select(
        *keys, F.explode(bloom_positions(F.col(item_col))).alias("pos")
    )
    matched = (
        exploded.join(F.broadcast(bloom), "pos")
        .groupBy(*keys)
        .agg(F.count("*").alias("_hits"))
    )
    return (
        candidates.join(matched, keys, "left")
        .select(
            *keys,
            (F.coalesce(F.col("_hits"), F.lit(0)) == BLOOM_K).alias("maybe_member"),
        )
    )


def bloom_positions_sql(item: str) -> str:
    """DuckDB list of the k positions for fragment ``item``."""
    parts = ", ".join(
        "({h} % {m})".format(h=h32_sql(f"'bloom{j}:' || {item}"), m=BLOOM_BITS)
        for j in range(BLOOM_K)
    )
    return f"[{parts}]"


# --------------------------------------------------------------------------
# Misra-Gries heavy-hitter candidates (deterministic frequent-items sketch)
# --------------------------------------------------------------------------

MG_CAPACITY = 64


def mg_candidates(token_arrays: "DataFrame", capacity: int = MG_CAPACITY) -> "DataFrame":
    """Per-partition Misra-Gries summaries over a column ``t`` of token
    arrays → the distinct union of surviving tokens (column ``token``).

    The 100 TB heavy-hitter plan is two-phase: this candidate pass keeps
    only ``capacity`` counters per partition (fixed memory, zero shuffle —
    each partition emits ≤ capacity rows), then the caller exact-counts
    ONLY the candidates, so the count shuffle is O(|candidates|), never
    O(|vocab|). Misra-Gries guarantees every token with partition
    frequency > n_p/(capacity+1) survives locally; any token with GLOBAL
    frequency > n/k (k ≤ capacity) must exceed n_p/k ≥ n_p/(capacity+1)
    in at least one partition, so the union is a superset of every true
    heavy hitter REGARDLESS of partitioning — the exact verify pass then
    makes the final answer deterministic. Python is the right tool here:
    the decrement-all counter state is inherently sequential per
    partition, and the Arrow batches keep transfer columnar (same
    allowlist rationale as the greedy packer, operators/packing.py).
    """

    def gen(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for toks in pdf["t"]:
                for tok in toks:
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < capacity:
                        counters[tok] = 1
                    else:
                        # decrement-all: the O(capacity) amortized step
                        dead = []
                        for w in counters:
                            counters[w] -= 1
                            if counters[w] == 0:
                                dead.append(w)
                        for w in dead:
                            del counters[w]
        yield pd.DataFrame({"token": list(counters)})

    return token_arrays.select("t").mapInPandas(gen, "token string").distinct()
