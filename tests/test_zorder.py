"""Z-order clustering: Morton key correctness vs a Python reference, and
the data-skipping payoff measured from real parquet footer statistics."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from analytics_data_platform_spark.tables.zorder import (
    morton_key,
    with_zorder_key,
    write_zordered,
)


def _morton_ref(xs: list[int], bits: int) -> int:
    z = 0
    for j in range(bits):
        for i, x in enumerate(xs):
            z |= ((x >> j) & 1) << (j * len(xs) + i)
    return z


def test_morton_key_matches_reference(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", morton_key([F.col("x"), F.col("y")], bits=3)
    ).collect()
    for r in got:
        assert r["_zorder"] == _morton_ref([r.x, r.y], 3), (r.x, r.y)


def test_with_zorder_key_scales_full_range(spark):
    df = spark.range(0, 1024).select(
        F.col("id").alias("a"), (1023 - F.col("id")).alias("b")
    )
    keyed = with_zorder_key(df, ["a", "b"], bits=10)
    mm = keyed.agg(F.min("_zorder"), F.max("_zorder")).collect()[0]
    assert mm[0] >= 0
    assert mm[1] <= (1 << 20) - 1
    assert keyed.select("_zorder").distinct().count() > 1000  # keys spread


def _files_possibly_matching(path: str, col_bounds: dict[str, tuple]) -> tuple[int, int]:
    """(files whose footer stats intersect ALL bounds, total files)."""
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    hits = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        intersects = True
        for ci in range(md.num_columns):
            col = md.row_group(0).column(ci)
            name = col.path_in_schema
            if name not in col_bounds:
                continue
            lo, hi = col_bounds[name]
            cmin = min(md.row_group(g).column(ci).statistics.min for g in range(md.num_row_groups))
            cmax = max(md.row_group(g).column(ci).statistics.max for g in range(md.num_row_groups))
            if cmax < lo or cmin > hi:
                intersects = False
        if intersects:
            hits += 1
    return hits, len(files)


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """A box predicate on (x, y) must stats-prune most z-ordered files;
    an x-only sort layout cannot prune on y."""
    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        F.floor(F.col("id") / 128).alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, ["x", "y"], n_files=16, bits=10)

    xpath = str(tmp_path / "xsort")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xpath)

    box = {"x": (10, 25), "y": (10, 25)}
    z_hits, z_total = _files_possibly_matching(zpath, box)
    x_hits, x_total = _files_possibly_matching(xpath, box)
    assert z_total == 16 and x_total == 16
    # z-order: the box lives in a few z-ranges
    assert z_hits <= 4, f"z-order pruned too little: {z_hits}/{z_total}"
    # x-sort prunes on x but each x-file spans all y -> no better than x alone
    assert z_hits < x_hits or x_hits >= 2

    # correctness: the clustered table still contains exactly the box rows
    got = (
        spark.read.parquet(zpath)
        .where((F.col("x").between(10, 25)) & (F.col("y").between(10, 25)))
        .count()
    )
    want = df.where((F.col("x").between(10, 25)) & (F.col("y").between(10, 25))).count()
    assert got == want


def test_zorder_key_rejects_too_many_bits(spark):
    df = spark.range(4).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError, match="64-bit"):
        with_zorder_key(df, ["a", "b"], bits=32)
