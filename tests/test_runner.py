"""Runner semantics — ports the reference's runner unit tests
(reference: elt-common/tests/unit_tests/test_runner.py:76-205 with the
fake extractors in runner_extractor_fakes/)."""

from __future__ import annotations

import uuid

import pytest
import pyspark.sql.functions as F

from analytics_data_platform_spark.elt.extract import Extract, ResourceProperties, Watermark
from analytics_data_platform_spark.elt.runner import run_ingest
from analytics_data_platform_spark.tables.io import TableIO


@pytest.fixture()
def ns(spark):
    io = TableIO(spark)
    name = f"r_{uuid.uuid4().hex[:8]}"
    yield name
    io.drop_namespace(name)


class AllWriteModes(Extract):
    """reference runner_extractor_fakes/all_write_modes.py:10-52 —
    append/replace/merge routing + an empty chunk that must be skipped."""

    def __init__(self, spark):
        self.spark = spark

    def extract_resource_properties(self):
        mk = lambda rows: self.spark.createDataFrame(rows, ["name"])
        yield "appended", ResourceProperties(lambda wm: iter([mk([("a1",)]), mk([("a2",)])]))
        yield "replaced", ResourceProperties(
            lambda wm: iter([mk([("r1",)])]), write_mode="replace"
        )
        empty = mk([("x",)]).where(F.lit(False))
        yield "skipped", ResourceProperties(lambda wm: iter([empty]))


def test_write_mode_routing(spark, ns):
    stats = run_ingest(spark, AllWriteModes(spark), ns)
    io = TableIO(spark)
    assert io.read(f"{ns}.appended").count() == 2
    assert io.read(f"{ns}.replaced").count() == 1
    assert not io.table_exists(f"{ns}.skipped")
    assert stats.resources["skipped"].chunks == 0


class ReplaceMultipleYield(Extract):
    """reference runner_extractor_fakes/replace_multiple_yield.py —
    replace mode with 2 chunks: first replaces, second appends
    (runner.py:79-84; tested test_runner.py:181-205)."""

    def __init__(self, spark):
        self.spark = spark

    def extract_resource_properties(self):
        c1 = self.spark.range(500).select(F.col("id"))
        c2 = self.spark.range(500, 600).select(F.col("id"))
        yield "replaced_chunks", ResourceProperties(
            lambda wm: iter([c1, c2]), write_mode="replace"
        )


def test_replace_first_chunk_rule(spark, ns):
    # pre-seed with stale data that the first chunk must wipe
    io = TableIO(spark)
    io.ensure_namespace(ns)
    io.write_table(spark.range(9999, 10049).select("id"), f"{ns}.replaced_chunks")
    run_ingest(spark, ReplaceMultipleYield(spark), ns)
    out = io.read(f"{ns}.replaced_chunks")
    assert out.count() == 600  # 500 replaced + 100 appended, stale 50 gone
    assert out.agg(F.max("id")).collect()[0][0] == 599


class WatermarkHandling(Extract):
    """reference runner_extractor_fakes/watermark_handling.py:12-70 —
    watermark create, incremental filter, out-of-order max correction."""

    def __init__(self, spark, run: int):
        self.spark = spark
        self.run = run
        self.seen_watermark: Watermark | None = None

    def extract_resource_properties(self):
        def extractor(wm):
            self.seen_watermark = wm
            if self.run == 1:
                # chunks out of order: max id 1000 arrives BEFORE max id 500
                yield self.spark.range(501, 1001).select(F.col("id"), F.lit("c1").alias("v"))
                yield self.spark.range(1, 501).select(F.col("id"), F.lit("c2").alias("v"))
            else:
                lo = int(wm.value) + 1 if wm else 1
                yield self.spark.range(lo, lo + 20).select(F.col("id"), F.lit("c3").alias("v"))

        yield "wm_items", ResourceProperties(extractor, watermark_column="id")


def test_watermark_lifecycle_and_out_of_order_max(spark, ns):
    io = TableIO(spark)

    ex1 = WatermarkHandling(spark, run=1)
    s1 = run_ingest(spark, ex1, ns)
    assert ex1.seen_watermark is None  # first run: no prior watermark
    # out-of-order chunks: persisted watermark must be the TRUE max (1000)
    assert io.get_watermark_json(f"{ns}.wm_items") == {"column": "id", "value": 1000}
    assert s1.resources["wm_items"].rows == 1000

    ex2 = WatermarkHandling(spark, run=2)
    run_ingest(spark, ex2, ns)
    assert ex2.seen_watermark is not None
    assert ex2.seen_watermark.value == 1000  # handed to extractor for filtering
    assert io.get_watermark_json(f"{ns}.wm_items") == {"column": "id", "value": 1020}
    assert io.read(f"{ns}.wm_items").count() == 1020


class MergeIncremental(Extract):
    """nruns=2 incremental merge pattern (reference warehouse e2e
    test_extract_and_load.py:49-60: source mutated, pipeline re-run,
    merge keeps keys unique)."""

    def __init__(self, spark, run: int):
        self.spark = spark
        self.run = run

    def extract_resource_properties(self):
        if self.run == 1:
            rows = [(i, f"v{i}", i) for i in range(1, 6)]
        else:
            rows = [(3, "v3-updated", 7), (6, "v6", 8)]
        df = self.spark.createDataFrame(rows, ["entry_id", "comment", "changed_seq"])
        yield "entries", ResourceProperties(
            lambda wm: iter([df]),
            write_mode="merge",
            merge_on=["entry_id"],
            watermark_column="changed_seq",
        )


def test_incremental_merge_rerun_idempotent_keys(spark, ns):
    io = TableIO(spark)
    run_ingest(spark, MergeIncremental(spark, 1), ns)
    run_ingest(spark, MergeIncremental(spark, 2), ns)
    out = io.read(f"{ns}.entries")
    assert out.count() == 6
    assert out.select("entry_id").distinct().count() == 6  # uniqueness after re-run
    assert out.where(F.col("entry_id") == 3).collect()[0]["comment"] == "v3-updated"
    assert io.get_watermark_json(f"{ns}.entries") == {"column": "changed_seq", "value": 8}


class CountedEvaluations(Extract):
    """Instrumented source: a Spark accumulator counts every row the
    extractor actually PRODUCES across all evaluations of the chunk."""

    def __init__(self, spark, acc, n=1000):
        self.spark = spark
        self.acc = acc
        self.n = n

    def extract_resource_properties(self):
        acc, n = self.acc, self.n

        def build(wm):
            def gen(part):
                for i in part:
                    acc.add(1)
                    yield (i, f"row{i}")

            rdd = self.spark.sparkContext.parallelize(range(n), 4).mapPartitions(
                lambda p: gen(p)
            )
            return iter([self.spark.createDataFrame(rdd, ["id", "payload"])])

        yield "observed", ResourceProperties(build, watermark_column="id")


def test_append_stats_ride_the_write_job_single_evaluation(spark, ns):
    """The observe path must NOT re-evaluate the source for stats: rows
    produced ≈ rows written (+ the LIMIT-1 emptiness probe's partial
    partition), strictly below the 2N a count-then-write sequence costs —
    and with no persist of the chunk (at 100 TB chunks, caching data just
    to learn count+max writes it twice)."""
    n = 1000
    acc = spark.sparkContext.accumulator(0)
    io = TableIO(spark)
    stats = run_ingest(spark, CountedEvaluations(spark, acc, n), ns)
    assert stats.resources["observed"].rows == n  # count came from observe
    assert io.get_watermark_json(f"{ns}.observed") == {"column": "id", "value": n - 1}
    assert io.read(f"{ns}.observed").count() == n
    # one full evaluation + at most one partition's worth for isEmpty()
    assert n <= acc.value <= n + n // 4 + 1, acc.value
