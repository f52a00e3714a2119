"""Blue/green serving (operators/serving_refs.py): hardlink clones must
share bytes without sharing FATE — any rewrite in one tree (append,
apply_deletes, reshard, retrain) must leave the sibling's serving
bit-for-bit unchanged, because both index classes replace files rather
than modify them. The ref flip is the zero-downtime growth path the
in-place swap's rename window cannot offer a serving replica."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from analytics_data_platform_spark.operators.search_index import SearchIndex
from analytics_data_platform_spark.operators.serving_refs import (
    ServingRefs,
    clone_index,
)
from analytics_data_platform_spark.operators.vector_index import VectorIndex
from analytics_data_platform_spark.queries.search_ops import QUERY_TERMS
from analytics_data_platform_spark.sources.testdata import load_table


def test_blue_green_reshard_leaves_blue_untouched(spark, tmp_path, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    blue = str(tmp_path / "blue")
    green = str(tmp_path / "green")
    idx = SearchIndex(spark, blue, mode="scored", buckets=8).build(
        d.where(F.col("doc_id") % 2 == 0)
    )
    idx.append(d.where(F.col("doc_id") % 2 == 1))
    idx.delete_docs(d.where(F.col("doc_id") % 23 == 5).select("doc_id"))
    want = {tuple(r) for r in idx.bm25(QUERY_TERMS).collect()}

    refs = ServingRefs(str(tmp_path))
    refs.set_ref("prod", blue)

    clone_index(blue, green)
    g = SearchIndex(spark, green, mode="scored", buckets=8)
    assert {tuple(r) for r in g.bm25(QUERY_TERMS).collect()} == want

    # grow + materialize + compact the GREEN tree; blue must not notice
    g.reshard(48)
    g.apply_deletes()
    g.compact()
    assert {tuple(r) for r in g.bm25(QUERY_TERMS).collect()} == want
    blue_again = SearchIndex(spark, blue, mode="scored", buckets=8)
    assert blue_again.buckets == 8
    assert {tuple(r) for r in blue_again.bm25(QUERY_TERMS).collect()} == want
    assert blue_again._delete_ids() is not None, "blue keeps its own sidecar"

    # atomic flip: prod resolves to the grown tree
    assert refs.resolve("prod") == os.path.abspath(blue)
    refs.set_ref("prod", green)
    assert refs.resolve("prod") == os.path.abspath(green)
    served = SearchIndex(spark, refs.resolve("prod"), mode="scored", buckets=48)
    assert {tuple(r) for r in served.bm25(QUERY_TERMS).collect()} == want
    refs.drop_ref("prod")
    with pytest.raises(KeyError, match="prod"):
        refs.resolve("prod")


def test_blue_green_retrain_vector_tier(spark, tmp_path, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    cents8 = [
        [float(x) for x in r["embedding"]]
        for r in e.where(F.col("vec_id") < 8).orderBy("vec_id").select("embedding").collect()
    ]
    cents16 = [
        [float(x) for x in r["embedding"]]
        for r in e.where((F.col("vec_id") >= 50) & (F.col("vec_id") < 66))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    blue = str(tmp_path / "vblue")
    green = str(tmp_path / "vgreen")
    vx = VectorIndex(spark, blue, nlist=8, nprobe=4).build(e, centroids=cents8)
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    want_blue = {
        tuple(r) for r in vx.topk(q).select("q_id", "vec_id", "cos_sim", "rank").collect()
    }

    clone_index(blue, green)
    g = VectorIndex(spark, green, nprobe=4)
    g.retrain(centroids=cents16)
    assert g.nlist == 16

    blue_again = VectorIndex(spark, blue, nprobe=4)
    assert blue_again.nlist == 8
    got_blue = {
        tuple(r)
        for r in blue_again.topk(q).select("q_id", "vec_id", "cos_sim", "rank").collect()
    }
    assert got_blue == want_blue, "retrain on the clone leaked into blue"

    one = VectorIndex(spark, str(tmp_path / "one"), nprobe=4).build(
        e, centroids=cents16
    )
    want_green = {
        tuple(r) for r in one.topk(q).select("q_id", "vec_id", "cos_sim", "rank").collect()
    }
    got_green = {
        tuple(r) for r in g.topk(q).select("q_id", "vec_id", "cos_sim", "rank").collect()
    }
    assert got_green == want_green


def test_clone_refuses_torn_source_and_dirty_target(spark, tmp_path, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    root = str(tmp_path / "t")
    SearchIndex(spark, root, mode="scored", buckets=8).build(d)

    dirty = tmp_path / "dirty"
    dirty.mkdir()
    (dirty / "junk").write_text("x")
    with pytest.raises(FileExistsError, match="not empty"):
        clone_index(root, str(dirty))

    meta_path = os.path.join(root, "_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["pending_reshard"] = {"buckets": 48}
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="torn"):
        clone_index(root, str(tmp_path / "t2"))

    with pytest.raises(FileNotFoundError, match="no index"):
        clone_index(str(tmp_path / "missing"), str(tmp_path / "t3"))
    refs = ServingRefs(str(tmp_path))
    with pytest.raises(FileNotFoundError, match="refusing"):
        refs.set_ref("prod", str(tmp_path / "missing"))
