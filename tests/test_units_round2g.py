"""Unit tests for the round-2g additions: forward as-of, run-length
islands, high moments, entropy, share-of-total, file metadata."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.registry import QUERIES


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(key):
        return QUERIES[key](spark, sf_dir)

    return run


def test_asof_forward_next_is_at_or_after(q):
    rows = q("join_asof_forward").collect()
    matched = [r for r in rows if r.next_click_ts is not None]
    assert matched and all(r.gap_us >= 0 for r in matched)
    assert all(r.next_click_ts >= r.purchase_ts for r in matched)


def test_run_lengths_cover_no_more_than_stream(q, spark, sf_dir):
    runs = q("events_run_length")
    total_in_runs = runs.agg(F.sum("run_len")).collect()[0][0]
    n_events = load_table(spark, sf_dir, "events").count()
    assert 0 < total_in_runs <= n_events
    assert runs.where(F.col("run_len") < 2).count() == 0


def test_entropy_bounds(q, spark, sf_dir):
    rows = q("events_entropy_by_user").collect()
    n_types = (
        load_table(spark, sf_dir, "events").select("event_type").distinct().count()
    )
    hi = math.log(n_types) + 1e-9
    assert rows and all(-1e-9 <= r.entropy <= hi for r in rows)


def test_moments_match_builtin_mean_variance(q, spark, sf_dir):
    got = {r.event_type: r for r in q("agg_moments_high").collect()}
    e = load_table(spark, sf_dir, "events")
    ref = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(F.avg("value").alias("mean"), F.var_pop("value").alias("m2"))
        .collect()
    }
    for k, r in got.items():
        assert abs(r.mean - ref[k].mean) < 1e-4
        assert abs(r.m2 - ref[k].m2) < 1e-2


def test_share_of_total_sums_to_one_per_nation(q):
    df = q("win_share_of_total")
    sums = df.groupBy("s_nationkey").agg(F.sum("share_of_nation").alias("s")).collect()
    assert sums and all(abs(r.s - 1.0) < 1e-4 for r in sums)


def test_file_metadata_single_known_file(q):
    rows = q("scan_file_metadata").collect()
    assert len(rows) == 1 and rows[0].file_name == "lineitem.parquet"
