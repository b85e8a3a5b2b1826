"""Unit tests for the round-2d addendum: data-quality expectations,
last-touch attribution, weighted median, ANSI-safe scalars, malformed-CSV
resilience. Differential parity is covered by driver_sim; these pin the
semantic invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.registry import QUERIES

_WEEK_US = 7 * 24 * 3600 * 1_000_000


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(key):
        return QUERIES[key](spark, sf_dir)

    return run


def test_dq_report_shape_and_clean_fks(q):
    rows = {r.rule: r.n_violations for r in q("dq_expectations").collect()}
    assert len(rows) == 6
    # the synthetic corpus has clean referential integrity and no nulls…
    assert rows["lineitem_orphan_orderkey"] == 0
    assert rows["orders_orphan_custkey"] == 0
    assert rows["orders_null_custkey"] == 0
    # …but the distribution guard does fire (events.value max ≈ 327)
    assert rows["events_value_above_300"] > 0


def test_attribution_within_window_and_non_purchase(q):
    rows = q("events_attribution_lasttouch").collect()
    assert rows
    assert all(0 <= r.gap_us <= _WEEK_US for r in rows)
    assert all(r.attr_event_type != "purchase" for r in rows)
    # one attribution per purchase at most
    ids = [r.purchase_id for r in rows]
    assert len(ids) == len(set(ids))


def test_weighted_median_crossing_property(q, spark, sf_dir):
    got = {r.l_returnflag: r.weighted_median for r in q("agg_weighted_median").collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    pdf = li.toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        m = got[flag]
        total = grp.l_extendedprice.sum()
        below = grp[grp.l_quantity < m].l_extendedprice.sum()
        at_or_below = grp[grp.l_quantity <= m].l_extendedprice.sum()
        # m is the smallest value whose cumulative weight crosses half
        assert below < 0.5 * total <= at_or_below


def test_try_safe_null_semantics(q, spark, sf_dir):
    df = q("fn_try_safe")
    assert df.count() > 0
    assert df.where(F.col("flag_int").isNotNull()).count() == 0
    assert df.where(F.col("qty_int").isNull()).count() == 0
    # safe_div is null exactly on the zero-discount rows of the probe slice
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    n_zero = li.where(F.col("l_discount") == 0.0).count()
    assert df.where(F.col("safe_div").isNull()).count() == n_zero


def test_malformed_csv_recovers_clean_rows(q, spark, sf_dir):
    got = q("source_csv_malformed")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    assert got.count() == nation.count()
    assert got.exceptAll(nation).count() == 0
    # the injected corrupt keys never surface
    assert got.where(F.col("n_nationkey") == 999).count() == 0
