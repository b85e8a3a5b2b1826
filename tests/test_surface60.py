"""Batch GJ pins — the MERGE delete branch + CDC feed hygiene: pure
deletes rewrite files without the row, unmatched deletes no-op, the
flag column never reaches the table, and the feed collapses CoW noise."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.operators.delta_dml import delta_merge_into
from sap_cta_data_pipeline_spark.operators.delta_reader import (
    _read_commit,
    delta_snapshot,
    delta_state,
)
from sap_cta_data_pipeline_spark.operators.lakehouse_interop import (
    delta_append_commit,
)
from sap_cta_data_pipeline_spark.operators.surface60 import cdc_feed

SF = "/root/testdata/sf0.001"


def _nation3(spark):
    from sap_cta_data_pipeline_spark.catalog import load_table

    return load_table(spark, SF, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def _two_file_table(spark, tmp_path):
    base = str(tmp_path / "t")
    n = _nation3(spark)
    delta_append_commit(spark, base, n.filter("n_nationkey < 12"),
                        "lo.parquet", first=True)
    delta_append_commit(spark, base, n.filter("n_nationkey >= 12"),
                        "hi.parquet")
    return base


def test_merge_delete_branch_drops_rows(spark, tmp_path):
    base = _two_file_table(spark, tmp_path)
    feed = spark.createDataFrame(
        [
            (1, "ONE", 9, False),   # update (lo file)
            (7, None, None, True),  # delete (lo file)
            (14, None, None, True), # delete (hi file)
            (200, "NEW", 3, False), # insert
        ],
        "n_nationkey int, n_name string, n_regionkey int, __cdc_del boolean",
    )
    v, n_rw, n_ins = delta_merge_into(
        spark, base, feed, "n_nationkey",
        ["n_name", "n_regionkey"], delete_col="__cdc_del",
    )
    assert (n_rw, n_ins) == (2, 1)  # both files rewritten, one insert
    rows = {r.n_nationkey: r for r in delta_snapshot(spark, base).collect()}
    assert 7 not in rows and 14 not in rows
    assert rows[1].n_name == "ONE" and rows[1].n_regionkey == 9
    assert rows[200].n_name == "NEW"
    assert len(rows) == 25 - 2 + 1
    # the flag column never reaches the table
    assert "__cdc_del" not in delta_snapshot(spark, base).columns
    # one atomic commit: removes + adds + insert add together
    acts = _read_commit(os.path.join(base, "_delta_log"), v)
    assert sum("remove" in a for a in acts) == 2
    assert sum("add" in a for a in acts) == 3


def test_merge_delete_unmatched_is_noop(spark, tmp_path):
    base = _two_file_table(spark, tmp_path)
    feed = spark.createDataFrame(
        [(999, None, None, True)],
        "n_nationkey int, n_name string, n_regionkey int, __cdc_del boolean",
    )
    v, n_rw, n_ins = delta_merge_into(
        spark, base, feed, "n_nationkey",
        ["n_name", "n_regionkey"], delete_col="__cdc_del",
    )
    assert (n_rw, n_ins) == (0, 0)
    assert delta_snapshot(spark, base).count() == 25


def test_merge_delete_col_missing_refuses(spark, tmp_path):
    base = _two_file_table(spark, tmp_path)
    with pytest.raises(ValueError, match="not a source column"):
        delta_merge_into(
            spark, base, _nation3(spark), "n_nationkey",
            ["n_name"], delete_col="__cdc_del",
        )


def test_merge_delete_col_excluded_from_evolution(spark, tmp_path):
    """schema_evolution must never add the CDC flag as a table column."""
    base = _two_file_table(spark, tmp_path)
    feed = spark.createDataFrame(
        [(1, "ONE", 9, 5, False)],
        "n_nationkey int, n_name string, n_regionkey int, "
        "n_upd int, __cdc_del boolean",
    )
    delta_merge_into(
        spark, base, feed, "n_nationkey", ["n_name"],
        schema_evolution=True, delete_col="__cdc_del",
    )
    cols = delta_snapshot(spark, base).columns
    assert "n_upd" in cols and "__cdc_del" not in cols


def test_cdc_feed_drops_preimages_and_flags_deletes(spark):
    chg = spark.createDataFrame(
        [
            (1, "a", "DELETE", 9), (1, "b", "INSERT", 9),   # update pair
            (2, "x", "DELETE", 9),                          # pure delete
            (3, "y", "INSERT", 9),                          # pure insert
            (4, "z", "DELETE", 9), (4, "z", "INSERT", 9),   # carryover
        ],
        "k int, v string, change_type string, commit_snapshot_id bigint",
    )
    rows = sorted(
        (r["k"], r["v"], r["__cdc_del"])
        for r in cdc_feed(chg, ["k"], ["v"]).collect()
    )
    assert rows == [(1, "b", False), (2, "x", True), (3, "y", False)]
