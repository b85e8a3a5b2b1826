"""Batch DP pins — Iceberg equality-delete writer + Delta DESCRIBE
HISTORY classification."""

from __future__ import annotations

import os
import shutil

import pytest

from sap_cta_data_pipeline_spark.catalog import load_table as t
from sap_cta_data_pipeline_spark.operators.delta_dml import (
    delta_describe_history_df,
)
from sap_cta_data_pipeline_spark.operators.delta_reader import _commit
from sap_cta_data_pipeline_spark.operators.iceberg_reader import (
    iceberg_append,
    iceberg_eq_delete,
    iceberg_snapshot,
    iceberg_state,
)
from sap_cta_data_pipeline_spark.operators.lakehouse_interop import (
    _build_sink_fixture,
)


@pytest.fixture(scope="module")
def eq_table(spark, sf_dir, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("eqdel") / "tbl")
    n = t(spark, sf_dir, "nation")
    iceberg_append(spark, base, n.filter("n_nationkey < 12"), "a0.parquet")
    iceberg_append(spark, base, n.filter("n_nationkey >= 12"), "a1.parquet")
    return base


def test_eq_delete_is_metadata_only_and_gated(spark, sf_dir, eq_table):
    n_total = t(spark, sf_dir, "nation").count()
    pre_snap_files = {d["path"] for d in iceberg_state(eq_table)[1]}
    iceberg_eq_delete(spark, eq_table, "n_name", ["NATION_5"])
    # no data file touched: same data-file set, one eq-delete entry
    schema, data, pos, eq = iceberg_state(eq_table)
    assert {d["path"] for d in data} == pre_snap_files
    assert len(eq) == 1 and eq[0]["cols"] == ["n_name"]
    got = {r.n_name for r in iceberg_snapshot(spark, eq_table).collect()}
    assert "NATION_5" not in got and len(got) == n_total - 1


def test_eq_delete_reinsert_survives_and_time_travel(spark, sf_dir, eq_table):
    n = t(spark, sf_dir, "nation")
    # re-insert at a sequence AFTER the delete: the strict gate must keep it
    iceberg_append(spark, eq_table, n.filter("n_name = 'NATION_5'"), "a2.parquet")
    got = [r for r in iceberg_snapshot(spark, eq_table).collect() if r.n_name == "NATION_5"]
    assert len(got) == 1, "post-delete re-insert must survive the eq delete"
    # time travel to the pre-delete snapshot: full table, no delete applied
    import json

    meta_dir = os.path.join(eq_table, "metadata")
    with open(os.path.join(meta_dir, "v2.metadata.json")) as fh:
        pre_id = json.load(fh)["current-snapshot-id"]
    assert iceberg_snapshot(spark, eq_table, snapshot_id=pre_id).count() == n.count()


def test_eq_delete_second_delete_composes(spark, sf_dir, eq_table):
    iceberg_eq_delete(spark, eq_table, "n_name", ["NATION_9"])
    got = {r.n_name for r in iceberg_snapshot(spark, eq_table).collect()}
    assert "NATION_9" not in got
    assert "NATION_5" in got, "older re-insert still survives its older delete"
    _, _, _, eq = iceberg_state(eq_table)
    assert len(eq) == 2, "both delete files planned"


def test_eq_delete_unknown_column_raises(spark, sf_dir, eq_table):
    with pytest.raises(ValueError, match="no column"):
        iceberg_eq_delete(spark, eq_table, "nope", ["x"])


def test_history_classifies_metadata_only_commit(spark, sf_dir, tmp_path):
    base = _build_sink_fixture(spark, sf_dir)
    clone = str(tmp_path / "hist")
    shutil.copytree(base, clone)
    _commit(
        os.path.join(clone, "_delta_log"),
        2,
        [{"metaData": {"schemaString": "{}", "partitionColumns": []}}],
    )
    rows = {r.version: (r.operation, r.predicate)
            for r in delta_describe_history_df(spark, clone).collect()}
    assert rows[0] == ("WRITE", None)
    assert rows[1] == ("WRITE", None)
    assert rows[2] == ("METADATA", None)
