"""Batch GA pins — Iceberg changelog scan: INSERT emission, empty
window, delete completeness, and the eq-delete refusal."""

from __future__ import annotations

import pytest

from sap_cta_data_pipeline_spark.operators.iceberg_reader import (
    _eq_fixture,
    _fixture,
)
from sap_cta_data_pipeline_spark.operators.surface54 import iceberg_changelog

SF = "/root/testdata/sf0.001"


def test_deletes_exact_rows(spark):
    base = _fixture(spark, SF)
    rows = iceberg_changelog(spark, base, 1001, 1002).collect()
    assert all(r.change_type == "DELETE" for r in rows)
    assert sorted(r.n_nationkey for r in rows) == [1, 3, 5, 12, 14]
    assert all(r.commit_snapshot_id == 1002 for r in rows)


def test_reversed_window_emits_inserts(spark):
    """The diff is symmetric: walking the window backwards (1002 ->
    1001) re-materializes the five dead rows as INSERTs — the rollback
    changelog a consumer would apply."""
    base = _fixture(spark, SF)
    rows = iceberg_changelog(spark, base, 1002, 1001).collect()
    assert all(r.change_type == "INSERT" for r in rows)
    assert sorted(r.n_nationkey for r in rows) == [1, 3, 5, 12, 14]


def test_same_snapshot_window_is_empty(spark):
    base = _fixture(spark, SF)
    assert iceberg_changelog(spark, base, 1001, 1001).count() == 0
    assert iceberg_changelog(spark, base, 1002, 1002).count() == 0


def test_eq_delete_window_refuses(spark):
    base = _eq_fixture(spark, SF)
    # find two snapshot ids in the eq fixture
    import json
    import os

    with open(os.path.join(base, "metadata", "version-hint.text")) as fh:
        v = fh.read().strip()
    with open(os.path.join(base, "metadata", f"v{v}.metadata.json")) as fh:
        md = json.load(fh)
    sids = [s["snapshot-id"] for s in md["snapshots"]]
    with pytest.raises(ValueError, match="equality deletes"):
        iceberg_changelog(spark, base, sids[0], sids[-1])
