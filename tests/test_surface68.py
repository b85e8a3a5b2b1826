"""Batch GR pins — streaming sinks: Iceberg per-batch snapshots + the
txn-marker replay guard; Hudi upsert-sink effect idempotence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.operators.iceberg_reader import (
    _load_metadata,
    iceberg_snapshot,
)
from sap_cta_data_pipeline_spark.operators.surface68 import (
    iceberg_append_batch_once,
)

SF = "/root/testdata/sf0.001"


def _batch(spark, lo, hi):
    return (
        load_table(spark, SF, "nation")
        .where(F.col("n_nationkey").between(lo, hi))
        .select("n_nationkey", "n_name", "n_regionkey")
    )


def test_iceberg_sink_one_snapshot_per_batch_and_replay_noop(spark, tmp_path):
    table = str(tmp_path / "ice")
    assert iceberg_append_batch_once(spark, table, _batch(spark, 0, 9), 0)
    assert iceberg_append_batch_once(spark, table, _batch(spark, 10, 19), 1)
    assert len(_load_metadata(table)["snapshots"]) == 2
    # replayed batch 1: the txn-marker file is already referenced —
    # commits NOTHING (no snapshot, no duplicate rows)
    assert iceberg_append_batch_once(spark, table, _batch(spark, 10, 19), 1) is False
    assert len(_load_metadata(table)["snapshots"]) == 2
    assert iceberg_snapshot(spark, table).count() == 20
    # a genuinely new batch still lands after the replay
    assert iceberg_append_batch_once(spark, table, _batch(spark, 20, 24), 2)
    assert iceberg_snapshot(spark, table).count() == 25


def test_hudi_sink_replayed_upsert_converges(spark, tmp_path):
    from sap_cta_data_pipeline_spark.operators.hudi_write import (
        hudi_cow_upsert,
    )
    from sap_cta_data_pipeline_spark.operators.lakehouse_interop import (
        hudi_cow_snapshot,
    )

    table = str(tmp_path / "hudi")
    hudi_cow_upsert(spark, table, _batch(spark, 0, 9), "n_nationkey")
    hudi_cow_upsert(spark, table, _batch(spark, 10, 19), "n_nationkey")
    before = sorted(map(tuple, hudi_cow_snapshot(spark, table).collect()))
    # replay batch 2: identical values re-upsert — the snapshot
    # CONVERGES (effect idempotence; the timeline records the instant)
    hudi_cow_upsert(spark, table, _batch(spark, 10, 19), "n_nationkey")
    after = sorted(map(tuple, hudi_cow_snapshot(spark, table).collect()))
    assert after == before
    tl = os.path.join(table, ".hoodie")
    assert len([f for f in os.listdir(tl) if f.endswith(".commit")]) == 3
