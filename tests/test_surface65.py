"""Batch GO pins — streaming changelog tail: delete windows stream
(where the append tail skips them), replay is exact, and a restart from
checkpoint drains only the post-stop window."""

from __future__ import annotations

import os
import shutil

from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.operators.iceberg_reader import (
    iceberg_append,
    iceberg_delete_where,
)
from sap_cta_data_pipeline_spark.operators.surface65 import (
    _changelog_splits,
    _make_changelog_tail_datasource,
    _windows,
)

SF = "/root/testdata/sf0.001"


def _drain(reader, start, end) -> list[tuple]:
    """Materialize a window exactly the way a micro-batch would: the
    driver-side split plan (partitions) + the executor-side read body
    (_read_partition — the TaskContext-guarded read() wraps it)."""
    rows: list[tuple] = []
    for p in reader.partitions(start, end):
        for batch in reader._read_partition(p):
            d = batch.to_pydict()
            names = list(d)
            rows.extend(
                tuple(d[n][i] for n in names) for i in range(batch.num_rows)
            )
    return rows


def _build(spark, base, with_delete: bool) -> None:
    n = load_table(spark, SF, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    iceberg_append(spark, base, n.filter("n_nationkey < 12"), "a0.parquet")
    iceberg_append(spark, base, n.filter("n_nationkey >= 12"), "a1.parquet")
    if with_delete:
        iceberg_delete_where(spark, base, "n_nationkey % 5 = 0")


def test_partition_plan_is_exact_replay(spark, tmp_path):
    """partitions(start, end) over any committed range plans exactly the
    rows the original run emitted for it — snapshot immutability + the
    pure endpoint plan make recovery deterministic (round 14: the
    replay surface moved from readBetweenOffsets to the partition plan
    when the reader became executor-based)."""
    base = str(tmp_path / "replay")
    _build(spark, base, with_delete=True)
    reader = _make_changelog_tail_datasource()({"path": base}).streamReader(None)
    off = reader.latestOffset()
    assert off == {"seq": 3}
    rows_all = sorted(_drain(reader, {"seq": 0}, off))
    # full-range replay == the original read
    assert sorted(_drain(reader, {"seq": 0}, {"seq": 3})) == rows_all
    # partial ranges compose: (0,2] + (2,3] == (0,3]
    first = sorted(_drain(reader, {"seq": 0}, {"seq": 2}))
    second = sorted(_drain(reader, {"seq": 2}, {"seq": 3}))
    assert sorted(first + second) == rows_all
    assert all(r[3] == "INSERT" for r in first)
    assert {r[3] for r in second} == {"DELETE"}
    assert sorted(r[0] for r in second) == [0, 5, 10, 15, 20]


def test_read_refuses_to_run_on_the_driver(spark, tmp_path):
    """Round-14 pin: batch rows must NOT transit the driver — read() is
    TaskContext-guarded, so invoking it outside an executor task (as the
    old SimpleDataSourceStreamReader effectively did for every row)
    raises instead of silently producing rows driver-side."""
    import pytest

    base = str(tmp_path / "guard")
    _build(spark, base, with_delete=False)
    reader = _make_changelog_tail_datasource()({"path": base}).streamReader(None)
    splits = reader.partitions({"seq": 0}, {"seq": 1})
    assert splits
    with pytest.raises(RuntimeError, match="must run on an executor"):
        reader.read(splits[0])


def test_restart_drains_only_post_stop_window(spark, tmp_path):
    """Checkpoint recovery: run the stream over the two appends, stop;
    commit the delete; restart from the SAME checkpoint — the second
    run emits ONLY the delete window (no INSERT re-emit)."""
    base = str(tmp_path / "recover")
    _build(spark, base, with_delete=False)
    spark.dataSource.register(_make_changelog_tail_datasource())
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def _run():
        q = (
            spark.readStream.format("iceberg_changelog_tail")
            .option("path", base)
            .load()
            .writeStream.format("parquet")  # the exactly-once sink
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    _run()
    run1 = spark.read.parquet(out).collect()
    assert len(run1) == 25 and all(r.change_type == "INSERT" for r in run1)
    iceberg_delete_where(spark, base, "n_nationkey % 5 = 0")
    _run()
    run2 = spark.read.parquet(out).collect()
    # exactly-once across the restart: the 25 INSERTs were NOT re-emitted
    assert len(run2) == 30
    dels = [r for r in run2 if r.change_type == "DELETE"]
    assert sorted(r.n_nationkey for r in dels) == [0, 5, 10, 15, 20]
    assert all(r.commit_snapshot_id == 1003 for r in dels)


def test_bootstrap_window_applies_existing_deletes(spark, tmp_path):
    """A consumer attaching AFTER the delete commit bootstraps from the
    live set — the first window emits only live rows as INSERTs (dead
    rows never reach it), so state starts correct."""
    base = str(tmp_path / "boot")
    _build(spark, base, with_delete=True)
    # pretend the stream attaches at seq 3: bootstrap = full snapshot
    wins = list(_windows(base, 0, None))
    assert [w[0] for w in wins] == [None, 1001, 1002]
    reader = _make_changelog_tail_datasource()({"path": base}).streamReader(None)
    rows = [
        row
        for s in _changelog_splits(base, None, 1003)
        for batch in reader._read_partition(
            type("S", (), dict(zip(
                ("path", "mode", "positions", "change_type", "snapshot_id"), s
            )))()
        )
        for row in zip(*batch.to_pydict().values())
    ]
    assert sorted(r[0] for r in rows) == sorted(
        k for k in range(25) if k % 5 != 0
    )
    assert all(r[3] == "INSERT" for r in rows)
