"""Checkpoint recovery: a stateful streaming query stopped after N
micro-batches and RESTARTED from the same checkpoint must (a) restore
per-key state (running counts continue, not reset) and (b) stay
exactly-once end-to-end (no re-emit of pre-stop batches, no loss of
post-restart data) — the fault-tolerance contract a 100 TB streaming
deployment actually relies on. Uses the file sink (the exactly-once sink;
the memory sink forgets on restart) + applyInPandasWithState's state
store under the checkpoint dir."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.streaming import twins

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def chunk_files(spark, tmp_path_factory):
    """events split into 3 single-file parquet chunks by event_id range."""
    staging = str(tmp_path_factory.mktemp("events_staging"))
    events = load_table(spark, SF_SMALL, "events")
    n = events.count()
    paths = []
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        d = f"{staging}/chunk{i}"
        (
            events.filter(f"event_id >= {lo} AND event_id < {hi}")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(d)
        )
        (part,) = glob.glob(f"{d}/part-*.parquet")
        paths.append(part)
    return paths


def _run_until_drained(spark, src_dir, ckpt, out_dir, schema):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        twins.stateful_running(stream)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    return q


def test_restart_from_checkpoint_restores_state(spark, chunk_files, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("recovery"))
    src, ckpt, out = f"{base}/src", f"{base}/ckpt", f"{base}/out"
    os.makedirs(src)
    schema = spark.read.parquet(os.path.dirname(chunk_files[0])).schema

    # run 1: two chunks arrive, query drains them and stops
    shutil.copy(chunk_files[0], f"{src}/c0.parquet")
    shutil.copy(chunk_files[1], f"{src}/c1.parquet")
    q1 = _run_until_drained(spark, src, ckpt, out, schema)
    assert len(q1.recentProgress) >= 2

    rows_after_run1 = spark.read.parquet(out).count()

    # run 2: one more chunk lands; a NEW query restarts from the SAME
    # checkpoint — offsets + per-user state must be restored, not rebuilt
    shutil.copy(chunk_files[2], f"{src}/c2.parquet")
    _run_until_drained(spark, src, ckpt, out, schema)

    out_df = spark.read.parquet(out).toPandas()
    events = load_table(spark, SF_SMALL, "events").toPandas()

    # exactly-once across the restart: pre-stop batches not re-emitted,
    # post-restart chunk fully present, no duplicates anywhere
    assert rows_after_run1 < len(out_df) == len(events)
    assert out_df["event_id"].is_unique
    assert set(out_df["event_id"]) == set(events["event_id"])

    # state restored: the final running count per user equals the user's
    # TOTAL events across all three chunks — impossible if the restart
    # had reset the state store (chunk-2-only counts would show instead)
    final = out_df.groupby("user_id")["running_n"].max()
    expected = events.groupby("user_id").size()
    assert final.sort_index().tolist() == expected.sort_index().tolist()
