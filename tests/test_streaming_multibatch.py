"""Multi-micro-batch state persistence: applyInPandasWithState must carry
per-key state across batches (the single-batch test in test_streaming.py
pins value equality; this pins cross-batch accumulation)."""

from __future__ import annotations

import pytest

from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.streaming import twins

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def chunked_source(spark, tmp_path_factory):
    """events split into 3 files by event_id range → 3 micro-batches with
    maxFilesPerTrigger=1, arriving in arrival order."""
    path = str(tmp_path_factory.mktemp("events_chunks"))
    events = load_table(spark, SF_SMALL, "events")
    n = events.count()
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        (
            events.filter(f"event_id >= {lo} AND event_id < {hi}")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{path}/chunk={i}")
        )
    schema = spark.read.parquet(f"{path}/chunk=0").schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/chunk=*")
    )


def test_state_accumulates_across_batches(spark, chunked_source):
    q = (
        twins.stateful_running(chunked_source)
        .writeStream.format("memory")
        .queryName("sink_multibatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 3  # genuinely multiple micro-batches
    out = spark.sql("SELECT * FROM sink_multibatch").toPandas()
    events = load_table(spark, SF_SMALL, "events").toPandas()
    # final running_n per user must equal that user's total event count —
    # only true if state survived across micro-batches
    final = out.groupby("user_id")["running_n"].max()
    expected = events.groupby("user_id").size()
    assert final.sort_index().tolist() == expected.sort_index().tolist()
    # every event emitted exactly once
    assert len(out) == len(events)
    assert set(out["event_id"]) == set(events["event_id"])
