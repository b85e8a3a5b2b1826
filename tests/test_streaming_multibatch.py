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


@pytest.fixture(scope="module")
def time_ordered_chunks(spark, tmp_path_factory):
    """events split into 3 files by ts TERCILES → micro-batches arrive in
    global event-time order, so the 10-minute watermark never drops a
    row (every batch-N+1 event is newer than every batch-N event) and
    sessions finalize deterministically as the watermark passes them."""
    import pyspark.sql.functions as F

    path = str(tmp_path_factory.mktemp("events_ts_chunks"))
    events = load_table(spark, SF_SMALL, "events").withColumn(
        "ts_us", F.expr("unix_micros(cast(ts as timestamp))")
    )
    t1, t2 = events.select(
        F.expr("percentile(ts_us, array(0.3333, 0.6667))")
    ).collect()[0][0]
    t1, t2 = int(t1), int(t2)
    conds = [
        f"ts_us < {t1}",
        f"ts_us >= {t1} AND ts_us < {t2}",
        f"ts_us >= {t2}",
    ]
    for i, c in enumerate(conds):
        events.filter(c).drop("ts_us").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{path}/chunk={i}")
    schema = spark.read.parquet(f"{path}/chunk=0").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/chunk=*")
    )
    return src, (t1, t2)


def test_dynamic_gap_sessions_across_batches(spark, time_ordered_chunks):
    """Round-7 verdict ask #6: the dynamic-gap session contract under
    INCREMENTAL state — append mode, 10-min watermark, 3 time-ordered
    micro-batches. Every emitted session must exactly match a batch-lane
    session; all sessions ending strictly before the final watermark
    must have been emitted; and at least one emitted session must span a
    micro-batch boundary (state genuinely crossed batches)."""
    import pyspark.sql.functions as F

    import sap_cta_data_pipeline_spark.operators  # noqa: F401 — registry fill
    import sap_cta_data_pipeline_spark.operators  # noqa: F401
    from sap_cta_data_pipeline_spark.registry import QUERIES

    src, (t1, t2) = time_ordered_chunks
    q = (
        twins.session_dynamic_gap(src)
        .writeStream.format("memory")
        .queryName("sink_dyngap_multibatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 3
    out = spark.sql("SELECT * FROM sink_dyngap_multibatch").toPandas()

    batch = (
        QUERIES["stream_session_dynamic_gap"](spark, SF_SMALL)
        .withColumn("start_us", F.expr("unix_micros(cast(session_start as timestamp))"))
        .toPandas()
    )
    batch_keys = {
        (r.user_id, r.start_us, r.n_events, r.window_span_us)
        for r in batch.itertuples()
    }
    out["start_us"] = out["session_start"].astype("int64") // 1000
    emitted = {
        (r.user_id, r.start_us, r.n_events, r.window_span_us)
        for r in out.itertuples()
    }
    # soundness: every emitted session is a real batch-lane session
    assert emitted <= batch_keys, f"phantom sessions: {sorted(emitted - batch_keys)[:3]}"
    # completeness: sessions ending strictly before the final watermark
    # (max ts − 10 min) must all have emitted
    events = load_table(spark, SF_SMALL, "events")
    max_us = events.select(F.expr("max(unix_micros(cast(ts as timestamp)))")).collect()[0][0]
    wm_us = max_us - 10 * 60 * 1_000_000
    must_emit = {
        k for k in batch_keys if k[1] + k[3] < wm_us
    }
    assert must_emit <= emitted, (
        f"{len(must_emit - emitted)} finalized sessions never emitted"
    )
    # cross-batch state: at least one emitted session straddles a tercile cut
    t1_us, t2_us = t1, t2
    straddles = [
        k
        for k in emitted
        if (k[1] < t1_us < k[1] + k[3]) or (k[1] < t2_us < k[1] + k[3])
    ]
    assert straddles, "no emitted session spans a micro-batch boundary"


def test_drop_duplicates_within_watermark_bounds(spark, time_ordered_chunks):
    """Spark 4's dropDuplicatesWithinWatermark vs the batch throttle
    contract (stream_throttle_keyed): with ts-ordered micro-batches the
    streaming keep-set is bracketed —

        first-per-key ⊆ streaming-kept ⊆ throttle-kept

    (streaming may hold state past the 10-minute delay until the
    watermark actually passes it, so it can DROP an event the throttle
    keeps; it can never keep an event within 10 minutes of a kept one,
    and the first arrival per key is always kept)."""
    import pyspark.sql.functions as F

    import sap_cta_data_pipeline_spark.operators  # noqa: F401
    from sap_cta_data_pipeline_spark.registry import QUERIES

    src, _ = time_ordered_chunks
    sdf = (
        src.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("sink_ddww")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 3
    streamed = {
        int(r.event_id)
        for r in spark.sql("SELECT event_id FROM sink_ddww").collect()
    }
    throttle = {
        int(r.event_id)
        for r in QUERIES["stream_throttle_keyed"](spark, SF_SMALL).collect()
    }
    events = load_table(spark, SF_SMALL, "events")
    import pyspark.sql.functions as F2

    first_per_key = {
        int(r.eid)
        for r in events.groupBy("user_id", "event_type")
        .agg(
            F2.min_by(
                "event_id", F2.struct(F2.col("ts"), F2.col("event_id"))
            ).alias("eid")
        )
        .collect()
    }
    assert first_per_key <= streamed
    assert streamed <= throttle
