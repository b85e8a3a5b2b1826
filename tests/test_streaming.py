"""§2-K streaming twins vs their batch declarations (SURVEY.md §5.2).

The sf0.001 events table is re-materialized (with the nanos→micros ts fix)
as a file stream source; each twin runs with trigger(availableNow) into a
memory sink and must frame-equal the batch-declared operator.

Known semantic boundary (documented, not tested): stream_stateful_running
equality holds per micro-batch — across batches, arrival order replaces
global event-time order for late rows, which is inherent to streaming
running state. The twin is therefore verified single-batch.
"""

from __future__ import annotations

import pytest

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.registry import QUERIES
from sap_cta_data_pipeline_spark.streaming import twins

from .differential import frames_match

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_source(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_stream"))
    events = load_table(spark, SF_SMALL, "events")
    events.coalesce(1).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def _run_stream(spark, sdf, name: str, mode: str):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


@pytest.mark.parametrize(
    "twin_fn, batch_key, mode",
    [
        (twins.tumbling_counts, "stream_tumbling", "complete"),
        (twins.sliding_counts, "stream_sliding", "complete"),
        (twins.dedup_keyed, "stream_dedup_keyed", "append"),
        (twins.stateful_running, "stream_stateful_running", "append"),
    ],
)
def test_twin_equals_batch(spark, stream_source, twin_fn, batch_key, mode):
    name = f"sink_{batch_key}"
    streamed = _run_stream(spark, twin_fn(stream_source), name, mode).toPandas()
    batch = QUERIES[batch_key](spark, SF_SMALL).toPandas()
    problems = frames_match(streamed, batch)
    assert not problems, f"{batch_key} twin: " + "; ".join(problems)


def test_session_twin_exact_gap_boundary(spark, tmp_path):
    """Crafted events at exactly prev+30:00.000000 (ADVICE r1): the native
    session_window must MERGE touching sessions exactly like the batch
    gaps-and-islands (> splits, == merges), and +30:00.000001 must split —
    pinned here instead of asserted by comment, and on both engines."""
    import datetime as dt

    rows = [
        (0, dt.datetime(2024, 1, 1, 10, 0, 0), 1, "view", 1.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 10, 30, 0), 1, "view", 1.0, "{}"),  # == gap
        (2, dt.datetime(2024, 1, 1, 11, 0, 0, 1), 1, "view", 1.0, "{}"),  # gap+1us
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    path = str(tmp_path / "events.parquet")
    events.write.parquet(path)
    schema = spark.read.parquet(path).schema
    src = spark.readStream.schema(schema).parquet(path)
    streamed = _run_stream(
        spark, twins.session_aggregates(src), "sink_boundary_sessions", "complete"
    ).toPandas()
    batch = (
        QUERIES["stream_session"](spark, str(tmp_path)).drop("session_id").toPandas()
    )
    assert sorted(streamed["n_events"]) == [1, 2] == sorted(batch["n_events"])
    problems = frames_match(streamed, batch)
    assert not problems, "boundary session twin: " + "; ".join(problems)


def test_session_twin_equals_batch(spark, stream_source):
    """session_window twin vs gaps-and-islands batch: compare on the
    session grain (start/end/n/span/value per user) — the batch op's
    session_id ordinal is an implementation detail the native operator
    doesn't emit."""
    streamed = _run_stream(
        spark, twins.session_aggregates(stream_source), "sink_sessions", "complete"
    ).toPandas()
    batch = (
        QUERIES["stream_session"](spark, SF_SMALL)
        .drop("session_id")
        .toPandas()
    )
    problems = frames_match(streamed, batch)
    assert not problems, "session twin: " + "; ".join(problems)


def test_windowed_topk_two_stage_foreach_batch(spark, stream_source):
    """stream_topk_windowed's streaming deployment: incremental windowed
    counts + rank inside foreachBatch (rank-over-updates is not
    incrementally expressible). The final micro-batch's ranked output
    must equal the batch declaration."""
    captured: dict[str, object] = {}

    def sink(batch_df, epoch_id):
        captured["rows"] = twins.topk_rank(batch_df).toPandas()

    q = (
        twins.windowed_counts_for_topk(stream_source)
        .writeStream.foreachBatch(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = QUERIES["stream_topk_windowed"](spark, SF_SMALL).toPandas()
    problems = frames_match(captured["rows"], batch)
    assert not problems, "topk twin: " + "; ".join(problems)


def test_stream_join_interval_twin(spark, stream_source):
    """Stream-stream interval join twin frame-matches the batch
    declaration (single availableNow batch, inner join, both sides
    watermarked)."""
    clicks = stream_source.where("event_type = 'click'")
    purchases = stream_source.where("event_type = 'purchase'")
    out = twins.click_purchase_pairs(clicks, purchases)
    got = _run_stream(spark, out, "join_interval_twin", "append").toPandas()
    want = QUERIES["stream_join_interval"](spark, SF_SMALL).toPandas()
    problems = frames_match(got, want)
    assert not problems, "; ".join(problems)


def test_stream_join_left_outer_twin(spark, stream_source):
    """leftOuter stream-stream twin frame-matches the batch declaration on
    the watermark-finalized prefix: outer (null-click) results only emit
    once the watermark passes the purchase's join window, so purchases in
    the final hour of the bounded fixture are excluded from the compare
    (their outer verdict is legitimately still pending at stream end)."""
    import pyspark.sql.functions as F

    clicks = stream_source.where("event_type = 'click'")
    purchases = stream_source.where("event_type = 'purchase'")
    out = twins.click_purchase_pairs_outer(clicks, purchases)
    got = _run_stream(spark, out, "join_left_outer_twin", "append")

    events = load_table(spark, SF_SMALL, "events")
    # The twin's watermark derives from the click/purchase streams only
    # (min of the two stream watermarks), so the finalized prefix must be
    # measured from the EARLIER of the two stream maxima, not the global
    # event max: outer emission needs watermark > p_ts + 30 min window
    # + 10 min delay; 1 h leaves margin.
    cutoff = events.where(F.col("event_type").isin("click", "purchase")).groupBy(
        "event_type"
    ).agg(F.max("ts").alias("m")).agg(
        (F.min("m") - F.expr("INTERVAL 1 HOUR")).alias("c")
    ).collect()[0]["c"]

    got_pdf = (
        got.where(F.col("p_ts") <= F.lit(cutoff))
        .select("purchase_id", "click_id")
        .toPandas()
    )
    purchases_before_cutoff = events.where(
        (F.col("event_type") == "purchase") & (F.col("ts") <= F.lit(cutoff))
    ).select(F.col("event_id").alias("purchase_id"))
    want = (
        QUERIES["stream_join_left_outer"](spark, SF_SMALL)
        .join(purchases_before_cutoff, "purchase_id")
        .toPandas()
    )
    problems = frames_match(got_pdf, want)
    assert not problems, "; ".join(problems)


def test_chained_window_agg_twin(spark, stream_source):
    """Two stateful operators in one streaming query (append mode):
    equality vs the batch declaration holds on the FINALIZED prefix —
    hour windows still open at the final watermark remain in state."""
    streamed = _run_stream(
        spark, twins.chained_window_agg(stream_source), "sink_chained", "append"
    ).toPandas()
    batch = QUERIES["stream_chained_window_agg"](spark, SF_SMALL).toPandas()
    assert len(streamed) > 0
    # every emitted row must match its batch twin exactly
    merged = streamed.merge(
        batch, on=["hour_start", "event_type"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(streamed)
    assert (merged.n_subwindows_s == merged.n_subwindows_b).all()
    assert (merged.max_15m_s == merged.max_15m_b).all()
    assert (merged.avg_15m_s == merged.avg_15m_b).all()
    # only the final (unfinalized) hours may be missing
    import pandas as pd

    missing = set(map(tuple, batch[["hour_start", "event_type"]].values)) - set(
        map(tuple, streamed[["hour_start", "event_type"]].values)
    )
    if missing:
        last_emitted = streamed.hour_start.max()
        assert all(h >= last_emitted for h, _ in missing)
