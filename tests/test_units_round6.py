"""Round-6 unit pins: the ADVICE fixes — quoted-JSON-string inference
(spark.read.json contract) and markov stationary rounding parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.operators.semistructured import (
    discover_json_schema,
)
from sap_cta_data_pipeline_spark.registry import QUERIES


def test_discover_infers_quoted_numerics_as_string(spark):
    """A JSON STRING holding digits ("123") must infer string, exactly as
    spark.read.json does — get_json_object strips the quotes, so the
    try_cast ladder alone would mis-infer bigint (ADVICE round-5)."""
    docs = [
        '{"a": 1, "b": "123", "c": 2.5, "d": "x1"}',
        '{"a": 2, "b": "456", "c": 3, "d": "x2"}',
    ]
    raw = spark.createDataFrame([(d,) for d in docs], "doc string")
    keys, inferred = discover_json_schema(raw)
    assert keys == ["a", "b", "c", "d"]
    assert inferred == {"a": "bigint", "b": "string", "c": "double", "d": "string"}
    # the contract this pins: spark.read.json infers the same types
    ref = spark.read.json(spark.createDataFrame([(d,) for d in docs], "v string").rdd.map(lambda r: r.v))
    ref_types = dict(ref.dtypes)
    assert ref_types["b"] == "string" and ref_types["a"] == "bigint"


def test_discover_mixed_quoting_forces_string(spark):
    """One quoted occurrence among unquoted numbers → string for the whole
    key (spark.read.json's mixed-type rule)."""
    raw = spark.createDataFrame(
        [('{"k": 1}',), ('{"k": "2"}',), ('{"k": 3}',)], "doc string"
    )
    _, inferred = discover_json_schema(raw)
    assert inferred["k"] == "string"


def test_markov_stationary_rounds_spark_side(spark, sf_dir):
    """stationary_p must be r6-rounded (half-away-from-zero) on the
    DataFrame, not Python round() (banker's) on the driver: pin a value
    that the two rules split, via the same plan the lane uses."""
    df = QUERIES["events_markov_stationary"](spark, sf_dir)
    assert df.columns == ["state", "stationary_p"]
    total = df.agg(F.sum("stationary_p")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-3)
    # the rounding rule itself: on an exactly-representable half boundary
    # (3.5/2**21 ulp-free: use 0.5 scaled by a power of two), SQL round is
    # half-away-from-zero while Python round() is half-to-even
    from sap_cta_data_pipeline_spark.functions.parity import r6

    half = 1.5 / 2**20  # exactly representable; r6 target boundary ≈ 1.430511e-06
    probe = spark.range(1).select(
        r6(F.lit(half)).alias("v"), F.round(F.lit(0.5), 0).alias("w")
    )
    row = probe.collect()[0]
    assert row.w == 1.0  # SQL half-away-from-zero
    assert round(0.5) == 0  # Python half-to-even — the divergence the fix removes


def test_bfs_seed_is_depth_zero_singleton(spark, sf_dir):
    rows = {r.depth: r for r in QUERIES["graph_bfs_layers"](spark, sf_dir).collect()}
    assert rows[0].n_nodes == 1
    assert rows[0].min_node == rows[0].max_node
    # layers are contiguous from 0
    assert sorted(rows) == list(range(len(rows)))


def test_k_anonymity_coarse_no_riskier_than_fine(spark, sf_dir):
    rows = {r.level: r for r in QUERIES["dq_k_anonymity"](spark, sf_dir).collect()}
    fine = rows["fine(nation,segment,bal1k)"]
    coarse = rows["coarse(nation,bal5k)"]
    # generalization merges groups: fewer groups, never more risky rows
    assert coarse.n_groups <= fine.n_groups
    assert coarse.risky_rows <= fine.risky_rows


def test_burst_detection_z_threshold(spark, sf_dir):
    df = QUERIES["events_burst_detection"](spark, sf_dir)
    for r in df.collect():
        assert r.max_burst_z > 3
        assert r.n_burst_days >= 1


def test_delta_schema_evolution_time_travel_keeps_old_schema(spark, sf_dir):
    from sap_cta_data_pipeline_spark.operators.delta_reader import delta_snapshot
    from sap_cta_data_pipeline_spark.operators.lakehouse_interop import (
        _build_evolve_fixture,
    )

    base = _build_evolve_fixture(spark, sf_dir)
    v0 = delta_snapshot(spark, base, version=0)
    assert v0.columns == ["n_nationkey", "n_name", "n_regionkey"]  # pre-evolution
    assert v0.count() == 12
    latest = delta_snapshot(spark, base)
    assert "n_flag" in latest.columns
    # old file's rows surface typed nulls under the evolved schema
    assert latest.filter("n_nationkey < 12 AND n_flag IS NULL").count() == 12
    assert latest.filter("n_nationkey >= 12 AND n_flag IS NULL").count() == 0


def test_dynamic_gap_matches_native_session_window(spark, sf_dir):
    """The gaps-and-islands lane must equal Spark's own
    session_window(ts, dynamic-gap expr) — session count and per-session
    event counts — on the same events."""
    from sap_cta_data_pipeline_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    # session_window's dynamic gap must be CalendarIntervalType → make_interval
    gap = F.expr(
        "CASE event_type WHEN 'purchase' THEN make_interval(0,0,0,0,0,45,0) "
        "WHEN 'click' THEN make_interval(0,0,0,0,0,15,0) "
        "WHEN 'view' THEN make_interval(0,0,0,0,0,15,0) "
        "ELSE make_interval(0,0,0,0,0,30,0) END"
    )
    native = (
        e.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("session_window.start").alias("session_start"), "n_events")
    )
    ours = QUERIES["stream_session_dynamic_gap"](spark, sf_dir).select(
        "user_id", "session_start", "n_events"
    )
    assert native.count() == ours.count()
    assert native.exceptAll(ours).isEmpty()
    assert ours.exceptAll(native).isEmpty()


def test_theil_contributions_sum_to_global_index(spark, sf_dir):
    """Additive decomposability: Σ(contrib_within + contrib_between) must
    reproduce the directly-computed global Theil-T."""
    from sap_cta_data_pipeline_spark.catalog import load_table

    df = QUERIES["agg_theil_decomposition"](spark, sf_dir)
    total = df.agg(
        F.sum(F.col("contrib_within") + F.col("contrib_between"))
    ).collect()[0][0]
    c = load_table(spark, sf_dir, "customer").where("c_acctbal > 0")
    pos = c.select(F.col("c_acctbal").cast("double").alias("x"))
    mu = pos.agg(F.avg("x")).collect()[0][0]
    direct = pos.agg(
        F.avg((F.col("x") / mu) * F.log(F.col("x") / mu))
    ).collect()[0][0]
    assert total == pytest.approx(direct, abs=1e-4)


def test_bestfit_packing_invariants(spark, sf_dir):
    import math

    df = QUERIES["pack_sequences_bestfit"](spark, sf_dir).cache()
    # capacity + fill consistency per (lang, bin)
    bins = df.groupBy("lang", "bin_id").agg(
        F.sum("n_tok").alias("s"), F.max("bin_fill").alias("f"),
        F.min("bin_fill").alias("f2"),
    )
    bad = bins.filter("s > 512 OR s != f OR f != f2").count()
    assert bad == 0
    # lower bound + BFD guarantee per lang: opt >= ceil(total/cap),
    # bins_used <= 11/9 * opt + 1
    per_lang = (
        df.groupBy("lang")
        .agg(
            F.countDistinct("bin_id").alias("used"),
            F.sum("n_tok").alias("total"),
        )
        .collect()
    )
    for r in per_lang:
        lower = math.ceil(r.total / 512)
        assert r.used >= lower
        assert r.used <= math.floor(11 / 9 * lower) + 1
    # determinism
    again = QUERIES["pack_sequences_bestfit"](spark, sf_dir)
    assert df.exceptAll(again).isEmpty() and again.exceptAll(df).isEmpty()
    df.unpersist()


def test_bestfit_hand_fixture():
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "lang": ["en"] * 5,
            "n_tok": [300, 300, 212, 200, 100],
        }
    )
    # inline the algorithm contract: sorted desc [300,300,212,200,100]:
    # 300→bin0; 300→bin1 (600>512); 212→bin0 (exact 512, fuller than bin1);
    # 200→bin1 (500); 100→bin2 (bin0 full, bin1 would be 600)
    from sap_cta_data_pipeline_spark.operators import training_prep3 as m

    out = m._bfd(pdf)
    got = dict(zip(out.doc_id, out.bin_id))
    assert got == {1: 0, 2: 1, 3: 0, 4: 1, 5: 2}
    fills = dict(zip(out.bin_id, out.bin_fill))
    assert fills == {0: 512, 1: 500, 2: 100}


def test_lpa_separates_planted_cliques(spark):
    """Two disjoint 5-cliques must resolve to exactly two communities
    labeled by each clique's min node, deterministically."""
    from itertools import combinations

    from sap_cta_data_pipeline_spark.operators.surface12 import _lpa

    edges = [(a, b) for a, b in combinations(range(5), 2)]
    edges += [(a + 10, b + 10) for a, b in combinations(range(5), 2)]
    sym = edges + [(b, a) for a, b in edges]
    ud = spark.createDataFrame(sym, "u long, v long")
    labels = {r.node: r.label for r in _lpa(ud, rounds=4).collect()}
    assert all(labels[n] == 0 for n in range(5))
    assert all(labels[n + 10] == 10 for n in range(5))
    again = {r.node: r.label for r in _lpa(ud, rounds=4).collect()}
    assert labels == again


def test_ivfpq_ranks_are_contiguous(spark, sf_dir):
    df = QUERIES["sim_ann_ivfpq"](spark, sf_dir)
    per = df.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx"), F.min("rank").alias("mn")
    )
    for r in per.collect():
        assert r.n == 5 and r.mn == 1 and r.mx == 5


def test_json_malformed_dropmalformed_and_failfast(spark, sf_dir):
    """The same feed under DROPMALFORMED keeps only good rows; FAILFAST
    raises — the three reader modes the docstring promises."""
    import os

    from sap_cta_data_pipeline_spark.operators.sources import _scratch

    QUERIES["source_json_malformed"](spark, sf_dir).collect()  # build feed
    path = _scratch(sf_dir, "json_malformed_feed")
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    good = (
        spark.read.schema("id bigint, price double")
        .option("mode", "DROPMALFORMED")
        .json(path)
        .count()
    )
    total = spark.read.text(path).count()
    assert 0 < good < total
    import pytest as _pt

    with _pt.raises(Exception, match="(?i)malformed|FAILFAST"):
        spark.read.schema("id bigint, price double").option(
            "mode", "FAILFAST"
        ).json(path).count()


def test_skyline_no_dominated_rows_and_maximal(spark, sf_dir):
    """Every emitted row is undominated, and adding any non-emitted part
    would be dominated — checked directly against the full part table."""
    from sap_cta_data_pipeline_spark.catalog import load_table

    sky = {(r.partkey, float(r.price), r.size)
           for r in QUERIES["part_skyline_pareto"](spark, sf_dir).collect()}
    parts = [(r.p_partkey, float(r.p_retailprice), r.p_size)
             for r in load_table(spark, sf_dir, "part").select(
                 "p_partkey", "p_retailprice", "p_size").collect()]

    def dominated(x, pool):
        return any(
            (q[1] <= x[1] and q[2] >= x[2] and (q[1] < x[1] or q[2] > x[2]))
            for q in pool
        )

    sky_keys = {k for k, _, _ in sky}
    for x in parts:
        if x[0] in sky_keys:
            assert not dominated(x, parts), x
        else:
            assert dominated(x, parts), x


def test_lindley_identity_matches_sequential_simulation(spark, sf_dir):
    """The two-window closed form must equal the literal day-by-day
    clamped recursion q_d = max(0, q_{d-1} + a_d - c)."""
    rows = sorted(
        QUERIES["orders_queue_backlog_lindley"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    # reconstruct c from the identity on day 1: backlog_1 = max(0, a_1 - c)
    # is not invertible — recompute c the way the lane does instead
    total = sum(r.arrivals for r in rows)
    import math

    c = math.ceil(total / len(rows))
    q = 0
    for r in rows:
        q = max(0, q + r.arrivals - c)
        assert q == r.backlog, (r.day, q, r.backlog)
    assert any(r.backlog > 0 for r in rows)  # critically loaded: non-trivial


def test_dynamic_gap_session_window_runs_in_streaming(spark, sf_dir, tmp_path):
    """session_window with a DYNAMIC gap must also run as a real
    Structured Streaming query (the batch lane's semantics pin covers
    values; this pins the streaming plan is legal and produces the same
    session count on a bounded replay)."""
    from sap_cta_data_pipeline_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events").limit(2000)
    src = str(tmp_path / "events_stream_src")
    # watermarks require TIMESTAMP (tz-aware), not TIMESTAMP_NTZ
    e.select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    ).write.mode("overwrite").parquet(src)
    gap = F.expr(
        "CASE event_type WHEN 'purchase' THEN make_interval(0,0,0,0,0,45,0) "
        "WHEN 'click' THEN make_interval(0,0,0,0,0,15,0) "
        "WHEN 'view' THEN make_interval(0,0,0,0,0,15,0) "
        "ELSE make_interval(0,0,0,0,0,30,0) END"
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .parquet(src)
        .withWatermark("ts", "0 seconds")
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dyn_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) FROM dyn_sessions").collect()[0][0]
    batch = (
        spark.read.parquet(src)
        .groupBy("user_id", F.session_window("ts", gap))
        .count()
        .count()
    )
    assert got == batch and got > 0


def test_windowed_funnel_bounded_by_unbounded(spark, sf_dir):
    """A 7-day conversion window can only lose users vs the unbounded
    funnel, and step counts are monotone non-increasing."""
    win = QUERIES["events_funnel_conversion_window"](spark, sf_dir).collect()[0]
    assert win.n_step1_view >= win.n_step2_click_7d >= win.n_step3_purchase_7d
    unb = {r.step: r.n_users for r in
           QUERIES["events_funnel_steps"](spark, sf_dir).collect()}
    # unbounded funnel reports per-step user counts; map by order
    vals = [unb[k] for k in sorted(unb)]
    assert win.n_step2_click_7d <= vals[1]
    assert win.n_step3_purchase_7d <= vals[2]


def test_sessionize_capped_boundaries(spark):
    """Hand-built user: events every 25 minutes (gap < 30 throughout)
    from 0 to 250min — the 250min event exceeds the 4h cap from session
    start 0 and must open session 2 even though its gap is only 25min;
    a final event at 300min (gap 50 > 30) opens session 3."""
    import os
    import tempfile

    import pandas as pd

    from sap_cta_data_pipeline_spark.operators.session_ops import (
        events_sessionize_capped,
    )

    base = pd.Timestamp("2024-01-01")
    mins = list(range(0, 251, 25)) + [300]
    pdf = pd.DataFrame(
        {
            "event_id": range(len(mins)),
            "ts": [base + pd.Timedelta(minutes=m) for m in mins],
            "user_id": [1] * len(mins),
            "event_type": ["view"] * len(mins),
            "value": [1.0] * len(mins),
            "props": ["{}"] * len(mins),
        }
    )
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.parquet(os.path.join(d, "events.parquet"))
    rows = sorted(
        events_sessionize_capped(spark, d).collect(), key=lambda r: r.session_id
    )
    assert [(r.session_id, r.n_events) for r in rows] == [(1, 10), (2, 1), (3, 1)]
    assert rows[0].duration_us == 225 * 60 * 1_000_000
