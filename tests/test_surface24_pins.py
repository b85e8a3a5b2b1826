"""Batch EC pins — HITS norm/monotonicity invariants, seasonal-strength
bounds, Luhn classic vector + construction split."""

from __future__ import annotations

import math

from sap_cta_data_pipeline_spark.operators.surface24 import (
    _luhn_sum_col,
    fn_luhn_check,
    graph_hits_bipartite,
    ts_seasonal_strength,
)


def test_hits_invariants(spark, sf_dir):
    rows = graph_hits_bipartite.__wrapped__(spark, sf_dir).collect()
    auth = [r.score for r in rows if r.role == "authority"]
    hubs = [r.score for r in rows if r.role == "hub"]
    assert auth and hubs
    # L2-normalized score vectors (to rounding)
    assert math.isclose(sum(s * s for s in auth), 1.0, abs_tol=1e-3)
    assert math.isclose(sum(s * s for s in hubs), 1.0, abs_tol=1e-3)
    assert all(s >= 0 for s in auth + hubs)
    # node sets are disjoint roles over the bipartite graph
    a_nodes = {r.node for r in rows if r.role == "authority"}
    assert len(a_nodes) == len(auth)


def test_hits_mutual_reinforcement_planted(spark):
    # star graph: part 100 bought by every customer -> top authority;
    # customer 1 buys everything -> top hub
    import sap_cta_data_pipeline_spark.operators.surface24 as s24
    from pyspark.sql import functions as F

    edges = [(c, 100) for c in range(1, 6)] + [(1, p) for p in (101, 102, 103)]
    odf = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(edges)], "o_orderkey long, o_custkey long"
    )
    ldf = spark.createDataFrame(
        [(i, p) for i, (_, p) in enumerate(edges)], "l_orderkey long, l_partkey long"
    )
    orig = s24.t
    try:
        s24.t = lambda spark_, sf_, name: odf if name == "orders" else ldf  # noqa: ARG005
        rows = graph_hits_bipartite.__wrapped__(spark, "x").collect()
    finally:
        s24.t = orig
    top_auth = max(
        (r for r in rows if r.role == "authority"), key=lambda r: r.score
    )
    top_hub = max((r for r in rows if r.role == "hub"), key=lambda r: r.score)
    assert top_auth.node == 100
    assert top_hub.node == 1


def test_seasonal_strength_bounds(spark, sf_dir):
    r = ts_seasonal_strength.__wrapped__(spark, sf_dir).collect()[0]
    assert 0.0 <= r.f_seasonal <= 1.0
    assert 0.0 <= r.f_trend <= 1.0
    assert r.n_days > 30


def test_luhn_classic_vector_and_split(spark, sf_dir):
    # 79927398713 is the canonical VALID Luhn number
    one = spark.range(1).selectExpr("79927398713 AS n")
    got = one.select((_luhn_sum_col("n", 12) % 10 == 0).alias("ok")).collect()
    assert got[0].ok is True
    bad = spark.range(1).selectExpr("79927398714 AS n")
    assert not bad.select(
        (_luhn_sum_col("n", 12) % 10 == 0).alias("ok")
    ).collect()[0].ok
    rows = fn_luhn_check.__wrapped__(spark, sf_dir).collect()
    for r in rows:
        assert r.luhn_valid == (r.o_orderkey % 2 == 0), (
            "even keys carry the correct check digit, odd keys off-by-one"
        )


def test_hits_plan_no_inloop_global_exchanges(spark, sf_dir):
    """Round-9 fix pin: normalization is deferred out of the loop, so the
    plan carries at most the TWO post-loop 1-row norm finals — never the
    round-8 shape's 12 in-loop Exchange SinglePartition passes over
    corpus-sized node frames."""
    from sap_cta_data_pipeline_spark.plans import digest

    d = digest(graph_hits_bipartite.__wrapped__(spark, sf_dir))
    assert d.n_single_partition <= 2, (
        f"{d.n_single_partition} single-partition exchanges — in-loop "
        "global windows are back?"
    )


def test_hits_loop_is_broadcast_free(spark, sf_dir):
    """Round-9 field-failure pin: the ONLY broadcast exchanges in the
    HITS plan are the two 1-row post-loop norm scalars — the in-loop
    score joins are shuffle-hash (node frames grow with the corpus, and
    in a long shared session per-iteration broadcast builds exhaust the
    driver heap — observed at sf0.1 in rounds 8 AND 9)."""
    import contextlib
    import io

    df = graph_hits_bipartite.__wrapped__(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" not in plan, plan
    # the only broadcasts: two 1-row norm scalars (each BroadcastExchange
    # appears twice in formatted output — tree line + detail section)
    assert plan.count("BroadcastExchange") <= 4, plan
    assert plan.count("ShuffledHashJoin") >= 6, "loop joins must be shuffle-hash" 
