"""Batch EL pins — walk validity/reproducibility and absorption-time
recursion replay."""

from __future__ import annotations

import math

from sap_cta_data_pipeline_spark.operators.surface32 import (
    _ABSORB_K,
    _STEPS,
    events_markov_absorption_time,
    graph_random_walks_deterministic,
)


def test_walks_are_valid_paths_and_reproducible(spark, sf_dir):
    from pyspark.sql import functions as F

    from sap_cta_data_pipeline_spark.operators.graph_ops import _edges

    out1 = sorted(
        map(tuple, graph_random_walks_deterministic.__wrapped__(spark, sf_dir).collect())
    )
    out2 = sorted(
        map(tuple, graph_random_walks_deterministic.__wrapped__(spark, sf_dir).collect())
    )
    assert out1 == out2, "walks must be bit-reproducible"
    # every consecutive (node, next) hop is a real edge
    e = _edges(spark, sf_dir)
    edges = set()
    for r in e.collect():
        edges.add((r.u, r.v))
        edges.add((r.v, r.u))
    by_walk: dict[int, dict[int, int]] = {}
    for start, step, node in out1:
        by_walk.setdefault(start, {})[step] = node
    assert by_walk
    for start, steps in by_walk.items():
        assert steps[0] == start
        assert len(steps) == _STEPS + 1, "no walker may stall mid-walk"
        for s in range(1, _STEPS + 1):
            assert (steps[s - 1], steps[s]) in edges


def test_absorption_recursion_replay(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sap_cta_data_pipeline_spark.catalog import load_table as t

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select("event_type", F.lead("event_type").over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .groupBy("event_type", "nxt")
        .count()
        .collect()
    )
    from collections import defaultdict

    totals: dict[str, int] = defaultdict(int)
    counts: dict[tuple, int] = {}
    for r in pairs:
        totals[r.event_type] += r["count"]
        counts[(r.event_type, r.nxt)] = r["count"]
    states = sorted(s for s in totals if s != "purchase")
    q = {
        (a, b): counts.get((a, b), 0) / totals[a]
        for a in states
        for b in states
    }
    tv = {s: 0.0 for s in states}
    for _ in range(_ABSORB_K):
        tv = {
            s: 1.0 + sum(q[(s, d)] * tv[d] for d in states) for s in states
        }
    got = {
        r.state: r
        for r in events_markov_absorption_time.__wrapped__(spark, sf_dir).collect()
    }
    assert set(got) == set(states)
    for s in states:
        assert math.isclose(got[s].expected_steps, round(tv[s], 6), abs_tol=5e-6)
        p1 = counts.get((s, "purchase"), 0) / totals[s]
        assert math.isclose(got[s].p_convert_1step, round(p1, 6), abs_tol=2e-6)
        # truncated expectation grows with K but is bounded by K
        assert 1.0 <= got[s].expected_steps <= _ABSORB_K
