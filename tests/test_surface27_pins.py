"""Batch EG pins — delta-method SE replay and impossible-travel
planted trajectories."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators.surface27 as s27
from sap_cta_data_pipeline_spark.operators.surface27 import (
    events_ab_ratio_delta_method,
    events_impossible_travel,
)


def test_delta_method_python_replay(spark, sf_dir):
    from sap_cta_data_pipeline_spark.catalog import load_table as t

    e = t(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0)
            ).alias("x"),
            (F.count(F.lit(1)) * 1.0).alias("y"),
        )
        .collect()
    )
    arms: dict[int, list] = {0: [], 1: []}
    for r in per_user:
        arms[r.user_id % 2].append((r.x, r.y))
    got = {
        r.arm: r
        for r in events_ab_ratio_delta_method.__wrapped__(spark, sf_dir).collect()
    }
    ses = {}
    for arm, xy in arms.items():
        n = len(xy)
        mx = sum(x for x, _ in xy) / n
        my = sum(y for _, y in xy) / n
        vx = sum((x - mx) ** 2 for x, _ in xy) / (n - 1)
        vy = sum((y - my) ** 2 for _, y in xy) / (n - 1)
        cxy = sum((x - mx) * (y - my) for x, y in xy) / (n - 1)
        r_ = mx / my
        se = math.sqrt((vx + r_ * r_ * vy - 2 * r_ * cxy) / (n * my * my))
        ses[arm] = (r_, se)
        row = got[arm]
        assert row.n_users == n
        assert math.isclose(row.ratio, round(r_, 6), abs_tol=2e-6)
        assert math.isclose(row.se, round(se, 6), abs_tol=2e-6)
    z = (ses[1][0] - ses[0][0]) / math.sqrt(ses[0][1] ** 2 + ses[1][1] ** 2)
    for row in got.values():
        assert math.isclose(row.z_diff, round(z, 6), abs_tol=5e-6)


def test_impossible_travel_planted(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)

    def ev(i, uid, k, minutes):
        return (
            i,
            base + datetime.timedelta(minutes=minutes),
            uid,
            "view",
            0.0,
            f'{{"k": {k}}}',
        )

    # user 1: k=0 -> k=99 in 10 minutes (far corners of the grid:
    # impossible); user 2: k=0 -> k=1 in 10 minutes (adjacent cities,
    # 8 deg lat ~ 889 km in 1/6 h -> >900? 889/(1/6)=5334 km/h...
    # make user 2 SLOW: same city k=0 -> k=0 (0 km/h), then k=1 after
    # 48 hours (~889 km / 48 h = 18 km/h: possible).
    rows = [
        ev(0, 1, 0, 0),
        ev(1, 1, 99, 10),
        ev(2, 2, 0, 0),
        ev(3, 2, 0, 10),
        ev(4, 2, 1, 48 * 60),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    orig = s27.t
    try:
        s27.t = lambda spark_, sf_, name: df  # noqa: ARG005
        got = {
            r.user_id: r
            for r in events_impossible_travel.__wrapped__(spark, "x").collect()
        }
    finally:
        s27.t = orig
    assert 1 in got and got[1].n_impossible == 1
    assert 2 not in got, "slow mover must not be flagged"
    assert got[1].max_kmh > 10000


def test_impossible_travel_lane_consistency(spark, sf_dir):
    out = events_impossible_travel.__wrapped__(spark, sf_dir)
    bad = out.filter(
        (F.col("n_impossible") <= 0) | (F.col("n_impossible") > F.col("n_moves"))
    )
    assert bad.count() == 0
