"""Batch DR pins — planted-sequence certification of the
MATCH_RECOGNIZE compilation (V-detection semantics, not just
engine agreement) and diff classification edge rules."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _pattern_on(spark, rows):
    """Run the V-pattern stages on a planted (user, seq, value) list by
    rebuilding the lane's logic against a temp view of events shape."""
    df = spark.createDataFrame(
        [
            (
                i,
                datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i),
                u,
                "x",
                float(v),
                "{}",
            )
            for i, (u, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    import sap_cta_data_pipeline_spark.operators.surface18 as s18

    orig = s18.t  # module-local binding of the catalog loader
    try:
        s18.t = lambda spark_, sf_, name: df  # noqa: ARG005
        out = s18.sql_match_recognize_equiv.__wrapped__(spark, "ignored")
        return {r.user_id: r for r in out.collect()}
    finally:
        s18.t = orig


def test_v_pattern_planted(spark):
    # user 1: 5,4,3,6,7 -> one V (down-run len 2, valley 3)
    # user 2: 9,8,8,9   -> flat breaks the run: NO V
    # user 3: 5,4,5,4,3,2,5 -> two Vs, valleys 4 and 2, longest down 3
    rows = (
        [(1, v) for v in [5, 4, 3, 6, 7]]
        + [(2, v) for v in [9, 8, 8, 9]]
        + [(3, v) for v in [5, 4, 5, 4, 3, 2, 5]]
    )
    got = _pattern_on(spark, rows)
    assert set(got) == {1, 3}, "flat step must break the pattern"
    assert got[1].n_patterns == 1
    assert got[1].deepest_valley == 3.0
    assert got[1].longest_down == 2
    assert got[3].n_patterns == 2
    assert got[3].deepest_valley == 2.0
    assert got[3].longest_down == 3


def test_table_diff_classes_partition_all_keys(spark, sf_dir):
    from sap_cta_data_pipeline_spark.catalog import load_table as t
    from sap_cta_data_pipeline_spark.operators.surface18 import (
        dq_table_diff_keyed,
    )

    o = t(spark, sf_dir, "orders")
    n_left = o.count()
    n_added = o.filter("o_orderkey % 101 = 5").count()
    n_removed = o.filter("o_orderkey % 97 = 0").count()
    got = {
        r.change_type: r.n
        for r in dq_table_diff_keyed.__wrapped__(spark, sf_dir).collect()
    }
    assert got.get("added", 0) == n_added
    assert got.get("removed", 0) == n_removed
    # every left key is removed/changed/unchanged; added is disjoint
    assert (
        got.get("removed", 0) + got.get("changed", 0) + got.get("unchanged", 0)
        == n_left
    )
