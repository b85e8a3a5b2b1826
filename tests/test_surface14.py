"""Pins for batch CN: the GROUPS-frame rewrite on a hand-computed tied
series (the case where ROWS frames give the WRONG answer), and the
DISTINCT ON tiebreak determinism."""

from __future__ import annotations

import os
import tempfile

import pandas as pd


def test_groups_frame_on_ties(spark):
    """dates d1,d1,d2,d3,d3 with prices 1,2,4,8,16:
    GROUPS 1 PRECEDING..CURRENT sums = 3,3,7,28,28 (full peer groups).
    A ROWS frame would split the d1 and d3 peer groups (e.g. second d1
    row would see 1+2=3 but FIRST d1 row only 1) — the rewrite must
    reproduce the GROUPS numbers."""
    from sap_cta_data_pipeline_spark.operators.surface14 import (
        win_groups_frame_equiv,
    )

    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "o_orderkey": range(5),
            "o_custkey": [1] * 5,
            "o_orderstatus": ["F"] * 5,
            "o_totalprice": [1.0, 2.0, 4.0, 8.0, 16.0],
            "o_orderdate": [base, base, base + pd.Timedelta(days=1),
                            base + pd.Timedelta(days=2),
                            base + pd.Timedelta(days=2)],
            "o_orderpriority": ["1"] * 5,
        }
    )
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.parquet(os.path.join(d, "orders.parquet"))
    rows = sorted(
        win_groups_frame_equiv(spark, d).collect(),
        key=lambda r: (r.order_us, r.grp_sum),
    )
    assert [r.grp_sum for r in rows] == [3.0, 3.0, 7.0, 28.0, 28.0]


def test_distinct_on_tiebreak(spark):
    """Two customers tied on max acctbal within a nation: the lower
    custkey must win, deterministically."""
    from sap_cta_data_pipeline_spark.operators.surface14 import sql_distinct_on

    pdf = pd.DataFrame(
        {
            "c_custkey": [10, 7, 3],
            "c_name": ["a", "b", "c"],
            "c_nationkey": [1, 1, 1],
            "c_acctbal": [99.5, 99.5, 1.0],
            "c_mktsegment": ["X"] * 3,
        }
    )
    d = tempfile.mkdtemp()
    spark.createDataFrame(pdf).write.parquet(os.path.join(d, "customer.parquet"))
    rows = sql_distinct_on(spark, d).collect()
    assert len(rows) == 1 and rows[0].c_custkey == 7
