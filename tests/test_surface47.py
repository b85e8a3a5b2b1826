"""Batch FR pins — bitmap distinct collapses duplicates; mode tie-break
is deterministic."""

from __future__ import annotations

from datetime import datetime

import sap_cta_data_pipeline_spark.operators.surface47 as m47
from sap_cta_data_pipeline_spark.operators.surface47 import (
    agg_bitmap_distinct,
    agg_mode_exact,
)

_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
_LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)


def test_bitmap_distinct_collapses_duplicates(spark, monkeypatch):
    ts = datetime(2020, 1, 1)
    # 30 orders over 10 distinct custkeys in one priority, plus a
    # cross-bucket key (bucket width is 32768 bits)
    rows = [(i, i % 10, "O", 1.0, ts, "1-URGENT") for i in range(30)]
    rows.append((99, 1_000_000, "O", 1.0, ts, "1-URGENT"))
    df = spark.createDataFrame(rows, _ORD_SCHEMA)
    monkeypatch.setattr(m47, "t", lambda s, sf, name: df)
    r = agg_bitmap_distinct.__wrapped__(spark, "x").collect()[0]
    assert (r.nd_custkeys, r.n_orders) == (11, 31)


def test_mode_tie_breaks_to_smaller_value(spark, monkeypatch):
    ts = datetime(2020, 1, 1)
    rows = []
    k = 0
    for q, n in ((7.0, 3), (3.0, 3), (9.0, 1)):
        for _ in range(n):
            k += 1
            rows.append((k, 1, 1, 1, q, 1.0, 0.0, 0.0, "R", "O", ts))
    df = spark.createDataFrame(rows, _LI_SCHEMA)
    monkeypatch.setattr(m47, "t", lambda s, sf, name: df)
    r = agg_mode_exact.__wrapped__(spark, "x").collect()[0]
    assert (r.l_returnflag, r.mode_quantity, r.mode_count) == ("R", 3, 3)
