"""Batch FP pins — VARIANT typed-access behavior: schema inference,
try_variant_get's NULL-on-type-mismatch, explode positions."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators.surface46 as m46
from sap_cta_data_pipeline_spark.operators.surface46 import (
    sql_variant_explode,
    sql_variant_get_typed,
)

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _plant(monkeypatch, spark, rows):
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    monkeypatch.setattr(m46, "t", lambda s, sf, name: df)


def test_variant_typed_extraction(spark, monkeypatch):
    _plant(
        monkeypatch,
        spark,
        [
            (1, datetime(2024, 1, 2), 7, "click", 2.5, "{}"),
            (2, datetime(2024, 1, 2), 3, "click", 1.0, "{}"),
        ],
    )
    r = {x.event_type: x for x in sql_variant_get_typed.__wrapped__(spark, "x").collect()}
    c = r["click"]
    # c(cents) = 250, 100 -> sum_v2 = 2*(250+100)
    assert (c.n, c.sum_u, c.sum_v2) == (2, 10, 700)
    assert c.variant_schema == (
        "OBJECT<meta: OBJECT<t: STRING, u: BIGINT>, vals: ARRAY<BIGINT>>"
    )


def test_try_variant_get_type_mismatch_is_null(spark):
    v = F.parse_json(F.lit('{"a": "text"}'))
    row = spark.range(1).select(
        F.try_variant_get(v, "$.a", "bigint").alias("bad"),
        F.try_variant_get(v, "$.missing", "string").alias("gone"),
        F.try_variant_get(v, "$.a", "string").alias("ok"),
    ).collect()[0]
    assert row.bad is None and row.gone is None and row.ok == "text"


def test_variant_explode_positions(spark, monkeypatch):
    _plant(monkeypatch, spark, [(1, datetime(2024, 1, 2), 7, "e", 0.37, "{}")])
    rows = {r.pos: r for r in sql_variant_explode.__wrapped__(spark, "x").collect()}
    # c = 37 -> [37, 74, 7]
    assert rows[0].sum_val == 37
    assert rows[1].sum_val == 74
    assert rows[2].sum_val == 7
