"""Pins for the Arrow-native JSON parse lane (functions/jsonlane.py) —
the round-12 replacement for json_extract_typed's from_json parse.

The lane must match from_json's observable semantics on every shape the
events feed can legally contain (clean ints, nulls, empties, missing
field, extra fields, nested objects) AND survive corrupt rows via the
per-batch lenient fallback instead of failing the job — from_json nulls
corrupt rows (PERMISSIVE); a raw pyarrow.json parse would throw for the
whole buffer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.functions.jsonlane import (
    _parse_long_batch,
    json_field_arrow,
)


def test_clean_batch_matches_from_json(spark):
    rows = [
        ('{"k": 7}',),
        ('{"k": -3, "x": "y"}',),
        ('{"x": 1}',),          # field absent -> NULL
        ('{"k": null}',),       # explicit null -> NULL
        (None,),                 # NULL input -> NULL
        ("",),                   # empty string -> NULL
        ('{"k": 12, "nested": {"k": 99}}',),  # top-level only
    ]
    df = spark.createDataFrame(rows, "props string")
    got = df.select(json_field_arrow("props", "k").alias("k")).collect()
    want = df.select(F.from_json("props", "k long")["k"].alias("k")).collect()
    assert [r.k for r in got] == [r.k for r in want]
    assert [r.k for r in got] == [7, -3, None, None, None, None, 12]


def test_corrupt_batch_falls_back_lenient(spark):
    # one corrupt row would make pyarrow.json throw for the whole
    # buffer; the fallback nulls it and still parses its neighbours
    rows = [('{"k": 5}',), ('{"k": broken',), ('{"k": 6}',)]
    df = spark.createDataFrame(rows, "props string").coalesce(1)
    got = [r.k for r in df.select(
        json_field_arrow("props", "k").alias("k")).collect()]
    assert got == [5, None, 6]


def test_fallback_is_int_strict():
    # direct batch-function pin: the lenient path only accepts JSON
    # integers — floats/strings/bools are NULL, not coerced
    s = pd.Series(['{"k": 5}', '{"k": 7.5}', '{"k": "8"}',
                   '{"k": true}', "not json", "[1,2]"])
    out = _parse_long_batch(s, "k").tolist()
    assert out[0] == 5
    assert all(v is None or pd.isna(v) for v in out[1:])


def test_newline_fragment_rows_stay_aligned(spark):
    # round-13 advice fix: a corrupt value containing a raw newline whose
    # fragments are VALID JSON parses as extra NDJSON rows without
    # tripping ArrowInvalid — the batch must route to the lenient path
    # instead of misaligning its neighbours. from_json parses the FIRST
    # value and ignores trailing content (measured), so parity is 2, not
    # NULL, for the fragment row.
    rows = [('{"k": 1}',), ('{"k": 2}\n{"k": 3}',), ('{"k": 4}',)]
    df = spark.createDataFrame(rows, "props string").coalesce(1)
    got = [r.k for r in df.select(
        json_field_arrow("props", "k").alias("k")).collect()]
    want = [r.k for r in df.select(
        F.from_json("props", "k long")["k"].alias("k")).collect()]
    assert got == want == [1, 2, 4]


def test_trailing_garbage_matches_from_json(spark):
    # from_json's first-value-wins semantics on one-line trailing content
    rows = [('{"k": 2} trailing',), ('{"k": 3},',), ('{"k": 4}{"k": 9}',),
            (' \n {"k": 5}',)]
    df = spark.createDataFrame(rows, "props string").coalesce(1)
    got = [r.k for r in df.select(
        json_field_arrow("props", "k").alias("k")).collect()]
    want = [r.k for r in df.select(
        F.from_json("props", "k long")["k"].alias("k")).collect()]
    assert got == want == [2, 3, 4, 5]


def test_whitespace_row_and_fragment_cancellation():
    # the adversarial cancellation: one fragment row (+1 NDJSON row) and
    # one whitespace-only row (-1: pyarrow skips blank lines) keep the
    # row COUNT matching while every value in between is misaligned —
    # the pre-screen must catch it, not the count check
    s = pd.Series([" ", '{"k": 2}\n{"k": 3}', '{"k": 4}', '{"k": 5}'])
    out = _parse_long_batch(s, "k").tolist()
    assert out[0] is None or pd.isna(out[0])
    assert out[1:] == [2, 4, 5]  # first-value-wins, neighbours aligned


def test_longs_stay_exact_alongside_nulls(spark):
    # round-13 advice fix: a batch with >=1 null used to come back as
    # float64, rounding |v| > 2^53 — 2^53+1 must survive exactly
    big = 9007199254740993  # 2^53 + 1
    rows = [(f'{{"k": {big}}}',), ('{"k": null}',)]
    df = spark.createDataFrame(rows, "props string").coalesce(1)
    got = [r.k for r in df.select(
        json_field_arrow("props", "k").alias("k")).collect()]
    want = [r.k for r in df.select(
        F.from_json("props", "k long")["k"].alias("k")).collect()]
    assert got == want == [big, None]


def test_empty_partitions(spark):
    df = spark.createDataFrame([], "props string").repartition(4)
    assert df.select(json_field_arrow("props", "k").alias("k")).count() == 0


def test_registry_key_unchanged_shape(spark, sf_dir):
    import sap_cta_data_pipeline_spark.operators  # noqa: F401 — registry population
    from sap_cta_data_pipeline_spark.registry import QUERIES

    out = QUERIES["json_extract_typed"](spark, sf_dir)
    assert out.columns == ["k_bucket", "n", "avg_value", "n_users"]
    assert out.count() > 0
