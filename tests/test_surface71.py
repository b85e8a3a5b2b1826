"""Batch GU pins — Iceberg partition transforms: spec-vector unit pins,
hidden-partitioning layout, transformed pruned reads, day-routed MERGE
inserts, and the transform-source refusals."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sap_cta_data_pipeline_spark.functions.transforms import (
    transform_expr,
    transform_value,
)
from sap_cta_data_pipeline_spark.operators.iceberg_reader import iceberg_state
from sap_cta_data_pipeline_spark.operators.sources import _scratch
from sap_cta_data_pipeline_spark.operators.surface71 import (
    iceberg_merge_day_partitioned,
    sink_iceberg_day_partition_write,
    sink_iceberg_truncate_write,
)

SF = "/root/testdata/sf0.001"


def test_transform_values_spec_vectors():
    """The spec's own example values (Iceberg spec, Partition
    Transforms table)."""
    d = dt.date(2017, 11, 16)
    ts = dt.datetime(2017, 11, 16, 22, 31, 8)
    epoch_days = (d - dt.date(1970, 1, 1)).days
    assert transform_value("day", d) == epoch_days == 17486
    assert transform_value("day", ts) == 17486
    assert transform_value("month", d) == (2017 - 1970) * 12 + 10 == 574
    assert transform_value("year", d) == 47
    assert transform_value("hour", ts) == 17486 * 24 + 22
    # truncate: W * floor(v / W) — exact on negatives
    assert transform_value("truncate[10]", 1) == 0
    assert transform_value("truncate[10]", -1) == -10
    assert transform_value("truncate[3]", "iceberg") == "ice"
    # bucket rides the murmur3 module's spec-pinned hash
    assert transform_value("bucket[16]", 34) == (2017239379 & 0x7FFFFFFF) % 16
    with pytest.raises(NotImplementedError, match="not claimed"):
        transform_value("void", 1)
    with pytest.raises(NotImplementedError, match="timestamp-only"):
        transform_value("hour", d)


def test_transform_expr_matches_python_twin(spark):
    """Spark-side evaluation agrees with the Python twin cell-by-cell —
    and is session-tz-independent by construction (calendar fns over
    ntz; the driver's hostile-tz probe re-proves this end to end)."""
    rows = [
        (dt.datetime(2017, 11, 16, 22, 31, 8), 1, "iceberg"),
        (dt.datetime(1969, 12, 31, 23, 0, 0), -1, "sp"),
        (dt.datetime(2030, 1, 2, 0, 0, 0), 12345, "x"),
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp_ntz, v long, s string"
    )
    out = df.select(
        transform_expr("day", "ts", T.TimestampNTZType()).alias("d"),
        transform_expr("month", "ts", T.TimestampNTZType()).alias("m"),
        transform_expr("year", "ts", T.TimestampNTZType()).alias("y"),
        transform_expr("hour", "ts", T.TimestampNTZType()).alias("h"),
        transform_expr("truncate[10]", "v", T.LongType()).alias("t"),
        transform_expr("truncate[3]", "s", T.StringType()).alias("st"),
        transform_expr("bucket[16]", "v", T.LongType()).alias("b"),
    ).collect()
    for (ts, v, s), r in zip(rows, out):
        assert r["d"] == transform_value("day", ts)
        assert r["m"] == transform_value("month", ts)
        assert r["y"] == transform_value("year", ts)
        assert r["h"] == transform_value("hour", ts)
        assert r["t"] == transform_value("truncate[10]", v)
        assert r["st"] == transform_value("truncate[3]", s)
        assert r["b"] == transform_value("bucket[16]", v)


def test_temporal_refuses_tz_aware_timestamp():
    with pytest.raises(NotImplementedError, match="tz-aware|timestamp_ntz"):
        transform_expr("day", "ts", T.TimestampType())


def test_day_table_hidden_partitioning_and_pruned_read(spark):
    """Data files carry the SOURCE column ts but never the derived
    ts_day (hidden partitioning); a one-day partition_filter plans
    exactly that day's file from manifest metadata."""
    sink_iceberg_day_partition_write(spark, SF)
    base = _scratch(SF, "iceberg_day_part")
    _, files, _, _ = iceberg_state(base)
    assert len(files) > 1
    cols = set(pq.ParquetFile(files[0]["path"]).schema_arrow.names)
    assert "ts" in cols and "ts_day" not in cols
    # every file: one day, record == day(min(ts)) == day(max(ts))
    for f in files[:5]:
        t = pq.read_table(f["path"], columns=["ts"])["ts"].to_pylist()
        days = {transform_value("day", x) for x in t}
        assert days == {f["partition"]["ts_day"]}
    target = files[0]["partition"]["ts_day"]
    want = {f["path"] for f in files if f["partition"]["ts_day"] == target}
    _, pruned, _, _ = iceberg_state(
        base, partition_filter={"ts_day": target}
    )
    assert {f["path"] for f in pruned} == want
    assert len(pruned) < len(files)


def test_truncate_table_pruned_read(spark):
    sink_iceberg_truncate_write(spark, SF)
    base = _scratch(SF, "iceberg_trunc_part")
    _, files, _, _ = iceberg_state(base)
    target = files[0]["partition"]["ck_trunc"]
    _, pruned, _, _ = iceberg_state(
        base, partition_filter={"ck_trunc": target}
    )
    assert {f["partition"]["ck_trunc"] for f in pruned} == {target}
    ck = pq.read_table(pruned[0]["path"], columns=["o_custkey"])[
        "o_custkey"
    ].to_pylist()
    assert all(target <= v < target + 100 for v in ck)


def test_merge_day_routing_and_carry(spark):
    """The MERGE's fabricated 2030 inserts land as one fresh file PER
    DAY with typed epoch-day records; every other file's record still
    matches its rows (carried verbatim through the rewrite)."""
    iceberg_merge_day_partitioned(spark, SF)
    base = _scratch(SF, "iceberg_day_merge")
    _, files, _, _ = iceberg_state(base)
    d1 = transform_value("day", dt.date(2030, 1, 1))
    d2 = transform_value("day", dt.date(2030, 1, 2))
    ins = [f for f in files if f["partition"]["ts_day"] in (d1, d2)]
    assert {f["partition"]["ts_day"] for f in ins} == {d1, d2}
    for f in ins:
        md = pq.ParquetFile(f["path"]).metadata
        assert md.num_rows == 1
    # carried + rewritten files: record == day of every contained row
    import random

    rng = random.Random(7)
    for f in rng.sample(files, min(8, len(files))):
        t = pq.read_table(f["path"], columns=["ts"])["ts"].to_pylist()
        assert {transform_value("day", x) for x in t} == {
            f["partition"]["ts_day"]
        }


def test_merge_refuses_transform_source_update_and_validates_filter(
    spark, tmp_path
):
    """ts (the day transform's SOURCE) is refused in update_cols — an
    updated ts could move a row across days, which a CoW file rewrite
    cannot express; and the MERGE partition_filter guard evaluates the
    TRANSFORM over source rows (a 2030 insert against a 2020 day filter
    refuses instead of silently duplicating)."""
    from sap_cta_data_pipeline_spark.operators.surface63 import (
        iceberg_merge_into,
    )
    from sap_cta_data_pipeline_spark.operators.surface71 import (
        write_transform_partitioned,
    )

    base = str(tmp_path / "day_tbl")
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2020, 5, 1, 1, 0, 0), 1.0),
            (2, dt.datetime(2020, 5, 2, 1, 0, 0), 2.0),
        ],
        "id long, ts timestamp_ntz, v double",
    )
    write_transform_partitioned(
        spark, base, df,
        [{"pname": "ts_day", "src": "ts", "transform": "day"}],
    )
    src = spark.createDataFrame(
        [(1, dt.datetime(2030, 1, 1, 0, 0, 0), 9.0)],
        "id long, ts timestamp_ntz, v double",
    )
    with pytest.raises(ValueError, match="partition columns"):
        iceberg_merge_into(spark, base, src, "id", ["ts", "v"])
    d_2020_05_01 = transform_value("day", dt.date(2020, 5, 1))
    with pytest.raises(ValueError, match="outside partition_filter"):
        iceberg_merge_into(
            spark, base, src, "id", ["v"],
            partition_filter={"ts_day": d_2020_05_01},
        )
    # in-filter source passes and rewrites only that day's file
    ok_src = spark.createDataFrame(
        [(1, dt.datetime(2020, 5, 1, 5, 0, 0), 9.0)],
        "id long, ts timestamp_ntz, v double",
    )
    _, n_rw, n_ins = iceberg_merge_into(
        spark, base, ok_src, "id", ["v"],
        partition_filter={"ts_day": d_2020_05_01},
    )
    assert (n_rw, n_ins) == (1, 0)
    _, files, _, _ = iceberg_state(base)
    got = {
        f["partition"]["ts_day"]: pq.read_table(f["path"], columns=["v"])[
            "v"
        ].to_pylist()
        for f in files
    }
    assert got[d_2020_05_01] == [9.0]  # updated (value from source)
    assert got[transform_value("day", dt.date(2020, 5, 2))] == [2.0]
