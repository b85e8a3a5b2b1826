"""Batch DU pins — writer-side enforcement of Delta CHECK constraints
and generated columns: rejection paths, physical materialization, and
log-state invariants."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.operators.delta_reader import delta_state
from sap_cta_data_pipeline_spark.operators.delta_table_features import (
    DeltaConstraintViolation,
    delta_append_enforced,
    delta_create_featured,
    delta_write_check_constraint,
    delta_write_generated_columns,
)


def _mk(spark, tmp_path, name, **kw):
    base = str(tmp_path / name)
    df = spark.createDataFrame(
        [(1, 10.0, "A")], "k long, price double, status string"
    )
    delta_create_featured(spark, base, df.limit(0), **kw)
    return base, df


def test_check_constraint_rejects_before_staging(spark, tmp_path):
    base, df = _mk(
        spark, tmp_path, "t1", constraints={"pos": "price > 0"}
    )
    delta_append_enforced(spark, base, df, "ok.parquet")
    bad = spark.createDataFrame(
        [(2, -5.0, "B"), (3, 4.0, "C")], "k long, price double, status string"
    )
    with pytest.raises(DeltaConstraintViolation, match="pos"):
        delta_append_enforced(spark, base, bad, "bad.parquet")
    # nothing staged, log tip unchanged (v0 meta + v1 ok append)
    live, _, _, config, _ = delta_state(spark, base, None)
    assert sorted(live) == ["ok.parquet"]
    assert config["delta.constraints.pos"] == "price > 0"
    assert not os.path.exists(os.path.join(base, "bad.parquet"))


def test_check_constraint_null_fails(spark, tmp_path):
    base, _ = _mk(spark, tmp_path, "t2", constraints={"pos": "price > 0"})
    nullish = spark.createDataFrame(
        [(4, None, "D")], "k long, price double, status string"
    )
    with pytest.raises(DeltaConstraintViolation):
        delta_append_enforced(spark, base, nullish, "n.parquet")


def test_generated_column_computed_and_materialized(spark, tmp_path):
    base = str(tmp_path / "t3")
    full = spark.createDataFrame(
        [(1, 10.0, 100.0)], "k long, price double, price_cents double"
    )
    delta_create_featured(
        spark, base, full.limit(0), generated={"price_cents": "price * 100"}
    )
    delta_append_enforced(
        spark,
        base,
        spark.createDataFrame([(1, 10.0), (2, 2.5)], "k long, price double"),
        "g.parquet",
    )
    # physically materialized in the data file (raw parquet read)
    raw = spark.read.parquet(os.path.join(base, "g.parquet"))
    assert set(raw.columns) == {"k", "price", "price_cents"}
    got = {r.k: r.price_cents for r in raw.collect()}
    assert got == {1: 1000.0, 2: 250.0}
    # supplying a WRONG generated value is refused (must-match rule)
    wrong = spark.createDataFrame(
        [(3, 1.0, 999.0)], "k long, price double, price_cents double"
    )
    with pytest.raises(DeltaConstraintViolation, match="price_cents"):
        delta_append_enforced(spark, base, wrong, "w.parquet")
    # supplying the CORRECT value passes
    right = spark.createDataFrame(
        [(3, 1.0, 100.0)], "k long, price double, price_cents double"
    )
    delta_append_enforced(spark, base, right, "r.parquet")


def test_feature_protocol_versions(spark, tmp_path):
    b1, _ = _mk(spark, tmp_path, "t4", constraints={"c": "price > 0"})
    b2 = str(tmp_path / "t5")
    df = spark.createDataFrame([(1, 2.0)], "k long, v double")
    delta_create_featured(spark, b2, df.limit(0), generated={"v": "k * 2.0"})
    for base, want in ((b1, 3), (b2, 4)):
        with open(os.path.join(base, "_delta_log", f"{0:020d}.json")) as fh:
            actions = [json.loads(l) for l in fh if l.strip()]
        proto = next(a["protocol"] for a in actions if "protocol" in a)
        assert proto["minWriterVersion"] == want


def test_lane_fixtures_green(spark, sf_dir):
    out = delta_write_check_constraint.__wrapped__(spark, sf_dir)
    assert out.filter(F.col("o_totalprice") <= 0).count() == 0
    gen = delta_write_generated_columns.__wrapped__(spark, sf_dir)
    assert (
        gen.filter(F.col("o_year") != F.year("o_orderdate")).count() == 0
    )
