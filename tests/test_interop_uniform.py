"""Batch EZ pins — UniForm zero-copy + refusals; rolling-HLL error
bound + determinism."""

from __future__ import annotations

import os
import shutil

import pytest

from sap_cta_data_pipeline_spark.operators.delta_reader import delta_snapshot
from sap_cta_data_pipeline_spark.operators.interop_uniform import (
    agg_hll_rolling_window_eval,
    delta_uniform_iceberg_metadata,
)
from sap_cta_data_pipeline_spark.operators.iceberg_reader import iceberg_snapshot
from sap_cta_data_pipeline_spark.operators.lakehouse_interop import (
    _build_sink_fixture,
    delta_delete_where,
)


def test_uniform_zero_copy_and_parity(spark, sf_dir, tmp_path):
    delta_base = _build_sink_fixture(spark, sf_dir)
    ib = str(tmp_path / "ib")
    delta_uniform_iceberg_metadata(spark, delta_base, ib)
    # zero data bytes copied: the Iceberg side is metadata only
    assert sorted(os.listdir(ib)) == ["metadata"]
    via_iceberg = sorted(map(tuple, iceberg_snapshot(spark, ib).collect()))
    via_delta = sorted(
        map(
            tuple,
            delta_snapshot(spark, delta_base)
            .select("n_nationkey", "n_name", "n_regionkey")
            .collect(),
        )
    )
    assert via_iceberg == via_delta


def test_uniform_refuses_dv_tables(spark, sf_dir, tmp_path):
    base = _build_sink_fixture(spark, sf_dir)
    clone = str(tmp_path / "dvt")
    shutil.copytree(base, clone)
    os.remove(os.path.join(clone, "_FIXTURE_READY"))
    delta_delete_where(spark, clone, "n_nationkey = 3")
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        delta_uniform_iceberg_metadata(spark, clone, str(tmp_path / "ib2"))


def test_hll_rolling_error_bound_and_determinism(spark, sf_dir):
    r1 = agg_hll_rolling_window_eval.__wrapped__(spark, sf_dir).collect()
    assert r1, "non-empty report"
    assert all(r.rel_err <= 0.05 for r in r1), "HLL++ 7-day union within 5%"
    r2 = agg_hll_rolling_window_eval.__wrapped__(spark, sf_dir).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2], "deterministic"
