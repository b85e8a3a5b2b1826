"""Batch EB pins — orphan cleanup preserves all snapshots; WOE/IV
identities and python replay."""

from __future__ import annotations

import math
import os

from sap_cta_data_pipeline_spark.operators.surface23 import (
    iceberg_orphan_cleanup,
    iceberg_remove_orphans,
    ml_woe_iv_binning,
)


def test_orphan_cleanup_preserves_time_travel(spark, sf_dir):
    from sap_cta_data_pipeline_spark.operators.iceberg_reader import (
        iceberg_snapshot,
    )
    from sap_cta_data_pipeline_spark.operators.sources import _scratch

    rows = iceberg_orphan_cleanup.__wrapped__(spark, sf_dir).collect()
    acts = {(r.action, r.file) for r in rows}
    assert ("deleted", "data/crashed-writer-debris.parquet") in acts
    assert ("kept", "data/a0.parquet") in acts
    base = _scratch(sf_dir, "iceberg_orphans")
    # current snapshot reads clean, and the FIRST snapshot still reads
    # (its file was kept even though the second snapshot also lists it)
    assert iceberg_snapshot(spark, base).count() == 25
    assert iceberg_snapshot(spark, base, snapshot_id=1001).count() == 12
    # idempotent: a second cleanup deletes nothing
    assert iceberg_remove_orphans(base) == []
    assert not os.path.exists(
        os.path.join(base, "data", "crashed-writer-debris.parquet")
    )


def test_woe_iv_identities(spark, sf_dir):
    rows = ml_woe_iv_binning.__wrapped__(spark, sf_dir).collect()
    tg = sum(r.n_good for r in rows)
    tb = sum(r.n_bad for r in rows)
    iv = 0.0
    for r in rows:
        dg, db = r.n_good / tg, r.n_bad / tb
        woe = math.log(dg / db)
        assert math.isclose(r.woe, round(woe, 6), abs_tol=2e-6)
        assert math.isclose(
            r.iv_term, round((dg - db) * woe, 6), abs_tol=2e-6
        )
        iv += (dg - db) * woe
        # iv_term is non-negative ((dg-db) and ln share sign)
        assert r.iv_term >= -1e-9
    assert all(math.isclose(r.iv_total, round(iv, 6), abs_tol=5e-6) for r in rows)
    assert iv >= 0
