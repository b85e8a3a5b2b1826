"""Batch DY pins — Hudi CoW upsert writer lifecycle/slice semantics and
MoR compaction invariants."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.operators.hudi_write import (
    hudi_cow_upsert,
    hudi_mor_compact,
)
from sap_cta_data_pipeline_spark.operators.lakehouse_interop import (
    hudi_cow_snapshot,
    hudi_cow_state,
)


def test_cow_upsert_lifecycle_and_slices(spark, tmp_path):
    base = str(tmp_path / "t")
    df1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    )
    i1 = hudi_cow_upsert(spark, base, df1, "k")
    tl = os.path.join(base, ".hoodie")
    assert os.path.exists(os.path.join(tl, f"{i1}.commit"))
    # lifecycle markers are cleaned up after completion
    assert not os.path.exists(os.path.join(tl, f"{i1}.requested"))
    assert not os.path.exists(os.path.join(tl, f"{i1}.inflight"))
    g1 = hudi_cow_state(base)
    assert len(g1) == 1  # one insert group

    # update k=1, insert k=3 → group 1 rewritten (same fileId, new
    # slice), one new group for the insert
    df2 = spark.createDataFrame([(1, "A"), (3, "c")], "k int, v string")
    i2 = hudi_cow_upsert(spark, base, df2, "k")
    g2 = hudi_cow_state(base)
    assert set(g2) > set(g1) and len(g2) == 2
    (fid1,) = g1
    assert g2[fid1].endswith(f"_{i2}.parquet"), "rewritten slice at new instant"
    got = {
        r.k: r.v for r in hudi_cow_snapshot(spark, base).collect()
    }
    assert got == {1: "A", 2: "b", 3: "c"}

    # a batch touching NO existing keys must not rewrite any group
    df3 = spark.createDataFrame([(9, "z")], "k int, v string")
    hudi_cow_upsert(spark, base, df3, "k")
    g3 = hudi_cow_state(base)
    assert g3[fid1] == g2[fid1], "untouched group keeps its slice"
    assert len(g3) == 3


def test_cow_upsert_meta_columns(spark, tmp_path):
    base = str(tmp_path / "m")
    hudi_cow_upsert(
        spark,
        base,
        spark.createDataFrame([(7, "x")], "k int, v string"),
        "k",
    )
    (rel,) = hudi_cow_state(base).values()
    raw = spark.read.parquet(os.path.join(base, rel))
    assert raw.columns[:2] == ["_hoodie_commit_time", "_hoodie_record_key"]
    r = raw.collect()[0]
    assert r._hoodie_record_key == "7"


def test_mor_compaction_resets_logs_and_preserves_snapshot(spark, sf_dir, tmp_path):
    from sap_cta_data_pipeline_spark.operators.hudi_mor import (
        _build_mor_fixture,
        hudi_mor_snapshot,
        hudi_mor_state,
    )

    src = _build_mor_fixture(spark, sf_dir)
    base = str(tmp_path / "mor")
    shutil.copytree(src, base)
    before = sorted(map(tuple, hudi_mor_snapshot(spark, base).collect()))
    pre_state = hudi_mor_state(base)
    assert any(logs for _, logs in pre_state.values()), "fixture has logs"
    instant = hudi_mor_compact(spark, base)
    after_state = hudi_mor_state(base)
    assert all(not logs for _, logs in after_state.values()), "logs reset"
    assert all(
        p is not None and p.endswith(f"_{instant}.parquet")
        for p, _ in after_state.values()
    )
    after = sorted(map(tuple, hudi_mor_snapshot(spark, base).collect()))
    assert after == before, "compaction never changes the snapshot"
    # pre-compaction time travel still replays the log path
    tt = hudi_mor_state(base, as_of="002")
    assert any(logs for _, logs in tt.values())
    # tombstoned keys are physically gone from the compacted base
    (bp, _), = [v for v in after_state.values()]
    raw = spark.read.parquet(os.path.join(base, bp))
    assert raw.filter(F.col("n_nationkey") % 5 == 0).count() == 0
