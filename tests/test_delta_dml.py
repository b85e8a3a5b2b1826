"""Batch DO pins — Delta copy-on-write UPDATE and MERGE INTO writers.

What the identity oracles can't certify: which files were (not)
rewritten, DV clearing on rewrite, single-commit atomicity, and the
stale-snapshot abort contract."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.catalog import load_table as t
from sap_cta_data_pipeline_spark.operators.delta_dml import (
    ConcurrentMergeError,
    _log_tip,
    delta_merge_into,
    delta_update_where,
)
from sap_cta_data_pipeline_spark.operators.delta_reader import (
    _COMMIT_RE,
    _commit,
    _read_commit,
    delta_snapshot,
    delta_state,
)
from sap_cta_data_pipeline_spark.operators.lakehouse_interop import (
    _build_sink_fixture,
    delta_delete_where,
)


def _clone_sink(spark, sf_dir, tmp_path, name: str) -> str:
    base = _build_sink_fixture(spark, sf_dir)
    clone = str(tmp_path / name)
    shutil.copytree(base, clone)
    os.remove(os.path.join(clone, "_FIXTURE_READY"))
    return clone


def _commits(base: str) -> list[int]:
    log_dir = os.path.join(base, "_delta_log")
    return sorted(
        int(m.group(1)) for f in os.listdir(log_dir) if (m := _COMMIT_RE.match(f))
    )


def test_update_rewrites_only_affected_files(spark, sf_dir, tmp_path):
    base = _clone_sink(spark, sf_dir, tmp_path, "upd_affected")
    live0, *_ = delta_state(spark, base)
    # the sink fixture splits nation lo/hi; key 1 lives in exactly one file
    version, n_files = delta_update_where(
        spark, base, "n_nationkey = 1", {"n_name": "'PATCHED'"}
    )
    assert n_files == 1
    live1, *_ = delta_state(spark, base)
    untouched = set(live0) & set(live1)
    assert len(untouched) == len(live0) - 1, "exactly one file replaced"
    got = {
        r.n_nationkey: r.n_name
        for r in delta_snapshot(spark, base).select("n_nationkey", "n_name").collect()
    }
    assert got[1] == "PATCHED"
    assert len(got) == t(spark, sf_dir, "nation").count()


def test_update_applies_and_clears_dv(spark, sf_dir, tmp_path):
    base = _clone_sink(spark, sf_dir, tmp_path, "upd_dv")
    delta_delete_where(spark, base, "n_nationkey = 2")
    _, _, _, _, dvs0 = delta_state(spark, base)
    assert dvs0, "precondition: DELETE left a deletion vector"
    delta_update_where(
        spark, base, "n_nationkey % 5 = 1", {"n_regionkey": "n_regionkey + 10"}
    )
    live, _, _, _, dvs1 = delta_state(spark, base)
    # key 2 and key 1 share the low file: its rewrite materialized the DV
    assert not dvs1, "rewrite must drop the descriptor (DV applied in data)"
    keys = {r.n_nationkey for r in delta_snapshot(spark, base).collect()}
    assert 2 not in keys, "DV'd row must stay deleted through the rewrite"


def test_update_no_match_is_noop(spark, sf_dir, tmp_path):
    base = _clone_sink(spark, sf_dir, tmp_path, "upd_noop")
    tip0 = _log_tip(base)
    version, n_files = delta_update_where(
        spark, base, "n_nationkey = 999", {"n_name": "'X'"}
    )
    assert (version, n_files) == (tip0, 0)
    assert _commits(base)[-1] == tip0, "no commit for a zero-row UPDATE"


def test_update_refusals(spark, sf_dir, tmp_path):
    base = _clone_sink(spark, sf_dir, tmp_path, "upd_refuse")
    with pytest.raises(ValueError, match="unknown column"):
        delta_update_where(spark, base, "n_nationkey = 1", {"nope": "1"})


def test_merge_is_one_atomic_commit(spark, sf_dir, tmp_path):
    base = _clone_sink(spark, sf_dir, tmp_path, "mrg_atomic")
    tip0 = _log_tip(base)
    n = t(spark, sf_dir, "nation").filter("n_nationkey < 3")
    src = n.select(
        "n_nationkey", F.lit("UPD").alias("n_name"), "n_regionkey"
    ).unionAll(
        n.select(
            (F.col("n_nationkey") + 200).cast("int").alias("n_nationkey"),
            F.lit("INS").alias("n_name"),
            "n_regionkey",
        )
    )
    version, n_rewritten, n_inserted = delta_merge_into(
        spark, base, src, "n_nationkey", ["n_name"]
    )
    assert version == tip0 + 1 and _commits(base)[-1] == version
    acts = _read_commit(os.path.join(base, "_delta_log"), version)
    removes = [a for a in acts if "remove" in a]
    adds = [a for a in acts if "add" in a]
    assert len(removes) == n_rewritten
    assert len(adds) == n_rewritten + 1, "rewrites + one insert file"
    assert n_inserted == 3
    got = {r.n_nationkey: r.n_name for r in delta_snapshot(spark, base).collect()}
    assert got[0] == got[1] == got[2] == "UPD"
    assert got[200] == got[201] == got[202] == "INS"


def test_merge_insert_only_when_no_matches(spark, sf_dir, tmp_path):
    base = _clone_sink(spark, sf_dir, tmp_path, "mrg_insonly")
    n = t(spark, sf_dir, "nation").filter("n_nationkey < 2")
    src = n.select(
        (F.col("n_nationkey") + 300).cast("int").alias("n_nationkey"),
        "n_name",
        "n_regionkey",
    )
    version, n_rewritten, n_inserted = delta_merge_into(
        spark, base, src, "n_nationkey", ["n_name"]
    )
    assert (n_rewritten, n_inserted) == (0, 2)
    acts = _read_commit(os.path.join(base, "_delta_log"), version)
    assert not [a for a in acts if "remove" in a], "insert-only MERGE removes nothing"


def test_merge_aborts_on_concurrent_data_commit(spark, sf_dir, tmp_path, monkeypatch):
    """A data-changing commit stealing our version slot must ABORT the
    merge (stale read set), not blind-retry past it."""
    import sap_cta_data_pipeline_spark.operators.delta_dml as dml

    base = _clone_sink(spark, sf_dir, tmp_path, "mrg_conflict")
    real_commit = _commit
    log_dir = os.path.join(base, "_delta_log")
    fired = {"done": False}

    def racing_commit(ld, version, actions):
        if not fired["done"]:
            fired["done"] = True
            # the interloper wins the slot with a dataChange add
            real_commit(
                ld,
                version,
                [
                    {
                        "add": {
                            "path": "interloper.parquet",
                            "partitionValues": {},
                            "size": 1,
                            "modificationTime": 0,
                            "dataChange": True,
                        }
                    }
                ],
            )
        return real_commit(ld, version, actions)

    monkeypatch.setattr(dml, "_commit", racing_commit)
    n = t(spark, sf_dir, "nation").filter("n_nationkey < 2")
    src = n.select("n_nationkey", F.lit("U").alias("n_name"), "n_regionkey")
    with pytest.raises(ConcurrentMergeError):
        delta_merge_into(spark, base, src, "n_nationkey", ["n_name"])


def test_merge_retries_past_metadata_only_commit(spark, sf_dir, tmp_path, monkeypatch):
    """A metadata-only interloper (no dataChange) cannot invalidate the
    rewrite — the writer retries at the next version and lands."""
    import sap_cta_data_pipeline_spark.operators.delta_dml as dml

    base = _clone_sink(spark, sf_dir, tmp_path, "mrg_meta_ok")
    real_commit = _commit
    fired = {"done": False}

    def racing_commit(ld, version, actions):
        if not fired["done"]:
            fired["done"] = True
            real_commit(
                ld, version, [{"commitInfo": {"operation": "HOUSEKEEPING"}}]
            )
        return real_commit(ld, version, actions)

    monkeypatch.setattr(dml, "_commit", racing_commit)
    n = t(spark, sf_dir, "nation").filter("n_nationkey < 2")
    src = n.select("n_nationkey", F.lit("U2").alias("n_name"), "n_regionkey")
    version, n_rewritten, _ = delta_merge_into(
        spark, base, src, "n_nationkey", ["n_name"]
    )
    assert n_rewritten == 1
    got = {r.n_nationkey: r.n_name for r in delta_snapshot(spark, base).collect()}
    assert got[0] == got[1] == "U2"


def test_merge_explicit_null_in_source_sets_null(spark, sf_dir, tmp_path):
    """SQL MERGE semantics: a source row carrying NULL in an update
    column SETS NULL on the matched target row — coalesce would have
    silently kept the target value."""
    base = _clone_sink(spark, sf_dir, tmp_path, "mrg_nullset")
    n = t(spark, sf_dir, "nation").filter("n_nationkey = 1")
    src = n.select(
        "n_nationkey",
        F.lit(None).cast("string").alias("n_name"),
        "n_regionkey",
    )
    _, n_rewritten, n_inserted = delta_merge_into(
        spark, base, src, "n_nationkey", ["n_name"]
    )
    assert (n_rewritten, n_inserted) == (1, 0)
    got = {r.n_nationkey: r.n_name for r in delta_snapshot(spark, base).collect()}
    assert got[1] is None
    assert got[0] is not None, "unmatched rows keep their values"


def test_merge_duplicate_source_keys_raise(spark, sf_dir, tmp_path):
    """Delta MERGE raises when multiple source rows match one target row
    instead of silently multiplying it."""
    base = _clone_sink(spark, sf_dir, tmp_path, "mrg_dupsrc")
    n = t(spark, sf_dir, "nation").filter("n_nationkey < 2")
    src = n.select("n_nationkey", "n_name", "n_regionkey")
    with pytest.raises(ValueError, match="duplicate"):
        delta_merge_into(spark, base, src.unionAll(src), "n_nationkey", ["n_name"])
