"""Batch FG pins — Delta column-mapped DDL writers (metadata-only
RENAME/DROP, refusals) and Iceberg rewrite_manifests (manifest count,
explicit entry sequence numbers, delete gating, time travel)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from sap_cta_data_pipeline_spark.functions.avro_codec import read_container
from sap_cta_data_pipeline_spark.operators.delta_reader import (
    _COMMIT_RE,
    delta_snapshot,
)
from sap_cta_data_pipeline_spark.operators.delta_dml import (
    _read_commit,
    delta_update_where,
)
from sap_cta_data_pipeline_spark.operators.iceberg_reader import (
    _resolve_path,
    iceberg_append,
    iceberg_delete_where,
    iceberg_snapshot,
)
from sap_cta_data_pipeline_spark.operators.lakehouse_maintenance2 import (
    delta_drop_column,
    delta_rename_column,
    iceberg_rewrite_manifests,
)


def _clone_colmap(spark, sf_dir, tmp_path, name: str) -> str:
    from sap_cta_data_pipeline_spark.operators.lakehouse_interop import (
        _build_colmap_fixture,
    )

    base = _build_colmap_fixture(spark, sf_dir)
    clone = str(tmp_path / name)
    shutil.copytree(base, clone)
    os.remove(os.path.join(clone, "_FIXTURE_READY"))
    return clone


def _commits(base: str):
    log_dir = os.path.join(base, "_delta_log")
    return sorted(
        int(m.group(1))
        for f in os.listdir(log_dir)
        if (m := _COMMIT_RE.match(f))
    )


def test_ddl_commits_are_metadata_only(spark, sf_dir, tmp_path):
    base = _clone_colmap(spark, sf_dir, tmp_path, "ddl_meta")
    before = _commits(base)
    v1 = delta_rename_column(spark, base, "n_name", "n_label")
    v2 = delta_drop_column(spark, base, "n_regionkey")
    log_dir = os.path.join(base, "_delta_log")
    for v in (v1, v2):
        acts = _read_commit(log_dir, v)
        assert not any("add" in a or "remove" in a for a in acts), acts
        assert any("metaData" in a for a in acts)
    assert _commits(base) == before + [v1, v2]
    cols = delta_snapshot(spark, base).columns
    assert cols == ["n_nationkey", "n_label"]


def test_rename_keeps_physical_name_and_update_hits_it(
    spark, sf_dir, tmp_path
):
    base = _clone_colmap(spark, sf_dir, tmp_path, "ddl_ren_upd")
    delta_rename_column(spark, base, "n_name", "n_label")
    # physicalName untouched in the new schemaString
    from sap_cta_data_pipeline_spark.operators.delta_reader import delta_state

    _, schema_string, _, _, _ = delta_state(spark, base)
    (f,) = [
        f
        for f in json.loads(schema_string)["fields"]
        if f["name"] == "n_label"
    ]
    assert f["metadata"]["delta.columnMapping.physicalName"] == "col-3c2b-name"
    # UPDATE through the writer API under the NEW logical name
    version, n_files = delta_update_where(
        spark, base, "n_label = 'NATION_3'", {"n_label": "'HIT'"}
    )
    assert n_files == 1
    got = {r.n_nationkey: r.n_label for r in delta_snapshot(spark, base).collect()}
    assert got[3] == "HIT"


def test_ddl_refusals(spark, sf_dir, tmp_path):
    from sap_cta_data_pipeline_spark.operators.lakehouse_interop import (
        _build_sink_fixture,
    )

    # non-mapped table -> loud refusal (would imply full rewrite)
    plain = str(tmp_path / "plain")
    shutil.copytree(_build_sink_fixture(spark, sf_dir), plain)
    with pytest.raises(NotImplementedError, match="column mapping"):
        delta_rename_column(spark, plain, "n_name", "x")
    with pytest.raises(NotImplementedError, match="column mapping"):
        delta_drop_column(spark, plain, "n_name")

    base = _clone_colmap(spark, sf_dir, tmp_path, "ddl_refuse")
    with pytest.raises(ValueError, match="no such column"):
        delta_rename_column(spark, base, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        delta_rename_column(spark, base, "n_name", "n_regionkey")
    with pytest.raises(ValueError, match="no such column"):
        delta_drop_column(spark, base, "nope")
    delta_drop_column(spark, base, "n_regionkey")
    delta_drop_column(spark, base, "n_name")
    with pytest.raises(ValueError, match="last column"):
        delta_drop_column(spark, base, "n_nationkey")


def _build_iceberg_multi(spark, sf_dir, tmp_path, name: str) -> str:
    from sap_cta_data_pipeline_spark.catalog import load_table

    base = str(tmp_path / name)
    n = load_table(spark, sf_dir, "nation")
    iceberg_append(spark, base, n.filter("n_nationkey < 8"), "a0.parquet")
    iceberg_append(
        spark, base, n.filter("n_nationkey >= 8 AND n_nationkey < 16"),
        "a1.parquet",
    )
    iceberg_append(spark, base, n.filter("n_nationkey >= 16"), "a2.parquet")
    iceberg_delete_where(spark, base, "n_nationkey % 8 = 1")
    return base


def _manifest_list(base: str):
    meta_dir = os.path.join(base, "metadata")
    vs = [
        int(f[1:].split(".")[0])
        for f in os.listdir(meta_dir)
        if f.startswith("v") and f.endswith(".metadata.json")
    ]
    with open(os.path.join(meta_dir, f"v{max(vs)}.metadata.json")) as fh:
        md = json.load(fh)
    snap = {s["snapshot-id"]: s for s in md["snapshots"]}[
        md["current-snapshot-id"]
    ]
    _, manifests = read_container(_resolve_path(base, snap["manifest-list"]))
    return md, manifests


def test_rewrite_manifests_merges_and_gates(spark, sf_dir, tmp_path):
    base = _build_iceberg_multi(spark, sf_dir, tmp_path, "ib_rw")
    pre = {
        r.n_nationkey for r in iceberg_snapshot(spark, base).collect()
    }
    _, manifests_before = _manifest_list(base)
    assert len(manifests_before) == 4  # 3 data + 1 delete
    version, n_before, n_after = iceberg_rewrite_manifests(spark, base)
    assert (n_before, n_after) == (4, 2)
    md, manifests = _manifest_list(base)
    assert len(manifests) == 2
    (data_mf,) = [m for m in manifests if m.get("content", 0) == 0]
    _, entries = read_container(_resolve_path(base, data_mf["manifest_path"]))
    assert len(entries) == 3
    # every merged entry materializes its explicit sequence number
    assert sorted(e["sequence_number"] for e in entries) == [1, 2, 3]
    assert all(e["status"] == 0 for e in entries)
    # delete still applies through the gate; content identical
    post = {r.n_nationkey for r in iceberg_snapshot(spark, base).collect()}
    assert post == pre
    assert all(k % 8 != 1 for k in post)


def test_rewrite_manifests_time_travel_and_append_after(
    spark, sf_dir, tmp_path
):
    from sap_cta_data_pipeline_spark.catalog import load_table

    base = _build_iceberg_multi(spark, sf_dir, tmp_path, "ib_rw_tt")
    md_before, _ = _manifest_list(base)
    pre_sid = md_before["current-snapshot-id"]
    iceberg_rewrite_manifests(spark, base)
    # pre-rewrite snapshot still time-travelable, same content
    tt = {
        r.n_nationkey
        for r in iceberg_snapshot(spark, base, snapshot_id=pre_sid).collect()
    }
    now = {r.n_nationkey for r in iceberg_snapshot(spark, base).collect()}
    assert tt == now
    # a post-rewrite append composes: re-inserted key SURVIVES the old
    # delete (its seq exceeds the delete's)
    n = load_table(spark, sf_dir, "nation")
    iceberg_append(
        spark, base, n.filter("n_nationkey = 1"), "re-add.parquet"
    )
    after = {r.n_nationkey for r in iceberg_snapshot(spark, base).collect()}
    assert 1 in after and 9 not in after


def test_rewrite_manifests_refuses_partitioned(spark, sf_dir, tmp_path):
    from sap_cta_data_pipeline_spark.operators.iceberg_partitioning import (
        _bucket_fixture,
    )

    src = _bucket_fixture(spark, sf_dir)
    clone = str(tmp_path / "ib_rw_part")
    shutil.copytree(src, clone)
    with pytest.raises(NotImplementedError, match="PARTITIONED"):
        iceberg_rewrite_manifests(spark, clone)
