"""Pins for the Delta-protocol reader (round-5 batch BN).

Beyond the oracled lanes, these pin the protocol mechanics themselves:
checkpoint fast-path (readable with the pre-checkpoint commits DELETED),
every historical version, orphan invisibility, and metadata file
skipping (exactly one file planned for a one-partition query).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from sap_cta_data_pipeline_spark.operators.delta_reader import (
    _build_fixture,
    _build_partitioned_fixture,
    _fixture_dir,
    delta_snapshot,
    delta_state,
)


@pytest.fixture(scope="module")
def base(spark, sf_dir):
    return _fixture_dir(spark, sf_dir, "delta_table", _build_fixture)


@pytest.fixture(scope="module")
def pbase(spark, sf_dir):
    return _fixture_dir(spark, sf_dir, "delta_table_part", _build_partitioned_fixture)


def test_every_version_pinned(spark, base):
    """v0 = '-old' names for keys < 12; v1/v2/v3 all equal clean nation
    (each later commit rewrites one half with identical content)."""
    v0 = delta_snapshot(spark, base, version=0).collect()
    assert len(v0) == 25
    assert all(r.n_name.endswith("-old") for r in v0 if r.n_nationkey < 12)
    assert all(not r.n_name.endswith("-old") for r in v0 if r.n_nationkey >= 12)
    for v in (1, 2, 3):
        rows = delta_snapshot(spark, base, version=v).collect()
        assert len(rows) == 25
        assert not any("-old" in r.n_name or r.n_name == "GARBAGE" for r in rows)


def test_orphan_file_invisible(spark, base):
    rows = delta_snapshot(spark, base).collect()
    assert len(rows) == 25
    assert not any(r.n_name == "GARBAGE" for r in rows)
    assert os.path.exists(os.path.join(base, "orphan.parquet"))  # debris exists


def test_checkpoint_fast_path_survives_commit_deletion(spark, base, tmp_path):
    """The latest snapshot must be reconstructible from checkpoint +
    post-checkpoint commits ALONE — copy the table, delete commits 0–2,
    and read: if the reader were replaying JSON from 0 it would fail or
    return the wrong file set; via the checkpoint it returns clean
    nation."""
    clone = str(tmp_path / "delta_clone")
    shutil.copytree(base, clone)
    for v in (0, 1, 2):
        os.remove(os.path.join(clone, "_delta_log", f"{v:020d}.json"))
    rows = delta_snapshot(spark, clone).collect()
    assert len(rows) == 25
    assert not any("-old" in r.n_name or r.n_name == "GARBAGE" for r in rows)


def test_state_live_set_exact(spark, base):
    live, schema_string, part_cols = delta_state(spark, base)
    assert set(live) == {"part-c.parquet", "part-e.parquet"}
    assert part_cols == []
    assert "n_nationkey" in schema_string
    live0, _, _ = delta_state(spark, base, version=0)
    assert set(live0) == {"part-a.parquet", "part-b.parquet"}


def test_partition_prune_plans_exactly_one_file(spark, pbase):
    """File skipping happens in METADATA: the filtered state holds one
    file of five, before any scan is planned."""
    live_all, _, part_cols = delta_state(spark, pbase)
    assert len(live_all) == 5
    assert part_cols == ["n_regionkey"]
    df = delta_snapshot(spark, pbase, partition_filter={"n_regionkey": "2"})
    files = df.inputFiles()
    assert len(files) == 1
    assert "n_regionkey=2" in files[0]


def test_partition_column_reconstructed(spark, pbase):
    """Data files lack n_regionkey entirely; the reader must rebuild it
    from partitionValues with the schemaString's integer type."""
    raw = spark.read.parquet(os.path.join(pbase, "n_regionkey=2", "part-0.parquet"))
    assert "n_regionkey" not in raw.columns
    df = delta_snapshot(spark, pbase)
    assert dict(df.dtypes)["n_regionkey"] == "int"
    assert df.filter(df.n_regionkey == 2).count() == 5
    assert df.count() == 25


def test_last_checkpoint_names_real_file(base):
    with open(os.path.join(base, "_delta_log", "_last_checkpoint")) as fh:
        lc = json.load(fh)
    assert os.path.exists(
        os.path.join(base, "_delta_log", f"{lc['version']:020d}.checkpoint.parquet")
    )
