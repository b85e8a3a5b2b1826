"""Batch GS pins — partitioned Iceberg DML (MERGE + UPDATE on
identity-partitioned tables): one-partition rewrite bound (path AND
sequence of every other file carried), per-partition insert files with
typed partition records, the partition_filter fast path (plan-level
candidate pruning + the MERGE's out-of-filter source refusal + the
UPDATE's AND-composition semantics), partition-column-update refusals,
and post-DML partition-pruned reads staying exact."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.catalog import load_table as t
from sap_cta_data_pipeline_spark.operators.iceberg_reader import (
    _build_iceberg_part_fixture,
    iceberg_snapshot,
    iceberg_state,
)
from sap_cta_data_pipeline_spark.operators.surface63 import (
    iceberg_merge_into,
    iceberg_merge_plan,
)
from sap_cta_data_pipeline_spark.operators.surface66 import (
    _update_plan,
    iceberg_update_cow,
)

SF = "/root/testdata/sf0.001"


def _nation3(spark):
    return t(spark, SF, "nation").select("n_nationkey", "n_name", "n_regionkey")


def _part_table(spark, tmp_path, name="ptab") -> str:
    base = str(tmp_path / name)
    _build_iceberg_part_fixture(spark, SF, base)
    return base


def test_merge_rewrites_one_partition_and_splits_inserts(spark, tmp_path):
    base = _part_table(spark, tmp_path)
    _, files0, _, _ = iceberg_state(base)
    carried0 = {
        f["path"]: f["seq"] for f in files0 if "rk=2" not in f["path"]
    }
    n = _nation3(spark)
    upd = n.filter("n_regionkey = 2").withColumn(
        "n_name", F.concat(F.col("n_name"), F.lit("-MRG"))
    )
    # inserts touch regions {0,1,2,3} (n_regionkey = key % 5 in testdata)
    ins = n.filter("n_nationkey < 4").select(
        (F.col("n_nationkey") + 100).cast("int").alias("n_nationkey"),
        F.concat(F.lit("INS-"), F.col("n_name")).alias("n_name"),
        "n_regionkey",
    )
    v, n_rw, n_ins = iceberg_merge_into(
        spark, base, upd.unionByName(ins), "n_nationkey", ["n_name"]
    )
    assert n_rw == 1, "only region 2's file is matched"
    assert n_ins == 4
    _, files1, _, _ = iceberg_state(base)
    # every non-matched file carried with path AND sequence
    for f in files1:
        if f["path"] in carried0:
            assert f["seq"] == carried0[f["path"]]
    assert set(carried0) < {f["path"] for f in files1}
    # one insert file per touched partition, typed partition records
    ins_files = [f for f in files1 if "-ins" in f["path"]]
    assert len(ins_files) == 4, "one insert file per touched partition"
    assert sorted(f["partition"]["n_regionkey"] for f in ins_files) == [
        0, 1, 2, 3,
    ]
    # the rewritten region-2 file keeps its partition record
    rw = [f for f in files1 if "mrg-" in f["path"] and "-ins" not in f["path"]]
    assert len(rw) == 1 and rw[0]["partition"] == {"n_regionkey": 2}
    # merged values visible
    got = {r.n_nationkey: r.n_name for r in iceberg_snapshot(spark, base).collect()}
    assert got[101].startswith("INS-") and got[7].endswith("-MRG")


def test_partition_pruned_read_stays_exact_after_merge(spark, tmp_path):
    """File skipping keeps working over the NEW files: a one-partition
    read after the merge scans only that partition's files (the
    rewritten file and its insert file carry typed records)."""
    base = _part_table(spark, tmp_path)
    n = _nation3(spark)
    ins = n.filter("n_nationkey = 2").select(
        F.lit(300).cast("int").alias("n_nationkey"),
        F.lit("INS-R1").alias("n_name"),
        F.lit(1).cast(dict(n.dtypes)["n_regionkey"]).alias("n_regionkey"),
    )
    iceberg_merge_into(spark, base, ins, "n_nationkey", ["n_name"])
    pruned = iceberg_snapshot(spark, base, partition_filter={"n_regionkey": 1})
    rows = pruned.collect()
    assert {r.n_regionkey for r in rows} == {1}
    assert 300 in {r.n_nationkey for r in rows}
    scanned = set(pruned.inputFiles())
    assert all("rk=1" in p or "-ins" in p for p in scanned), scanned
    assert len(scanned) == 2, "rk=1's original file + its insert file only"


def test_merge_partition_filter_prunes_plan_and_guards_source(spark, tmp_path):
    base = _part_table(spark, tmp_path)
    n = _nation3(spark)
    src2 = n.filter("n_regionkey = 2").withColumn("n_name", F.lit("X"))
    plan = iceberg_merge_plan(
        spark, base, src2, "n_nationkey", partition_filter={"n_regionkey": 2}
    )
    # plan-level pin: the CANDIDATE set (not just the matched set) is
    # one partition's files — pruned from manifest metadata pre-scan
    assert [os.path.basename(p) for p in plan["candidate_paths"]] == [
        "rk=2.parquet"
    ]
    full = iceberg_merge_plan(spark, base, src2, "n_nationkey")
    assert len(full["candidate_paths"]) == 5
    # the lost-update guard: a source row OUTSIDE the filter refuses
    src_mixed = src2.unionByName(
        n.filter("n_regionkey = 3").withColumn("n_name", F.lit("X"))
    )
    with pytest.raises(ValueError, match="outside partition_filter"):
        iceberg_merge_into(
            spark, base, src_mixed, "n_nationkey", ["n_name"],
            partition_filter={"n_regionkey": 2},
        )
    # filtered merge lands and only region 2 changed
    v, n_rw, n_ins = iceberg_merge_into(
        spark, base, src2, "n_nationkey", ["n_name"],
        partition_filter={"n_regionkey": 2},
    )
    assert (n_rw, n_ins) == (1, 0)
    got = {r.n_nationkey: r.n_name for r in iceberg_snapshot(spark, base).collect()}
    n_r2 = {r.n_nationkey for r in n.filter("n_regionkey = 2").collect()}
    assert all(got[k] == "X" for k in n_r2)
    assert all(not got[k] == "X" for k in got if k not in n_r2)


def test_merge_refuses_partition_column_update(spark, tmp_path):
    base = _part_table(spark, tmp_path)
    src = _nation3(spark).filter("n_nationkey = 1")
    with pytest.raises(ValueError, match="cannot update partition columns"):
        iceberg_merge_into(
            spark, base, src, "n_nationkey", ["n_name", "n_regionkey"]
        )


def test_update_partition_filter_is_and_composed(spark, tmp_path):
    """The UPDATE's filter narrows semantics by construction: rows
    matching the raw predicate OUTSIDE the filter partition stay
    untouched, and only the filter partition's file is rewritten."""
    base = _part_table(spark, tmp_path)
    _, files0, _, _ = iceberg_state(base)
    carried0 = {
        f["path"]: f["seq"] for f in files0 if "rk=2" not in f["path"]
    }
    # candidate pruning pin at the plan level
    plan = _update_plan(spark, base, partition_filter={"n_regionkey": 2})
    assert [os.path.basename(p) for p in plan["candidate_paths"]] == [
        "rk=2.parquet"
    ]
    v, n_rw = iceberg_update_cow(
        spark, base, "n_nationkey % 2 = 0",
        {"n_name": "concat(n_name, '-UPD')"},
        partition_filter={"n_regionkey": 2},
    )
    assert n_rw == 1
    _, files1, _, _ = iceberg_state(base)
    for f in files1:
        if f["path"] in carried0:
            assert f["seq"] == carried0[f["path"]]
    got = {
        (r.n_nationkey, r.n_regionkey): r.n_name
        for r in iceberg_snapshot(spark, base).collect()
    }
    for (k, rk), name in got.items():
        expect_upd = rk == 2 and k % 2 == 0
        assert name.endswith("-UPD") == expect_upd, (k, rk, name)
    # the rewritten file keeps its typed partition record
    rw = [f for f in files1 if "upd-" in f["path"]]
    assert len(rw) == 1 and rw[0]["partition"] == {"n_regionkey": 2}


def test_update_refuses_partition_column_set_and_nonidentity(
    spark, tmp_path
):
    import json, shutil

    base = _part_table(spark, tmp_path)
    with pytest.raises(ValueError, match="cannot set partition columns"):
        iceberg_update_cow(
            spark, base, "n_nationkey = 1", {"n_regionkey": "n_regionkey + 1"}
        )
    with pytest.raises(ValueError, match="non-partition fields"):
        iceberg_update_cow(
            spark, base, "n_nationkey = 1", {"n_name": "'X'"},
            partition_filter={"n_name": "A"},
        )
    void = str(tmp_path / "void")
    shutil.copytree(base, void)
    vpath = os.path.join(void, "metadata", "v1.metadata.json")
    md = json.load(open(vpath))
    md["partition-specs"][0]["fields"][0]["transform"] = "void"
    json.dump(md, open(vpath, "w"))
    with pytest.raises(NotImplementedError, match="not claimed"):
        iceberg_update_cow(spark, void, "n_nationkey = 1", {"n_name": "'X'"})
