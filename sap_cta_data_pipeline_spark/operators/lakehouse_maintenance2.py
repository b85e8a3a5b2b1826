"""§2 round-9 batch FG — write-side DDL + manifest maintenance.

- ``delta_colmap_rename_drop``: first-class RENAME COLUMN / DROP COLUMN
  writers for column-mapped Delta tables — the verbs column mapping
  EXISTS for: both are METADATA-ONLY commits (a new metaData action with
  the logical name changed / the field removed; the physical names in
  every data file stay untouched), so they are O(1) at 100 TB. Without
  column mapping the same DDL would require rewriting every data file —
  that path refuses loudly rather than silently launching a full-table
  rewrite. Column ids are never reused (maxColumnId only grows), which
  is the invariant that keeps a later re-add of a dropped name from
  resurrecting the dropped column's data.
- ``iceberg_rewrite_manifests``: the maintenance verb for
  many-small-commits tables — N append-sized DATA manifests merge into
  ONE, each merged entry materializing its EXPLICIT sequence_number
  (entry field-id 3; previously inherited from its source manifest) so
  row-level delete gating survives the merge byte-for-byte. Delete
  manifests carry through verbatim; the new snapshot (operation
  "replace") changes no data file, and the pre-rewrite snapshot stays
  time-travelable. Partitioned entries refuse: real rewrite groups
  manifests per partition spec, and this table format fixture set is
  spec-0/unpartitioned — the refusal names the evidence.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..functions.avro_codec import read_container, write_container
from ..registry import query
from .delta_reader import _read_commit, delta_snapshot, delta_state
from .delta_dml import _commit_validated, _log_tip
from .iceberg_reader import (
    _MANIFEST_ENTRY_EQ_SCHEMA,
    _MANIFEST_FILE_SCHEMA,
    _put_metadata_if_absent,
    _resolve_path,
    iceberg_append,
    iceberg_delete_where,
    iceberg_snapshot,
)
from .sources import _scratch


# ---------------------------------------------------------- Delta DDL


def _current_metadata_action(base: str) -> dict:
    """Newest metaData action in the JSON log (commits are the source of
    truth for this repo's fixtures; checkpoint-resident metadata is read
    by delta_state, which every caller consults first)."""
    log_dir = os.path.join(base, "_delta_log")
    from .delta_reader import _COMMIT_RE

    for v in sorted(
        (
            int(m.group(1))
            for f in os.listdir(log_dir)
            if (m := _COMMIT_RE.match(f))
        ),
        reverse=True,
    ):
        for a in _read_commit(log_dir, v):
            if "metaData" in a:
                return json.loads(json.dumps(a["metaData"]))
    raise ValueError(f"no metaData action found under {log_dir}")


def _require_column_mapping(config: dict, verb: str) -> None:
    if config.get("delta.columnMapping.mode") not in ("name", "id"):
        raise NotImplementedError(
            f"{verb} on a table WITHOUT column mapping requires rewriting "
            "every data file under the new physical schema — an O(table) "
            "job this writer will not launch implicitly; enable "
            "delta.columnMapping.mode=name first (metadata-only upgrade)"
        )


def delta_rename_column(
    spark: SparkSession, base: str, old: str, new: str
) -> int:
    """ALTER TABLE ... RENAME COLUMN old TO new — metadata-only: the
    field keeps its columnMapping id and physicalName, only the LOGICAL
    name changes, so every existing data file remains valid. Returns the
    committed version."""
    tip = _log_tip(base)
    _, schema_string, _, config, _ = delta_state(spark, base)
    _require_column_mapping(config, "RENAME COLUMN")
    sch = json.loads(schema_string)
    names = [f["name"] for f in sch["fields"]]
    if old not in names:
        raise ValueError(f"RENAME COLUMN: no such column {old!r} (have {names})")
    if new in names:
        raise ValueError(f"RENAME COLUMN: target name {new!r} already exists")
    for f in sch["fields"]:
        if f["name"] == old:
            f["name"] = new
    meta = _current_metadata_action(base)
    meta["schemaString"] = json.dumps(sch)
    return _commit_validated(
        base,
        tip,
        [
            {
                "commitInfo": {
                    "operation": "RENAME COLUMN",
                    "operationParameters": {"from": old, "to": new},
                }
            },
            {"metaData": meta},
        ],
    )


def delta_drop_column(spark: SparkSession, base: str, col: str) -> int:
    """ALTER TABLE ... DROP COLUMN — metadata-only under column mapping:
    the field leaves the logical schema; its physical column stays in
    the data files as dead bytes (reclaimed by the next OPTIMIZE
    rewrite), and its column id is NEVER reused (maxColumnId is
    monotonic), so a future re-add of the same logical name maps to a
    FRESH physical column instead of resurrecting dropped data. Returns
    the committed version."""
    tip = _log_tip(base)
    _, schema_string, part_cols, config, _ = delta_state(spark, base)
    _require_column_mapping(config, "DROP COLUMN")
    if col in (part_cols or []):
        raise ValueError(
            f"DROP COLUMN: {col!r} is a partition column — dropping it "
            "changes the table layout (requires a rewrite)"
        )
    sch = json.loads(schema_string)
    names = [f["name"] for f in sch["fields"]]
    if col not in names:
        raise ValueError(f"DROP COLUMN: no such column {col!r} (have {names})")
    if len(names) == 1:
        raise ValueError("DROP COLUMN: cannot drop the last column")
    sch["fields"] = [f for f in sch["fields"] if f["name"] != col]
    meta = _current_metadata_action(base)
    meta["schemaString"] = json.dumps(sch)
    return _commit_validated(
        base,
        tip,
        [
            {
                "commitInfo": {
                    "operation": "DROP COLUMNS",
                    "operationParameters": {"columns": [col]},
                }
            },
            {"metaData": meta},
        ],
    )


@query(
    "delta_colmap_rename_drop",
    oracle="SELECT n_nationkey, n_name AS n_label FROM nation",
)
def delta_colmap_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENAME + DROP COLUMN round-trip on a column-mapped table: rename
    n_name → n_label, drop n_regionkey — two metadata-only commits (no
    add/remove actions, pinned in tests), then read back through the
    house column-mapping reader: the renamed column serves the SAME
    physical bytes under its new logical name, the dropped column is
    gone, and the values are untouched. This is the instant-DDL story
    column mapping exists for; both verbs refuse loudly on non-mapped
    tables (where they would imply a full rewrite).

    Scale: two O(1) metadata commits regardless of table size — the
    100-TB cost is a JSON write; the data plane is untouched."""
    from .lakehouse_interop import _build_colmap_fixture

    src = _build_colmap_fixture(spark, sf_dir)
    clone = _scratch(sf_dir, "delta_colmap_ddl")
    if not os.path.exists(os.path.join(clone, "_FIXTURE_READY")):
        if os.path.isdir(clone):
            shutil.rmtree(clone)
        shutil.copytree(src, clone)
        os.remove(os.path.join(clone, "_FIXTURE_READY"))
        delta_rename_column(spark, clone, "n_name", "n_label")
        delta_drop_column(spark, clone, "n_regionkey")
        with open(os.path.join(clone, "_FIXTURE_READY"), "w") as fh:
            fh.write("ok")
    return delta_snapshot(spark, clone).select("n_nationkey", "n_label")


# ------------------------------------------------ Iceberg rewrite manifests


def iceberg_rewrite_manifests(
    spark: SparkSession, base: str
) -> tuple[int, int, int]:
    """Merge the current snapshot's DATA manifests into one; delete
    manifests pass through verbatim. Every merged entry materializes an
    EXPLICIT sequence_number (entry field-id 3 — the value it previously
    inherited from its source manifest record), so position/equality
    delete gating (file seq vs delete seq) is preserved exactly. The new
    snapshot commits as operation "replace" over the SAME data files.
    Returns (version, manifests_before, manifests_after)."""
    meta_dir = os.path.join(base, "metadata")
    import re as _re

    versions = [
        int(m.group(1))
        for f in os.listdir(meta_dir)
        if (m := _re.match(r"^v(\d+)\.metadata\.json$", f))
    ]
    cur_v = max(versions)
    with open(os.path.join(meta_dir, f"v{cur_v}.metadata.json")) as fh:
        prev = json.load(fh)
    snaps = {s["snapshot-id"]: s for s in prev["snapshots"]}
    cur_snap = snaps[prev["current-snapshot-id"]]
    _, manifests = read_container(_resolve_path(base, cur_snap["manifest-list"]))
    data_mfs = [m for m in manifests if m.get("content", 0) == 0]
    delete_mfs = [m for m in manifests if m.get("content", 0) != 0]

    merged: list[dict] = []
    for m in data_mfs:
        _, entries = read_container(_resolve_path(base, m["manifest_path"]))
        for e in entries:
            if e["status"] == 2:  # DELETED — not part of the snapshot
                continue
            df_rec = e["data_file"]
            if df_rec.get("partition"):
                raise NotImplementedError(
                    "rewrite_manifests on PARTITIONED entries: manifests "
                    "group per partition spec "
                    f"(entry {df_rec['file_path']!r} carries partition "
                    f"record {df_rec['partition']!r}); this writer merges "
                    "unpartitioned (spec-0) manifests only"
                )
            seq = e.get("sequence_number")
            if seq is None:
                seq = m.get("sequence_number", 0)
            merged.append(
                {
                    "status": 0,  # EXISTING: carried forward, not added
                    "snapshot_id": e.get("snapshot_id")
                    or m.get("added_snapshot_id"),
                    "sequence_number": seq,  # explicit — survives the merge
                    "data_file": {
                        "content": df_rec.get("content", 0),
                        "file_path": df_rec["file_path"],
                        "file_format": df_rec.get("file_format", "PARQUET"),
                        "partition": {},
                        "record_count": df_rec["record_count"],
                        "file_size_in_bytes": df_rec["file_size_in_bytes"],
                        "equality_ids": df_rec.get("equality_ids"),
                    },
                }
            )

    seq_new = prev.get("last-sequence-number", 0) + 1
    snap_id = 1000 + seq_new
    mrel = f"m-rewrite-{snap_id}.avro"
    write_container(
        os.path.join(meta_dir, mrel), _MANIFEST_ENTRY_EQ_SCHEMA, merged
    )
    merged_rec = {
        "manifest_path": "file://" + os.path.join(meta_dir, mrel),
        "manifest_length": os.path.getsize(os.path.join(meta_dir, mrel)),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq_new,
        "min_sequence_number": min(
            (e["sequence_number"] for e in merged), default=seq_new
        ),
        "added_snapshot_id": snap_id,
    }
    mlrel = f"snap-{snap_id}.avro"
    write_container(
        os.path.join(meta_dir, mlrel),
        _MANIFEST_FILE_SCHEMA,
        [merged_rec] + delete_mfs,
    )
    md = dict(prev)
    snap = {
        "snapshot-id": snap_id,
        "sequence-number": seq_new,
        "timestamp-ms": 1700000000000 + seq_new,
        "manifest-list": "file://" + os.path.join(meta_dir, mlrel),
        "summary": {"operation": "replace"},
        "schema-id": 0,
    }
    md["last-sequence-number"] = seq_new
    md["last-updated-ms"] = snap["timestamp-ms"]
    md["current-snapshot-id"] = snap_id
    md["snapshots"] = list(md.get("snapshots", [])) + [snap]
    _put_metadata_if_absent(meta_dir, cur_v + 1, md)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(cur_v + 1))
    return cur_v + 1, len(manifests), 1 + len(delete_mfs)


@query(
    "iceberg_rewrite_manifests",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE NOT (n_nationkey % 8 = 1)
    """,
)
def iceberg_rewrite_manifests_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """rewrite_manifests round-trip: three appends (three single-entry
    DATA manifests) + one position DELETE (a delete manifest), then the
    manifest merge — the read-back must equal the pre-rewrite merged
    state, with the delete STILL applied through its sequence gate
    against the now-explicit entry sequence numbers. Tests pin the
    manifest count (4 → 2), the explicit per-entry seq, and pre-rewrite
    time travel.

    Scale: manifest rewrite is O(metadata) — entries stream through the
    driver like every commit-planning step; no data file is opened. At
    100 TB this is the verb that keeps scan PLANNING fast after
    thousands of small appends (planning reads manifests, not files)."""
    from ..catalog import load_table

    base = _scratch(sf_dir, "iceberg_rewrite_manifests")
    if not os.path.exists(os.path.join(base, "_FIXTURE_READY")):
        n = load_table(spark, sf_dir, "nation")
        iceberg_append(spark, base, n.filter("n_nationkey < 8"), "a0.parquet")
        iceberg_append(
            spark, base, n.filter("n_nationkey >= 8 AND n_nationkey < 16"),
            "a1.parquet",
        )
        iceberg_append(spark, base, n.filter("n_nationkey >= 16"), "a2.parquet")
        iceberg_delete_where(spark, base, "n_nationkey % 8 = 1")
        iceberg_rewrite_manifests(spark, base)
        with open(os.path.join(base, "_FIXTURE_READY"), "w") as fh:
            fh.write("ok")
    return iceberg_snapshot(spark, base).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


# ------------------------------------------- batch FO: metadata surfaces


def iceberg_manifests_meta(spark: SparkSession, base: str) -> DataFrame:
    """`.manifests` metadata table of the CURRENT snapshot: one row per
    manifest-list entry with its content code, sequence bounds, and the
    live (status != DELETED) entry count — what a maintenance planner
    reads to decide WHEN rewrite_manifests is worth running. O(manifest
    bytes) driver work, zero data-file reads."""
    meta_dir = os.path.join(base, "metadata")
    import re as _re

    versions = [
        int(m.group(1))
        for f in os.listdir(meta_dir)
        if (m := _re.match(r"^v(\d+)\.metadata\.json$", f))
    ]
    with open(os.path.join(meta_dir, f"v{max(versions)}.metadata.json")) as fh:
        md = json.load(fh)
    snap = {s["snapshot-id"]: s for s in md["snapshots"]}[
        md["current-snapshot-id"]
    ]
    _, manifests = read_container(_resolve_path(base, snap["manifest-list"]))
    rows = []
    for m in manifests:
        _, entries = read_container(_resolve_path(base, m["manifest_path"]))
        rows.append(
            (
                os.path.basename(m["manifest_path"]),
                int(m.get("content", 0)),
                int(m.get("sequence_number", 0)),
                int(m.get("min_sequence_number", 0)),
                sum(1 for e in entries if e["status"] != 2),
            )
        )
    return spark.createDataFrame(
        rows,
        "manifest_name string, content int, sequence_number bigint, "
        "min_sequence_number bigint, live_entries bigint",
    )


@query(
    "iceberg_manifests_meta",
    oracle="""
    SELECT * FROM (VALUES
      ('m-del-1004.avro', 1, CAST(4 AS BIGINT), CAST(4 AS BIGINT),
       CAST(1 AS BIGINT)),
      ('m-rewrite-1005.avro', 0, CAST(5 AS BIGINT), CAST(1 AS BIGINT),
       CAST(3 AS BIGINT))
    ) t(manifest_name, content, sequence_number, min_sequence_number,
        live_entries)
    """,
)
def iceberg_manifests_meta_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`.manifests` over the rewrite_manifests fixture: after the merge
    the current snapshot carries exactly TWO manifests — the rewritten
    data manifest (3 live entries, min_seq 1 from the explicit entry
    seqs, manifest seq 5) and the untouched delete manifest (seq 4) —
    pinned literally. The planner-facing proof that rewrite_manifests
    did its job (4 manifests → 2) without touching delete metadata."""
    iceberg_rewrite_manifests_read.__wrapped__(spark, sf_dir)
    base = _scratch(sf_dir, "iceberg_rewrite_manifests")
    return iceberg_manifests_meta(spark, base)


def _protocol_action(base: str) -> dict:
    """Newest protocol action in the JSON log."""
    log_dir = os.path.join(base, "_delta_log")
    from .delta_reader import _COMMIT_RE

    for v in sorted(
        (
            int(m.group(1))
            for f in os.listdir(log_dir)
            if (m := _COMMIT_RE.match(f))
        ),
        reverse=True,
    ):
        for a in _read_commit(log_dir, v):
            if "protocol" in a:
                return a["protocol"]
    return {"minReaderVersion": 1, "minWriterVersion": 2}


@query(
    "delta_describe_detail",
    oracle="""
    SELECT * FROM (VALUES
      ('parquet', CAST(2 AS BIGINT), CAST(3 AS BIGINT), 0,
       'name', 2, 5)
    ) t(format, num_files, num_columns, num_partition_columns,
        column_mapping_mode, min_reader_version, min_writer_version)
    """,
)
def delta_describe_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE DETAIL over the column-mapping fixture: live file count
    from log replay, column count from the schemaString, partition
    arity, the columnMapping mode, and the protocol floor (2/5 — the
    versions column mapping requires) — the one-row health card an
    operator checks before running maintenance. Metadata-only: O(log)
    driver work, no data file opened.

    Scale: identical cost at 100 TB — DESCRIBE DETAIL is a log replay,
    which checkpoints bound exactly as delta_state already does."""
    from .lakehouse_interop import _build_colmap_fixture

    base = _build_colmap_fixture(spark, sf_dir)
    live, schema_string, part_cols, config, _ = delta_state(spark, base)
    proto = _protocol_action(base)
    sch = json.loads(schema_string)
    return spark.createDataFrame(
        [
            (
                "parquet",
                len(live),
                len(sch["fields"]),
                len(part_cols or []),
                config.get("delta.columnMapping.mode", "none"),
                int(proto.get("minReaderVersion", 1)),
                int(proto.get("minWriterVersion", 2)),
            )
        ],
        "format string, num_files bigint, num_columns bigint, "
        "num_partition_columns int, column_mapping_mode string, "
        "min_reader_version int, min_writer_version int",
    )
