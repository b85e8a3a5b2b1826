"""§2 round-11 batch GI — Iceberg writer-side schema evolution.

The Iceberg symmetry of batch GF's Delta mergeSchema lane: an append
whose frame carries NEW columns commits a NEW schema (fresh field ids
from ``last-column-id``, the spec's add-column evolution) in the SAME
metadata swap as the snapshot — one atomic version. Old data files are
untouched; the reader serves typed NULLs for fields a file predates
(the name-based missing-column rule the read lane already pins in
``scan_iceberg_schema_evolution``).

Additive only, by design: a frame column whose TYPE conflicts with the
declared field refuses loudly. Iceberg does define lossless promotions
(int→long, float→double) — that widening lane is the Delta batch GH
twin and is refused here with the promotion named, so the failure mode
is a pointer, not a mystery. Field ids make this safe where name-based
systems break: a re-added column gets a FRESH id, never inheriting a
dropped predecessor's data.

Scale: evolution is one metadata.json swap — new schemas list entry,
bumped current-schema-id/last-column-id. The append itself stays one
staged parquet + one manifest. Nothing about the table's size appears
anywhere in the cost.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .iceberg_reader import (
    _MANIFEST_FILE_SCHEMA,
    _current_schema,
    _iceberg_fields_of,
    _load_metadata,
    _manifest_file_rec,
    _put_metadata_if_absent,
    _resolve_path,
    iceberg_append,
    iceberg_snapshot,
    IcebergCommitConflict,
)
from .sources import _scratch

from ..functions.avro_codec import read_container, write_container


def iceberg_append_evolved(
    spark: SparkSession, base: str, df: DataFrame, file_name: str
) -> int:
    """Append ``df`` to an EXISTING Iceberg table, evolving the schema
    additively when the frame carries new columns (see module
    docstring). Returns the committed metadata version. Commit pattern
    cites iceberg_reader.iceberg_append (probe-the-tip put-if-absent)."""
    from .iceberg_reader import (
        _MANIFEST_ENTRY_EQ_SCHEMA,
        _eq_entry,
    )
    from .lakehouse_interop import _stage_single_parquet

    meta_dir = os.path.join(base, "metadata")
    if not os.path.isdir(meta_dir):
        raise FileNotFoundError(
            f"no Iceberg table under {base} — evolved append targets an "
            "existing table (create with iceberg_append first)"
        )

    import re as _re

    def _read_tip() -> tuple[int, dict]:
        versions = [
            int(m.group(1))
            for f in os.listdir(meta_dir)
            if (m := _re.match(r"^v(\d+)\.metadata\.json$", f))
        ]
        if not versions:
            raise FileNotFoundError(
                f"no Iceberg table under {base} — evolved append targets "
                "an existing table (create with iceberg_append first)"
            )
        cur_v = max(versions)
        with open(os.path.join(meta_dir, f"v{cur_v}.metadata.json")) as fh:
            return cur_v, json.load(fh)

    frame_fields = _iceberg_fields_of(df.schema)

    def _evolve_plan(prev: dict) -> tuple[list[dict], list[dict], int]:
        """Validate the frame against ``prev``'s schema; the evolved
        column list. Raises the type-conflict refusal."""
        fields = [dict(f) for f in _current_schema(prev)]
        by_name = {f["name"]: f for f in fields}
        last_col = prev.get("last-column-id", len(fields))
        new_cols: list[dict] = []
        for ff in frame_fields:
            tgt = by_name.get(ff["name"])
            if tgt is None:
                last_col += 1
                new_cols.append(
                    {
                        "id": last_col,  # FRESH id — never reuse a dropped one
                        "name": ff["name"],
                        "required": False,  # new columns must be optional:
                        # existing rows have no value for them
                        "type": ff["type"],
                    }
                )
            elif tgt["type"] != ff["type"]:
                promo = (
                    " (a lossless promotion — the typeWidening lane; this "
                    "additive-evolution writer does not promote)"
                    if (tgt["type"], ff["type"])
                    in {("int", "long"), ("float", "double")}
                    else ""
                )
                raise ValueError(
                    f"schema evolution: appended column {ff['name']!r} has "
                    f"Iceberg type {ff['type']} but the table declares "
                    f"{tgt['type']}{promo}; cast the frame explicitly"
                )
        return fields, new_cols, last_col

    # validate against the current tip BEFORE staging any data (round-11
    # advice: a refusal must not leave an orphaned file under data/ that
    # no manifest references — the Delta and Hudi lanes validate first)
    _evolve_plan(_read_tip()[1])
    data_path = os.path.join(base, "data", file_name)
    os.makedirs(os.path.dirname(data_path), exist_ok=True)
    _stage_single_parquet(df, data_path)
    n_rows = df.count()

    def _unstage() -> None:
        try:
            os.remove(data_path)
        except OSError:
            pass

    for _ in range(10):
        cur_v, prev = _read_tip()
        try:
            fields, new_cols, last_col = _evolve_plan(prev)
        except ValueError:
            # schema changed under contention into a conflict: the
            # staged file must not orphan (round-11 advice)
            _unstage()
            raise

        seq = prev.get("last-sequence-number", 0) + 1
        snap_id = 1000 + seq
        mrel = f"m-{snap_id}.avro"
        write_container(
            os.path.join(meta_dir, mrel),
            _MANIFEST_ENTRY_EQ_SCHEMA,
            [_eq_entry(base, file_name, 0, n_rows, seq)],
        )
        prev_manifests: list[dict] = []
        if prev.get("current-snapshot-id") is not None:
            snaps = {s["snapshot-id"]: s for s in prev["snapshots"]}
            _, prev_manifests = read_container(
                _resolve_path(
                    base, snaps[prev["current-snapshot-id"]]["manifest-list"]
                )
            )
        mlrel = f"snap-{snap_id}.avro"
        write_container(
            os.path.join(meta_dir, mlrel),
            _MANIFEST_FILE_SCHEMA,
            prev_manifests + [_manifest_file_rec(base, mrel, 0, snap_id, seq)],
        )
        md = dict(prev)
        schema_id = prev.get("current-schema-id", 0)
        if new_cols:
            # the evolved schema is a NEW entry (old snapshots keep
            # addressing their schema-id); current-schema-id moves in
            # the SAME metadata swap as the snapshot — one atomic commit
            schema_id = (
                max(s.get("schema-id", 0) for s in prev.get("schemas", []))
                + 1
            )
            md["schemas"] = list(prev.get("schemas", [])) + [
                {
                    "type": "struct",
                    "schema-id": schema_id,
                    "fields": fields + new_cols,
                }
            ]
            md["current-schema-id"] = schema_id
            md["last-column-id"] = last_col
        snap = {
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "timestamp-ms": 1700000000000 + seq,
            "manifest-list": "file://" + os.path.join(meta_dir, mlrel),
            "summary": {"operation": "append"},
            "schema-id": schema_id,
        }
        md["last-sequence-number"] = seq
        md["last-updated-ms"] = snap["timestamp-ms"]
        md["current-snapshot-id"] = snap_id
        md["snapshots"] = list(md.get("snapshots", [])) + [snap]
        try:
            _put_metadata_if_absent(meta_dir, cur_v + 1, md)
        except IcebergCommitConflict:
            continue
        with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
            fh.write(str(cur_v + 1))
        return cur_v + 1
    _unstage()  # give-up path: no manifest references the staged file
    raise IcebergCommitConflict(
        f"gave up after 10 contended metadata versions under {meta_dir}"
    )


def _build_evolved_fixture(spark: SparkSession, sf_dir: str) -> str:
    base = _scratch(sf_dir, "iceberg_write_evolve")
    if not os.path.exists(os.path.join(base, "_FIXTURE_READY")):
        n = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        iceberg_append(spark, base, n.filter("n_nationkey < 12"), "a0.parquet")
        hi = n.filter("n_nationkey >= 12").withColumn(
            "n_name_len", F.length("n_name").cast("int")
        )
        iceberg_append_evolved(spark, base, hi, "a1.parquet")
        with open(os.path.join(base, "_FIXTURE_READY"), "w") as fh:
            fh.write("ok")
    return base


@query(
    "iceberg_append_schema_evolution",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           CASE WHEN n_nationkey >= 12
                THEN CAST(length(n_name) AS INT) END AS n_name_len
    FROM nation
    """,
)
def iceberg_append_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Writer-side Iceberg schema evolution round-trip: the second
    append carries a NEW ``n_name_len`` column — the evolved schema
    (fresh field id from last-column-id) and the snapshot commit in ONE
    metadata swap; the pre-evolution file reads back with typed NULLs.
    Value-oracled cell-by-cell through the repo's own snapshot reader.
    Fresh-id allocation, one-swap atomicity, the type-conflict refusal
    (with the promotion pointer), and old-snapshot schema addressing
    are pinned in tests/test_surface59.py."""
    base = _build_evolved_fixture(spark, sf_dir)
    return iceberg_snapshot(spark, base).select(
        "n_nationkey", "n_name", "n_regionkey", "n_name_len"
    )
