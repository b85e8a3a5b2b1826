"""§2 round-10 batch GA — Iceberg changelog scan (incremental CDC).

The Iceberg symmetry of the Delta CDF lanes: compute the row-level
changes BETWEEN two snapshots from pure metadata + the referenced
files, without the table carrying a change log. Semantics follow
Iceberg's changelog scan-task taxonomy:

- data files ADDED between the snapshots emit their rows as INSERTs
  (net of any deletes already applied to them at the target snapshot —
  a row added and deleted inside the window never existed externally);
- data files REMOVED emit the rows that were LIVE at the source
  snapshot as DELETEs (not the raw file: rows already dead at the
  source must not be "re-deleted");
- POSITION deletes newly applied to carried-over files emit exactly
  those positions' rows as DELETEs.

A copy-on-write rewrite therefore shows up as DELETE(old rows) +
INSERT(new rows) — exactly what a changelog consumer without row
lineage can know. Equality deletes and Puffin DVs in the window are
REFUSED loudly (their application is sequence-gated per file; a silent
approximation would emit wrong deltas), matching the repo's
unsupported-feature refusal discipline.

Scale: planning is driver-side metadata (two manifest walks + a file
set diff); row emission is distributed parquet scans of ONLY the
changed files plus (file,pos) anti-joins against the window's delete
files — O(changed data), never O(table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .iceberg_reader import iceberg_state


def _tagged_live(
    spark: SparkSession, schema, data_files: list[dict], pos_deletes: list[dict]
) -> DataFrame:
    """Live rows of a snapshot with (``__fp``, ``__pos``) tags; parquet
    position deletes applied at the scan (the fixture scope — eq/DV
    windows are refused by the caller)."""
    from pyspark.sql import types as T

    if not data_files:  # e.g. the pre-first-append snapshot of a window
        return spark.createDataFrame(
            [],
            T.StructType(
                schema.fields
                + [
                    T.StructField("__fp", T.StringType()),
                    T.StructField("__pos", T.LongType()),
                ]
            ),
        )
    df = spark.read.schema(schema).parquet(*[d["path"] for d in data_files])
    tagged = df.select(
        "*",
        F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/").alias(
            "__fp"
        ),
        F.col("_metadata.row_index").alias("__pos"),
    )
    if not pos_deletes:
        return tagged
    dels = spark.read.parquet(*[d["path"] for d in pos_deletes]).select(
        F.regexp_replace(F.col("file_path"), "^file:/+", "/").alias("__fp"),
        F.col("pos").alias("__pos"),
    )
    return tagged.join(dels, ["__fp", "__pos"], "left_anti")


def iceberg_changelog(
    spark: SparkSession, base: str, from_sid: int, to_sid: int
) -> DataFrame:
    """Row-level INSERT/DELETE records between two snapshots (the state
    diff keyed by (file, position) — stable because Iceberg data files
    are immutable)."""
    schema, d_a, p_a, e_a = iceberg_state(base, from_sid)
    _, d_b, p_b, e_b = iceberg_state(base, to_sid)
    if e_a or e_b or any(
        d.get("format") == "puffin" for d in list(p_a) + list(p_b)
    ):
        raise ValueError(
            "changelog scan over equality deletes / deletion vectors is "
            "not supported — their per-file sequence gating cannot be "
            "diffed as plain position sets; refusing rather than emitting "
            "approximate deltas"
        )
    live_a = _tagged_live(spark, schema, d_a, p_a)
    live_b = _tagged_live(spark, schema, d_b, p_b)
    deletes = live_a.join(live_b.select("__fp", "__pos"), ["__fp", "__pos"],
                          "left_anti")
    inserts = live_b.join(live_a.select("__fp", "__pos"), ["__fp", "__pos"],
                          "left_anti")
    cols = [f.name for f in schema.fields]
    return (
        deletes.select(*cols, F.lit("DELETE").alias("change_type"))
        .unionByName(
            inserts.select(*cols, F.lit("INSERT").alias("change_type"))
        )
        .withColumn("commit_snapshot_id", F.lit(to_sid).cast("bigint"))
    )


@query(
    "iceberg_changelog_scan",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           'DELETE'                 AS change_type,
           CAST(1002 AS BIGINT)     AS commit_snapshot_id
    FROM nation WHERE n_nationkey IN (1, 3, 5, 12, 14)
    """,
)
def iceberg_changelog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog between the two-snapshot fixture's states: snapshot
    1002 applied one position-delete file (rows 1,3,5 of part-lo and
    0,2 of part-hi), so the window emits exactly those five rows as
    DELETEs, committed at 1002 — value-oracled cell-by-cell. INSERT
    emission (the reversed window), the empty same-snapshot window,
    and the eq-delete refusal are pinned in tests/test_surface54.py.
    (Intra-window add+delete cancellation is structural: INSERTs come
    from _tagged_live at the TARGET snapshot, which applies the
    target's deletes to the added files before emission.)"""
    from .iceberg_reader import _fixture

    base = _fixture(spark, sf_dir)
    return iceberg_changelog(spark, base, 1001, 1002)
