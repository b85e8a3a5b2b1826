"""§2 round-9 batch EY — lakehouse maintenance verbs: OPTIMIZE ZORDER
for Delta (multi-dimensional clustering compaction with per-file stats)
and snapshot EXPIRY for Iceberg (the retention half that makes orphan
cleanup reclaim anything).

- ``delta_optimize_zorder``: rewrite the live set into N files ordered
  and SPLIT by the Morton (z-order) interleave of two columns, each add
  carrying minValues/maxValues stats for those columns — the layout that
  turns two-column predicates into file skips (the point of OPTIMIZE
  ZORDER BY): after clustering, a filter on EITHER column prunes ~half
  the files from stats alone, which the existing
  scan_delta_stats_skipping reader path consumes. dataChange: false —
  streams skip it, CDF emits nothing, time travel to the pre-OPTIMIZE
  version still sees the old layout.
- ``iceberg_expire_snapshots``: drop all but the newest K snapshots from
  table metadata (current always kept). Expiry is PURE METADATA — no
  data file is touched — but it is what licenses physical reclaim:
  composition with surface23's orphan cleanup (whose keep-set is
  "referenced by any RETAINED snapshot") is pinned in tests — files only
  reachable from expired snapshots become reclaimable, files reachable
  from any kept snapshot never are.

Scale notes (SCALE.md batch EY): z-order compaction is one distributed
sort-by-z of the rewritten bytes (range-partitioned rank — no
single-partition sort) and is the ONLY way multi-column skipping
improves at rest; expiry is O(snapshots) driver metadata and bounds the
keep-set walk that orphan cleanup (a distributed listing job at scale)
runs against.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.ranks import with_global_row_number
from ..registry import query
from .delta_reader import _COMMIT_RE, CommitConflict, _commit, delta_snapshot, delta_state
from .iceberg_reader import IcebergCommitConflict, _put_metadata_if_absent, iceberg_append, iceberg_snapshot
from .lakehouse_interop import _build_sink_fixture, _stage_single_parquet
from .sources import _scratch
from .training_prep import _morton_sql


def delta_optimize_zorder(
    spark: SparkSession, base: str, col_a: str, col_b: str, n_files: int = 2
) -> int:
    """OPTIMIZE ZORDER BY (col_a, col_b): rewrite the live set (DVs
    applied) into ``n_files`` files ordered and split by the Morton
    interleave of the two columns' low bits, each add action carrying
    minValues/maxValues stats for the clustered columns. Commit is
    remove(all old) + adds with ``dataChange: false``. Returns the
    committed version."""
    live, schema_string, part_cols, config, dvs = delta_state(spark, base)
    if part_cols:
        raise NotImplementedError(
            "delta_optimize_zorder: per-partition clustering not implemented"
        )
    merged = delta_snapshot(spark, base)
    z = merged.withColumn("__z", F.expr(_morton_sql(col_a, col_b)))
    ranked = with_global_row_number(
        z, [F.asc("__z"), F.asc(col_a), F.asc(col_b)], "__rn", total_col="__tot"
    )
    bucket = ((F.col("__rn") - 1) * n_files / F.col("__tot")).cast("int")
    ranked = ranked.withColumn("__bucket", bucket).cache()
    log_dir = os.path.join(base, "_delta_log")
    commits = sorted(
        int(m.group(1)) for f in os.listdir(log_dir) if (m := _COMMIT_RE.match(f))
    )
    actions: list[dict] = [
        {"commitInfo": {"operation": "OPTIMIZE", "zOrderBy": [col_a, col_b]}}
    ]
    for p in sorted(live):
        actions.append(
            {
                "remove": {
                    "path": p,
                    "deletionTimestamp": 1700000000000,
                    "dataChange": False,
                }
            }
        )
    for i in range(n_files):
        part = ranked.filter(F.col("__bucket") == i).orderBy("__rn")
        # per-file clustered-column stats: one 1-row aggregate per file
        st = part.agg(
            F.min(col_a).alias("a_min"),
            F.max(col_a).alias("a_max"),
            F.min(col_b).alias("b_min"),
            F.max(col_b).alias("b_max"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        rel = f"part-zorder-{i:05d}.parquet"
        _stage_single_parquet(
            part.drop("__z", "__rn", "__tot", "__bucket"),
            os.path.join(base, rel),
        )
        actions.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": 1024,
                    "modificationTime": 1700000000000,
                    "dataChange": False,
                    "stats": json.dumps(
                        {
                            "numRecords": int(st["n"]),
                            "minValues": {col_a: st["a_min"], col_b: st["b_min"]},
                            "maxValues": {col_a: st["a_max"], col_b: st["b_max"]},
                        }
                    ),
                }
            }
        )
    ranked.unpersist()
    version = commits[-1] + 1
    for _ in range(10):
        try:
            _commit(log_dir, version, actions)
            return version
        except CommitConflict:
            version += 1
    raise CommitConflict(f"gave up after 10 contended versions under {log_dir}")


@query(
    "delta_optimize_zorder",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def delta_optimize_zorder_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER round-trip on the sink table: the live files are
    rewritten into two z-clustered files (Morton of nationkey/regionkey)
    with per-file min/max stats for BOTH clustered columns, under
    dataChange:false — content is IDENTICAL (the identity oracle), the
    layout is not: tests pin that each output file is internally
    z-ordered, that every add action carries the two-column stats the
    scan_delta_stats_skipping path consumes, that the split point is the
    Morton median (disjoint z-ranges across files), and that the
    pre-OPTIMIZE version remains time-travelable with the old layout."""
    base = _build_sink_fixture(spark, sf_dir)
    clone = _scratch(sf_dir, "delta_sink_zorder")
    if not os.path.exists(os.path.join(clone, "_FIXTURE_READY")):
        if os.path.isdir(clone):
            shutil.rmtree(clone)
        shutil.copytree(base, clone)
        os.remove(os.path.join(clone, "_FIXTURE_READY"))
        delta_optimize_zorder(spark, clone, "n_nationkey", "n_regionkey")
        with open(os.path.join(clone, "_FIXTURE_READY"), "w") as fh:
            fh.write("ok")
    return delta_snapshot(spark, clone).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def iceberg_expire_snapshots(
    spark: SparkSession, base: str, keep_last: int
) -> tuple[int, list[int]]:
    """Drop all but the newest ``keep_last`` snapshots (by sequence
    number; the current snapshot is always retained) from the table
    metadata, committed as a new metadata version through the same
    put-if-absent swap as every writer. Returns (new metadata version,
    expired snapshot ids). Pure metadata — physical reclaim is orphan
    cleanup's job, whose keep-set this shrinks."""
    meta_dir = os.path.join(base, "metadata")
    import re as _re

    for _ in range(10):
        versions = [
            int(m.group(1))
            for f in os.listdir(meta_dir)
            if (m := _re.match(r"^v(\d+)\.metadata\.json$", f))
        ]
        cur_v = max(versions)
        with open(os.path.join(meta_dir, f"v{cur_v}.metadata.json")) as fh:
            md = json.load(fh)
        snaps = sorted(md.get("snapshots", []), key=lambda s: s["sequence-number"])
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        kept = snaps[-keep_last:]
        kept_ids = {s["snapshot-id"] for s in kept}
        if md.get("current-snapshot-id") not in kept_ids:
            raise ValueError(
                "expiry would drop the CURRENT snapshot "
                f"{md.get('current-snapshot-id')} — refuse"
            )
        expired = [s["snapshot-id"] for s in snaps if s["snapshot-id"] not in kept_ids]
        if not expired:
            return cur_v, []
        new_md = dict(md)
        new_md["snapshots"] = kept
        try:
            _put_metadata_if_absent(meta_dir, cur_v + 1, new_md)
        except IcebergCommitConflict:
            continue
        with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
            fh.write(str(cur_v + 1))
        return cur_v + 1, expired
    raise IcebergCommitConflict(
        f"gave up after 10 contended metadata versions under {meta_dir}"
    )


@query(
    "iceberg_expire_snapshots",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def iceberg_expire_snapshots_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-expiry round-trip: a three-snapshot table (two appends,
    then a rewrite-style third append) expires down to its newest two —
    the CURRENT read is bit-identical (identity oracle), time travel to
    the expired snapshot now raises (pinned), and orphan cleanup's
    keep-set no longer contains files only the expired snapshot could
    reach (the expire→cleanup reclaim composition, pinned in tests).
    This is the retention verb every production table runs on a
    schedule; without it the log grows forever and nothing is ever
    physically reclaimable."""
    base = _scratch(sf_dir, "iceberg_expire")
    if not os.path.exists(os.path.join(base, "_FIXTURE_READY")):
        if os.path.isdir(base):
            shutil.rmtree(base)
        n = load_table(spark, sf_dir, "nation")
        iceberg_append(spark, base, n.filter("n_nationkey < 8"), "a0.parquet")
        iceberg_append(
            spark, base, n.filter("n_nationkey >= 8 AND n_nationkey < 16"), "a1.parquet"
        )
        iceberg_append(spark, base, n.filter("n_nationkey >= 16"), "a2.parquet")
        iceberg_expire_snapshots(spark, base, keep_last=2)
        with open(os.path.join(base, "_FIXTURE_READY"), "w") as fh:
            fh.write("ok")
    return iceberg_snapshot(spark, base).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
