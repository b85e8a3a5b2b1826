"""§2 round-12 batch GP — DML/streaming symmetry across the tri-format
matrix.

Round 11 closed the Iceberg MERGE hole; this batch closes the remaining
asymmetries a format-switching user hits next:

- ``iceberg_update_cow_roundtrip`` — predicate UPDATE as ONE
  copy-on-write snapshot commit, the Iceberg member of the family
  Delta already has (``delta_update_cow_roundtrip``). Matched files
  are found by a column-pruned predicate scan over the tagged live
  set (DISTINCT paths to the driver — file-count bounded, the
  surface63 MERGE discipline); each is rewritten with the SET applied
  to predicate rows only; the commit is surface63's shared
  ``_commit_cow_swap`` (read-set validated, affected manifests
  rewritten, untouched manifests carried by pointer).
- ``hudi_delete_cow`` — predicate DELETE on the Hudi CoW table
  (Delta: ``delta_delete_dv_roundtrip``; Iceberg:
  ``iceberg_dv_delete_roundtrip``; Hudi had only upsert). Hit file
  groups are found by a distributed predicate probe (DISTINCT fileIds
  to the driver), each rewritten as a survivors-only new slice —
  Hudi's delete-as-upsert-of-EmptyPayload shape: a group emptied
  entirely still writes its (zero-row) slice so the group's latest
  version reflects the delete, exactly how a CoW Hudi writer records
  it.
- ``stream_hudi_incremental_tail`` — the §2-K streaming twin for Hudi
  (Iceberg has snapshot + changelog tails, Delta has the CDF tail;
  Hudi's incremental query existed only as a batch scan). Offsets are
  COMMIT INSTANT TIMES (lexicographic == numeric by the timeline's
  width discipline); each micro-batch drains the instants completed
  since the last offset and emits the rows WRITTEN at each instant —
  Hudi incremental-query semantics: rows whose
  ``_hoodie_commit_time`` equals the instant, read from ONLY the
  slices that instant's commit metadata names (never the table).
  Replay (the pure ``partitions(start, end)`` split plan) is exact
  because completed instants and their slices are immutable; slice
  reads run on EXECUTORS (round 14 — the Simple reader produced every
  row driver-side).

Scale: all three are change-bounded. The UPDATE scans the predicate
column once (Catalyst prunes the rest) and rewrites only files with
matches; the DELETE probes with one semi-join and rewrites only hit
groups; the tail reads per-instant slice files named by commit
metadata — O(instant write volume) per micro-batch at any table size.
"""

from __future__ import annotations

import os
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .sources import _scratch
from .surface63 import _commit_cow_swap


# ---------------------------------------------------------------- Iceberg


def iceberg_update_cow(
    spark: SparkSession,
    base: str,
    predicate: str,
    set_map: dict[str, str],
    partition_filter: dict | None = None,
) -> tuple[int, int]:
    """Copy-on-write ``UPDATE <table> SET <set_map> WHERE <predicate>``
    as ONE snapshot commit. ``set_map`` maps column name → SQL
    expression (evaluated against the pre-update row, as SQL UPDATE
    does). Returns (new metadata version, files rewritten); a
    no-match UPDATE is a no-op that commits nothing. Refusals inherit
    the MERGE plan's: non-identity partition transforms, equality
    deletes; setting a partition column is refused (a CoW file rewrite
    keeps rows in their file's partition).

    ``partition_filter`` (identity partition column → value) prunes
    candidate files driver-side from pure manifest metadata AND is
    AND-composed into the row predicate, so semantics stay exact
    whatever filter is passed: a row outside the filter partitions
    never matches the effective predicate — unlike the MERGE's filter
    (which needs the source-side guard), a wrong UPDATE filter can
    only narrow the statement, never corrupt it. A date-partitioned
    100 TB UPDATE prices by the touched partitions."""
    from .lakehouse_interop import _stage_single_parquet
    import pyarrow.parquet as _pq

    plan = _update_plan(spark, base, partition_filter=partition_filter)
    schema, cols, live = plan["schema"], plan["cols"], plan["live"]
    bad = sorted(set(set_map) - set(cols))
    if bad:
        raise ValueError(f"UPDATE SET names non-columns: {bad}")
    bad_part = sorted(set(set_map) & set(plan["part_cols"]))
    if bad_part:
        raise ValueError(
            f"UPDATE cannot set partition columns {bad_part}: a "
            "copy-on-write file rewrite keeps every row in its file's "
            "partition; delete + insert to move rows"
        )
    if live is None:
        return plan["read_version"], 0
    type_of = {f.name: f.dataType for f in schema.fields}
    pred = F.expr(predicate)
    if partition_filter:
        # AND-compose the filter into the row predicate through the
        # TRANSFORM (identity: the column itself; day/bucket/truncate:
        # the re-evaluated partition value) — pruning and semantics
        # agree by construction whatever filter is passed.
        from ..functions.transforms import transform_expr

        pf_of = {pf["pname"]: pf for pf in plan["pfields"]}
        for k, v in partition_filter.items():
            pf = pf_of[k]
            pred = pred & transform_expr(
                pf["transform"], pf["src"], type_of[pf["src"]]
            ).eqNullSafe(F.lit(v))
    matched_paths = sorted(
        r["__fp"]
        for r in live.filter(pred).select("__fp").distinct().collect()
    )
    if not matched_paths:
        return plan["read_version"], 0
    uid = _uuid.uuid4().hex[:12]
    new_files: list[tuple[str, int, dict]] = []
    for i, fp in enumerate(matched_paths):
        rows = live.filter(F.col("__fp") == fp).drop("__fp", "__pos")
        rewritten = rows.select(
            *[
                (
                    F.when(pred, F.expr(set_map[c]))
                    .otherwise(F.col(c))
                    .cast(type_of[c])
                    .alias(c)
                    if c in set_map
                    else F.col(c)
                )
                for c in cols
            ]
        )
        rel = f"upd-{uid}-{i}.parquet"
        abs_path = os.path.join(base, "data", rel)
        _stage_single_parquet(rewritten, abs_path)
        new_files.append(
            (rel, _pq.ParquetFile(abs_path).metadata.num_rows,
             plan["part_of"][fp])
        )
    _commit_cow_swap(
        base, plan["meta"], plan["read_version"], set(matched_paths),
        new_files, tag="upd",
    )
    return plan["read_version"] + 1, len(matched_paths)


def _update_plan(
    spark: SparkSession, base: str, partition_filter: dict | None = None
) -> dict:
    """The MERGE planner minus the source semi-join: validated metadata
    + tagged live set (same refusals: non-identity partition
    transforms, equality deletes). ``partition_filter`` prunes the
    candidate file set driver-side from the manifests."""
    from .iceberg_reader import _load_metadata, iceberg_state
    from .surface63 import _partition_info

    from .surface54 import _delete_key, _live_rows

    meta = _load_metadata(base)
    part_cols, _spec, pfields = _partition_info(meta, "iceberg_update_cow")
    pnames = [pf["pname"] for pf in pfields]
    if partition_filter:
        unknown = sorted(set(partition_filter) - set(pnames))
        if unknown:
            raise ValueError(
                f"partition_filter names non-partition fields {unknown}; "
                f"partition fields are {pnames} (values are TRANSFORMED "
                "partition values, e.g. epoch days for a day transform)"
            )
    schema, data_files, pos_dels, eq_dels = iceberg_state(
        base, partition_filter=partition_filter
    )
    if eq_dels:
        raise ValueError(
            "UPDATE over equality deletes is not supported — their "
            "strictly-smaller-sequence application cannot be carried "
            "through the tagged copy-on-write rewrite; compact first"
        )
    dels_map = {_delete_key(d): d for d in pos_dels}
    pieces = _live_rows(spark, schema, data_files, dels_map)
    live = pieces[0] if pieces else None
    for extra in pieces[1:]:
        live = live.unionByName(extra)
    return {
        "meta": meta,
        "schema": schema,
        "cols": [f.name for f in schema.fields],
        "live": live,
        "part_cols": part_cols,
        "pfields": pfields,
        "candidate_paths": sorted(f["path"] for f in data_files),
        "part_of": {
            f["path"]: f.get("partition") or {} for f in data_files
        },
        "read_version": max(
            int(f[1:].split(".")[0])
            for f in os.listdir(os.path.join(base, "metadata"))
            if f.startswith("v") and f.endswith(".metadata.json")
        ),
    }


def _build_update_fixture(spark: SparkSession, sf_dir: str) -> str:
    from .iceberg_reader import iceberg_append

    base = _scratch(sf_dir, "iceberg_update_cow")
    if not os.path.exists(os.path.join(base, "_FIXTURE_READY")):
        n = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        iceberg_append(spark, base, n.filter("n_nationkey < 12"), "a0.parquet")
        iceberg_append(spark, base, n.filter("n_nationkey >= 12"), "a1.parquet")
        iceberg_update_cow(
            spark,
            base,
            "n_regionkey = 2",
            {"n_name": "concat(n_name, '-UPD')", "n_regionkey": "n_regionkey + 10"},
        )
        with open(os.path.join(base, "_FIXTURE_READY"), "w") as fh:
            fh.write("ok")
    return base


@query(
    "iceberg_update_cow_roundtrip",
    oracle="""
    SELECT n_nationkey,
           CASE WHEN n_regionkey = 2 THEN n_name || '-UPD' ELSE n_name END
             AS n_name,
           CASE WHEN n_regionkey = 2 THEN n_regionkey + 10
                ELSE n_regionkey END AS n_regionkey
    FROM nation
    """,
)
def iceberg_update_cow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate UPDATE on an Iceberg CoW table, one snapshot commit
    (tri-format DML symmetry: the Delta twin is
    delta_update_cow_roundtrip). region-2 nations are renamed AND
    re-keyed in both files; the snapshot reader answers the updated
    table, value-oracled cell-by-cell. The matched-file bound, the
    multi-column SET evaluating against PRE-update rows, the no-match
    no-op, and the concurrent-commit abort are pinned in
    tests/test_surface66.py."""
    from .iceberg_reader import iceberg_snapshot

    base = _build_update_fixture(spark, sf_dir)
    return iceberg_snapshot(spark, base)


# ------------------------------------------------------------------ Hudi


def hudi_delete(
    spark: SparkSession, base: str, predicate: str
) -> tuple[str, int]:
    """Predicate DELETE on the Hudi CoW table: rewrite every file group
    containing a matching row as a survivors-only new slice (a fully
    emptied group writes a zero-row slice — the group's latest version
    records the delete, Hudi's delete-as-empty-payload-upsert shape).
    Returns (completed instant time, groups rewritten)."""
    from .hudi_write import _complete_instant, _next_instant, _timeline_dir
    from .lakehouse_interop import _stage_single_parquet, hudi_cow_state

    tl = _timeline_dir(base)
    groups = hudi_cow_state(base)
    if not groups:
        raise ValueError(f"hudi_delete: no completed commits under {base}")
    instant = _next_instant(tl)
    df = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(base, p) for p in sorted(groups.values())]
    ).withColumn(
        "__file", F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
    )
    path_to_fid = {os.path.basename(p): fid for fid, p in groups.items()}
    fid_map = F.create_map(
        *[F.lit(x) for kv in sorted(path_to_fid.items()) for x in kv]
    )
    df = df.withColumn("__fid", fid_map[F.col("__file")])
    pred = F.expr(predicate)
    # distributed probe: DISTINCT fileIds with a match (bounded by
    # file-group count — same envelope as the upsert writer's probe)
    hit_fids = sorted(
        r["__fid"]
        for r in df.filter(pred).select("__fid").distinct().collect()
    )
    writes: list[tuple[str, str]] = []
    for fid in hit_fids:
        survivors = (
            df.filter(F.col("__fid") == fid)
            .filter(~F.coalesce(pred, F.lit(False)))
            .drop("__file", "__fid")
        )
        rel = f"{fid}_0-0-0_{instant}.parquet"
        _stage_single_parquet(survivors, os.path.join(base, rel))
        writes.append((fid, rel))
    if not writes:
        return instant, 0  # no-match delete: nothing committed
    _complete_instant(tl, instant, writes)
    return instant, len(writes)


def _build_hudi_delete_fixture(spark: SparkSession, sf_dir: str) -> str:
    from .hudi_write import hudi_cow_upsert

    base = _scratch(sf_dir, "hudi_delete_cow")
    if not os.path.exists(os.path.join(base, "_FIXTURE_READY")):
        n = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        hudi_cow_upsert(spark, base, n.filter("n_nationkey < 12"), "n_nationkey")
        hudi_cow_upsert(spark, base, n.filter("n_nationkey >= 12"), "n_nationkey")
        hudi_delete(spark, base, "n_regionkey = 1")
        with open(os.path.join(base, "_FIXTURE_READY"), "w") as fh:
            fh.write("ok")
    return base


@query(
    "hudi_delete_cow",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation WHERE n_regionkey <> 1
    """,
)
def hudi_delete_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate DELETE on a Hudi CoW table (tri-format DML symmetry:
    Delta deletes via DVs, Iceberg via position deletes, Hudi rewrites
    survivors-only slices). Both file groups contain region-1 nations,
    so both are rewritten at the delete instant; the snapshot reader
    answers the surviving rows, value-oracled cell-by-cell. The
    hit-group bound, the no-match no-op, and time travel to the
    pre-delete instant are pinned in tests/test_surface66.py."""
    from .lakehouse_interop import hudi_cow_snapshot

    base = _build_hudi_delete_fixture(spark, sf_dir)
    return hudi_cow_snapshot(spark, base).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


# ------------------------------------------------- Hudi streaming tail


def _hudi_instant_files(base: str, instant: str) -> list[tuple]:
    """Slices WRITTEN at ``instant`` — Hudi incremental-query planning:
    (absolute slice path, instant) for every slice the commit metadata
    names. METADATA only (one commit JSON), never a data file; the
    driver-side planning half of the partition-based stream reader
    (round 14: the old SimpleDataSourceStreamReader materialized every
    incremental ROW driver-side; now executors read the slices and
    apply the commit-time stamp filter — guide §4 boundary / §5
    driver)."""
    import json

    with open(os.path.join(base, ".hoodie", f"{instant}.commit")) as fh:
        meta = json.load(fh)
    return [
        (os.path.join(base, ws["path"]), instant)
        for _part, stats in meta["partitionToWriteStats"].items()
        for ws in stats
    ]


def _completed_instants(base: str, after: str) -> list[str]:
    tl = os.path.join(base, ".hoodie")
    return sorted(
        f[: -len(".commit")]
        for f in os.listdir(tl)
        if f.endswith(".commit") and f[: -len(".commit")] > after
    )


def _make_hudi_tail_datasource():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _SliceSplit(InputPartition):
        def __init__(self, path: str, instant: str):
            self.path, self.instant = path, instant

    class _HudiTailReader(DataSourceStreamReader):
        """Offsets are {'instant': last-drained commit time} — the
        timeline's lexicographic-equals-numeric instant names ARE the
        offset lattice. Completed instants and their slices are
        immutable, so partitions(start, end) — one split per slice the
        window's commit metadata names — replays any committed range
        exactly. read() runs on EXECUTORS: pyarrow loads the slice and
        the _hoodie_commit_time == instant stamp filter drops survivor
        rows there, so no incremental row transits the driver
        (round 14; TaskContext guard pins it)."""

        def __init__(self, base: str):
            self._base = base

        def initialOffset(self):
            return {"instant": ""}

        def latestOffset(self):
            done = _completed_instants(self._base, "")
            return {"instant": done[-1] if done else ""}

        def partitions(self, start, end):
            splits: list[_SliceSplit] = []
            for ins in _completed_instants(self._base, start["instant"]):
                if ins > end["instant"]:
                    break
                splits.extend(
                    _SliceSplit(p, i)
                    for p, i in _hudi_instant_files(self._base, ins)
                )
            return splits

        def commit(self, end):
            pass  # offsets derive from the immutable timeline

        @staticmethod
        def _read_partition(partition):
            # self-contained (pyarrow only): executes on Python workers
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            tbl = pq.read_table(
                partition.path,
                columns=[
                    "_hoodie_commit_time",
                    "n_nationkey",
                    "n_name",
                    "n_regionkey",
                ],
            )
            mine = tbl.filter(
                pc.equal(tbl.column("_hoodie_commit_time"), partition.instant)
            )
            out = pa.table(
                {
                    "n_nationkey": mine.column("n_nationkey"),
                    "n_name": mine.column("n_name"),
                    "n_regionkey": mine.column("n_regionkey"),
                    "commit_instant": pa.array(
                        [partition.instant] * mine.num_rows, type=pa.string()
                    ),
                }
            )
            return iter(out.to_batches())

        def read(self, partition):
            from pyspark import TaskContext

            if TaskContext.get() is None:
                raise RuntimeError(
                    "hudi_incremental_tail read() must run on an executor — "
                    "batch rows must not transit the driver"
                )
            return self._read_partition(partition)

    class HudiIncrementalTailDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "hudi_incremental_tail"

        def schema(self) -> str:
            return (
                "n_nationkey int, n_name string, n_regionkey int, "
                "commit_instant string"
            )

        def streamReader(self, schema):
            return _HudiTailReader(self.options["path"])

    return HudiIncrementalTailDataSource


_HUDI_STREAM_RUNS = iter(range(1_000_000))


def _build_hudi_tail_fixture(spark: SparkSession, sf_dir: str) -> str:
    from .hudi_write import hudi_cow_upsert

    base = _scratch(sf_dir, "hudi_incr_stream")
    if not os.path.exists(os.path.join(base, "_FIXTURE_READY")):
        n = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        hudi_cow_upsert(spark, base, n.filter("n_nationkey < 12"), "n_nationkey")
        hudi_cow_upsert(spark, base, n.filter("n_nationkey >= 12"), "n_nationkey")
        # an upsert touching existing keys: the rewritten slice carries
        # survivors (older commit times) the incremental read must skip
        upd = (
            n.filter("n_nationkey < 3")
            .withColumn("n_name", F.concat(F.col("n_name"), F.lit("-U3")))
        )
        hudi_cow_upsert(spark, base, upd, "n_nationkey")
        with open(os.path.join(base, "_FIXTURE_READY"), "w") as fh:
            fh.write("ok")
    return base


@query(
    "stream_hudi_incremental_tail",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           CASE WHEN n_nationkey < 12 THEN '00000000000001'
                ELSE '00000000000002' END AS commit_instant
    FROM nation
    UNION ALL
    SELECT n_nationkey, n_name || '-U3', n_regionkey, '00000000000003'
    FROM nation WHERE n_nationkey < 3
    """,
)
def stream_hudi_incremental_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAIL a Hudi CoW table's commits as a streaming source — the
    §2-K twin Hudi lacked (Iceberg: snapshot + changelog tails; Delta:
    CDF tail). Three commits drain as three incremental windows; the
    third window emits ONLY the three upserted rows even though its
    rewritten slice physically carries all 12 lo-file rows (the
    _hoodie_commit_time stamp gates — survivor rows belong to earlier
    windows). Value-oracled cell-by-cell; replay exactness and
    checkpoint recovery are pinned in tests/test_surface66.py."""
    import shutil

    base = _build_hudi_tail_fixture(spark, sf_dir)
    spark.dataSource.register(_make_hudi_tail_datasource())
    run = next(_HUDI_STREAM_RUNS)
    ckpt = _scratch(sf_dir, f"hudi_incr_tail_ckpt_{run}")
    shutil.rmtree(ckpt, ignore_errors=True)
    name = f"hudi_incr_tail_out_{run}"
    q = (
        spark.readStream.format("hudi_incremental_tail")
        .option("path", base)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
