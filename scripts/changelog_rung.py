#!/usr/bin/env python
"""Changelog plan rung (round-11): measure the round-10 verdict's top
ask — the changed-files-only CDC window vs the full-snapshot re-diff it
replaced — on a table big enough for the difference to be wall-visible.

Build: an Iceberg table from N single-file appends of sf1 orders
slices, then ONE deletion-vector commit touching a single file. The
CDC window over the delete commit is the canonical small-change /
big-table shape.

Arms (same window, same results — hash-asserted):
  - changed_files_s : the shipped iceberg_changelog (driver file-set
                      diff; scans ONLY the DV-referenced file)
  - full_rediff_s   : the round-10 implementation's shape, reproduced
                      inline — tag ALL files of BOTH snapshots,
                      anti-join the complete live sets both ways

Usage: python scripts/changelog_rung.py [src_orders_parquet] [n_slices]
       (default: /tmp/spark_graft_sf1_sparse/orders.parquet, 8)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from bench import _materialize
    from sap_cta_data_pipeline_spark.operators.iceberg_reader import (
        iceberg_append,
        iceberg_delete_dv,
        iceberg_state,
        _load_metadata,
    )
    from sap_cta_data_pipeline_spark.operators.surface54 import (
        _tagged_scan,
        iceberg_changelog,
        iceberg_changelog_plan,
    )
    from sap_cta_data_pipeline_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else (
        "/tmp/spark_graft_sf1_sparse/orders.parquet"
    )
    n_slices = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    base = "/tmp/sap_cta_changelog_rung"
    shutil.rmtree(base, ignore_errors=True)

    spark = get_spark("changelog-rung")
    spark.sparkContext.setLogLevel("ERROR")
    _materialize(spark.range(1_000_000))

    raw = spark.read.parquet(src)
    key = raw.columns[0]  # orders/lineitem: the orderkey leads
    rows = raw.select(*raw.columns[:3])
    for i in range(n_slices):
        iceberg_append(
            spark,
            base,
            rows.filter(f"{key} % {n_slices} = {i}"),
            f"slice-{i}.parquet",
        )
    # one key guaranteed present in slice 0's residue class
    probe_key = rows.filter(f"{key} % {n_slices} = 0").agg(
        F.min(key)
    ).collect()[0][0]
    iceberg_delete_dv(spark, base, f"{key} = {probe_key}")
    snaps = sorted(
        _load_metadata(base)["snapshots"], key=lambda s: s["sequence-number"]
    )
    a_sid, b_sid = snaps[-2]["snapshot-id"], snaps[-1]["snapshot-id"]

    plan = iceberg_changelog_plan(base, a_sid, b_sid)
    n_table_files = len(iceberg_state(base, b_sid)[1])

    def wall(fn, n=3):
        walls = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            walls.append(round(time.perf_counter() - t0, 3))
        return min(walls)

    new_df = lambda: iceberg_changelog(spark, base, a_sid, b_sid)  # noqa: E731
    _materialize(new_df())  # warm
    changed_files_s = wall(lambda: _materialize(new_df()))

    def full_rediff():
        # the round-10 shape: complete live sets of BOTH snapshots,
        # anti-joined on (file, position) both ways
        schema, d_a, p_a, _ = iceberg_state(base, a_sid)
        _, d_b, p_b, _ = iceberg_state(base, b_sid)

        def live(files, dels):
            from sap_cta_data_pipeline_spark.operators.surface54 import (
                _positions_df,
            )

            tagged = _tagged_scan(spark, schema, [f["path"] for f in files])
            pos = _positions_df(spark, dels)
            return (
                tagged.join(pos, ["__fp", "__pos"], "left_anti")
                if pos is not None
                else tagged
            )

        la, lb = live(d_a, p_a), live(d_b, p_b)
        dels = la.join(lb.select("__fp", "__pos"), ["__fp", "__pos"],
                       "left_anti")
        ins = lb.join(la.select("__fp", "__pos"), ["__fp", "__pos"],
                      "left_anti")
        cols = [f.name for f in iceberg_state(base, b_sid)[0].fields]
        return dels.select(*cols, F.lit("DELETE").alias("change_type")).unionByName(
            ins.select(*cols, F.lit("INSERT").alias("change_type"))
        )

    _materialize(full_rediff())  # warm
    full_rediff_s = wall(lambda: _materialize(full_rediff()))

    rows_new = sorted(map(tuple, new_df().drop("commit_snapshot_id").collect()))
    rows_old = sorted(map(tuple, full_rediff().collect()))
    assert rows_new == rows_old, "arms disagree — not comparable"

    out = {
        "changelog_rung": {
            "table_files": n_table_files,
            "planned_scan_paths": len(plan["scan_paths"]),
            "window_rows": len(rows_new),
            "changed_files_s": changed_files_s,
            "full_rediff_s": full_rediff_s,
            "speedup": round(full_rediff_s / changed_files_s, 2),
        }
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
