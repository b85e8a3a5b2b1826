#!/usr/bin/env python
"""Bucketed-vs-shuffled wall comparison (round-6 verdict ask #5): price
the single fact Exchange that keeps agg_rollup/join_multiway above the
2x letter at small scale, by measuring the NAMED zero-exchange layout
(join_bucketed_colocated's bucketBy(orderkey) twin) against the plain
shuffled SortMergeJoin on the same lineitem JOIN orders aggregation.

Reports, per scale dir:
  - shuffle_s : plain parquet scan -> Exchange both sides -> SMJ -> agg
  - bucketed_s: bucketed-table scan -> SMJ with NO Exchange -> agg
  - layout_s  : the one-time bucketBy write (the price you pay ONCE at
                ingest to make every later orderkey join/agg
                exchange-free)
  - duckdb_s  : the single-node pipelined hash join on identical parquet
All Spark walls are min of 2 after a JVM warm job; DuckDB median of 3.

Usage: python scripts/bucketed_rung.py [--fixed N] [sf_dir ...]
       (default: /tmp/spark_graft_sf10 /tmp/spark_graft_sf30)

Round-11: the bucket count is BYTE-TARGETED by default
(layout.bucket_count over lineitem's on-disk bytes, 128 MB target,
floor 32 to keep every core busy at small scale) — the round-10 rung
measured 32 FIXED buckets degrading 1.42x -> 3.32x from sf10 to sf100
as 19M-row buckets let the within-bucket sort dominate. --fixed N
reproduces the old behavior for A/B.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SQL = """
SELECT o_orderpriority,
       count(*)                                          AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

_FIXED_FLOOR = 32  # parallelism floor: match local[32]


def _wall(fn, n=2) -> float:
    walls = []
    for _ in range(n):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return round(min(walls), 3)


def main() -> int:
    import duckdb
    from pyspark.sql import functions as F

    from sap_cta_data_pipeline_spark.catalog import load_table
    from sap_cta_data_pipeline_spark.operators.sources import _scratch
    from sap_cta_data_pipeline_spark.session import get_spark

    argv = sys.argv[1:]
    fixed = None
    if "--fixed" in argv:
        i = argv.index("--fixed")
        fixed = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    dirs = argv or ["/tmp/spark_graft_sf10", "/tmp/spark_graft_sf30"]
    spark = get_spark("bucketed-rung")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000_000).count()  # JVM warm

    def agg(joined):
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )

    out = {}
    for sf_dir in dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )

        def run_shuffle():
            # no hint: the planner's own best shuffled plan is the baseline
            agg(
                li.join(o, li.l_orderkey == o.o_orderkey)
            ).write.format("noop").mode("overwrite").save()

        shuffle_s = _wall(run_shuffle)

        db = f"bucketrung_{tag}".replace(".", "_").replace("-", "_")
        loc = _scratch(sf_dir, "bucket_rung_warehouse")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
        t0 = time.time()
        from sap_cta_data_pipeline_spark.functions.layout import (
            bucket_count,
            parquet_bytes,
        )

        n_buckets = fixed if fixed is not None else bucket_count(
            parquet_bytes(os.path.join(sf_dir, "lineitem.parquet")),
            min_buckets=_FIXED_FLOOR,
        )
        li.write.mode("overwrite").bucketBy(n_buckets, "l_orderkey").sortBy(
            "l_orderkey"
        ).saveAsTable(f"{db}.lineitem_b")
        o.write.mode("overwrite").bucketBy(n_buckets, "o_orderkey").sortBy(
            "o_orderkey"
        ).saveAsTable(f"{db}.orders_b")
        layout_s = round(time.time() - t0, 3)
        lib, ob = spark.table(f"{db}.lineitem_b"), spark.table(f"{db}.orders_b")

        joined = lib.hint("merge").join(ob, lib.l_orderkey == ob.o_orderkey)
        plan = agg(joined)._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange")

        def run_bucketed():
            agg(
                lib.hint("merge").join(ob, lib.l_orderkey == ob.o_orderkey)
            ).write.format("noop").mode("overwrite").save()

        bucketed_s = _wall(run_bucketed)

        con = duckdb.connect()
        for tbl in ("orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{tbl}.parquet')"
            )
        dd = []
        for _ in range(3):
            t0 = time.time()
            con.execute(_SQL).fetchall()
            dd.append(time.time() - t0)
        con.close()
        out[tag] = {
            "shuffle_s": shuffle_s,
            "bucketed_s": bucketed_s,
            "layout_once_s": layout_s,
            "duckdb_s": round(statistics.median(dd), 3),
            "bucketed_ratio": round(bucketed_s / statistics.median(dd), 2),
            "shuffle_ratio": round(shuffle_s / statistics.median(dd), 2),
            "exchange_cost_s": round(shuffle_s - bucketed_s, 3),
            "join_agg_exchanges_in_bucketed_plan": n_exchanges,
            "n_buckets": n_buckets,
        }
        print(tag, out[tag], flush=True)
    print(json.dumps({"bucketed_rung": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
