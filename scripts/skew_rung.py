#!/usr/bin/env python
"""Adversarial-skew rung (round-10 verdict ask #1): measure the
skewed-join arms on the Zipf-hot-key sf10 synthesis (~30% of lineitem
rows on ONE orderkey — `make_sf_scaled.py --skew-hot`).

Arms (each in a FRESH JVM via subprocess so AQE/session confs can't
leak; 2 timed runs per arm after one warm-up, min reported):

- unsalted_noaqe : plain shuffle join, adaptive OFF — the straggler
                   baseline a naive plan ships.
- unsalted_aqe   : adaptive + skewJoin ON (the repo session's default
                   posture) — AQE must detect and split the hot
                   partition at runtime.
- salted_noaqe   : the deterministic salt form (join_salted_skew's
                   pattern, S=8) with adaptive OFF — planner-independent
                   skew spreading.
- salted_aqe     : salt + AQE (does the combination pay or double-pay?).

Broadcast is forced OFF in every arm (threshold -1): at sf10 the orders
build side is ~15M rows, and the point is the SHUFFLE join's skew
behavior — a broadcast would dodge the hazard the rung exists to price
(and at 100 TB the build side won't fit either).

DuckDB runs the identical SQL on the same parquet as the absolute
baseline. Output: one JSON line; record in BASELINE.md.

Usage: python scripts/skew_rung.py [skew_dir]          (parent)
       python scripts/skew_rung.py --arm NAME skew_dir (child, internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SQL = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)                                          AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

ARMS = {
    "unsalted_noaqe": {"aqe": False, "salted": False},
    "unsalted_aqe": {"aqe": True, "salted": False},
    # the shipped session posture (round-10 pin): skew threshold 64m so
    # the split actually fires on hot partitions the 256m default misses
    "unsalted_aqe_tuned": {"aqe": True, "salted": False, "skew_threshold": "64m"},
    "salted_noaqe": {"aqe": False, "salted": True},
    "salted_aqe": {"aqe": True, "salted": True},
}

_SALT = 8


def _task_skew(app_port: int) -> dict:
    """Straggler evidence from the UI REST API: per-stage task-duration
    median/max for the heaviest stages of the LAST completed job. The
    max/median ratio is the 1000-executor wall predictor — at local[32]
    the other partitions keep cores busy so the straggler hides in the
    wall; on a wide cluster the slowest task IS the wall."""
    import urllib.request

    def get(path: str):
        with urllib.request.urlopen(
            f"http://localhost:{app_port}/api/v1{path}", timeout=10
        ) as r:
            return json.loads(r.read())

    app_id = get("/applications")[0]["id"]
    stages = [
        s
        for s in get(f"/applications/{app_id}/stages?status=complete")
        if s["numTasks"] > 1
    ]
    worst = {"stage": None, "median_ms": None, "max_ms": None, "ratio": 0.0}
    for s in stages:
        try:
            q = get(
                f"/applications/{app_id}/stages/{s['stageId']}/"
                f"{s['attemptId']}/taskSummary?quantiles=0.5,1.0"
            )
        except Exception:  # noqa: BLE001
            continue
        med, mx = q["executorRunTime"]
        if med > 0 and mx / med > worst["ratio"] and mx > 500:
            worst = {
                "stage": s["name"].split("\n")[0][:60],
                "n_tasks": s["numTasks"],
                "median_ms": round(med),
                "max_ms": round(mx),
                "ratio": round(mx / med, 1),
            }
    return worst


def run_arm(name: str, skew_dir: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cfg = ARMS[name]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # 8 tasks/core: cluster-like task granularity — with exactly
    # cpus partitions every task is fat and the straggler hides
    shuffle_parts = os.environ.get("SPARK_GRAFT_SKEW_PARTS", str(int(cpus) * 8))
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.driver.memory", "16g")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", str(cfg["aqe"]).lower())
        .config("spark.sql.adaptive.skewJoin.enabled", str(cfg["aqe"]).lower())
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            cfg.get("skew_threshold", "256m"),
        )
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
    )
    spark = b.appName(f"skew-{name}").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(skew_dir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(skew_dir, "orders.parquet"))

    def plan():
        if cfg["salted"]:
            lis = li.withColumn("salt", F.pmod(F.col("l_linenumber"), F.lit(_SALT)))
            os_ = o.withColumn(
                "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1)))
            )
            j = lis.join(
                os_, (lis.l_orderkey == os_.o_orderkey) & (lis.salt == os_.salt)
            )
        else:
            j = li.join(o, li.l_orderkey == o.o_orderkey)
        return (
            j.groupBy("o_orderpriority")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue"),
                F.count(F.lit(1)).alias("n_items"),
            )
        )

    walls, rows, df = [], None, None
    for i in range(3):
        df = plan()
        t0 = time.perf_counter()
        rows = sorted(map(tuple, df.collect()))
        w = time.perf_counter() - t0
        if i:  # run 0 is the warm-up
            walls.append(round(w, 3))
    # inspect the EXECUTED plan (AQE finalizes in place after collect)
    skewed = "skew=true" in df._jdf.queryExecution().executedPlan().toString()
    try:
        task_skew = _task_skew(4049)
    except Exception as ex:  # noqa: BLE001
        task_skew = {"error": str(ex)[:200]}
    print(
        json.dumps(
            {
                "arm": name,
                "walls": walls,
                "min_s": min(walls),
                "shuffle_partitions": int(shuffle_parts),
                "aqe_skew_split_fired": skewed,
                "task_skew": task_skew,
                "result_fingerprint": rows[:2],
            }
        )
    )
    spark.stop()


def run_agg_arm(name: str, skew_dir: str) -> None:
    """Aggregation-skew probe: groupBy the HOT key itself (one group =
    30% of all rows). scale_patterns.agg_salted_twophase claims
    map-side partial aggregation absorbs this; the probe measures it —
    each task pre-folds its hot rows to ONE partial row, so the
    post-shuffle reduce sees |tasks| rows per group, never 18M."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 8))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .appName(f"aggskew-{name}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(skew_dir, "lineitem.parquet"))

    def plan():
        if name == "salted":
            partial = li.withColumn(
                "salt", F.pmod(F.col("l_linenumber"), F.lit(_SALT))
            ).groupBy("l_orderkey", "salt").agg(
                F.sum("l_quantity").alias("p_q"),
                F.count(F.lit(1)).alias("p_n"),
            )
            g = partial.groupBy("l_orderkey").agg(
                F.sum("p_q").alias("sum_qty"), F.sum("p_n").alias("n")
            )
        else:
            g = li.groupBy("l_orderkey").agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.count(F.lit(1)).alias("n"),
            )
        return g.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.max("n").alias("hot_group_rows"),
            F.round(F.sum("sum_qty"), 2).alias("total_qty"),
        )

    walls, rows = [], None
    for i in range(3):
        t0 = time.perf_counter()
        rows = plan().collect()
        if i:
            walls.append(round(time.perf_counter() - t0, 3))
    try:
        task_skew = _task_skew(4049)
    except Exception as ex:  # noqa: BLE001
        task_skew = {"error": str(ex)[:200]}
    print(json.dumps({
        "arm": name, "walls": walls, "min_s": min(walls),
        "task_skew": task_skew,
        "result_fingerprint": sorted(map(list, rows)),
    }))
    spark.stop()


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--agg-arm":
        run_agg_arm(sys.argv[2], sys.argv[3])
        return 0
    if len(sys.argv) > 2 and sys.argv[1] == "--agg":
        skew_dir = sys.argv[2]
        out = {"skew_dir": skew_dir, "probe": "aggregation-skew", "arms": {}}
        for name in ("plain", "salted"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--agg-arm",
                 name, skew_dir],
                capture_output=True, text=True,
            )
            out["arms"][name] = (
                json.loads(r.stdout.strip().splitlines()[-1])
                if r.returncode == 0 else {"error": r.stderr[-400:]}
            )
            print(f"   agg arm {name}: {out['arms'][name].get('walls')}",
                  file=sys.stderr, flush=True)
        fps = {json.dumps(a.get("result_fingerprint"))
               for a in out["arms"].values()}
        out["answers_agree"] = len(fps) == 1
        print(json.dumps(out))
        return 0
    if len(sys.argv) > 2 and sys.argv[1] == "--arm":
        run_arm(sys.argv[2], sys.argv[3])
        return 0
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10_skew"
    if not os.path.exists(os.path.join(skew_dir, "_COMPLETE")):
        print(f"missing synthesis at {skew_dir} (run make_sf_scaled.py "
              "--skew-hot first)", file=sys.stderr)
        return 1

    import duckdb

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{skew_dir}/{t}.parquet')"
        )
    hot = con.execute(
        "SELECT count(*) FILTER (l_orderkey = 1), count(*) FROM lineitem"
    ).fetchone()
    duck = []
    for i in range(3):
        t0 = time.perf_counter()
        con.execute(SQL).fetchall()
        if i:
            duck.append(round(time.perf_counter() - t0, 3))

    out = {
        "skew_dir": skew_dir,
        "hot_key_rows": hot[0],
        "total_rows": hot[1],
        "hot_share": round(hot[0] / hot[1], 4),
        "duckdb_s": min(duck),
        "arms": {},
    }
    for name in ARMS:
        print(f"== arm {name} ==", file=sys.stderr, flush=True)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", name, skew_dir],
            capture_output=True,
            text=True,
        )
        if r.returncode != 0:
            out["arms"][name] = {"error": r.stderr[-500:]}
            continue
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        out["arms"][name] = rec
        print(f"   {name}: {rec['walls']} skew_split={rec['aqe_skew_split_fired']}",
              file=sys.stderr, flush=True)
    fps = {
        json.dumps(a.get("result_fingerprint"))
        for a in out["arms"].values()
        if "result_fingerprint" in a
    }
    out["answers_agree"] = len(fps) == 1
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
