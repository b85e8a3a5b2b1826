"""§2 round-6 batch BV — graph reachability, temporal autocorrelation,
k-anonymity audit, and burst detection.

Four analysis lanes a data-platform team reaches for weekly, each fully
value-oracled:

- ``graph_bfs_layers``: bounded-depth BFS from a deterministic seed over
  the shared co-purchase graph — frontier-join expansion (one shuffle per
  layer, bounded layers), oracled by a recursive CTE computing the same
  (node, min-depth) set.
- ``ts_autocorr_lag``: lag-1 / lag-7 Pearson autocorrelation of daily
  event counts per event type — the forecasting-diagnostics pass; lags
  align by CALENDAR self-join, not row-order lag, so date gaps cannot
  silently shift the series.
- ``dq_k_anonymity``: quasi-identifier group sizes at two generalization
  levels with a k=5 risk flag — the governance audit run before any
  dataset leaves the house.
- ``events_burst_detection``: per user-day activity vs the user's own
  Poisson rate (z = (c−λ)/√λ) — bot/incident screening at user grain.

Scale: BFS is |frontier ⋈ E| per layer with a visited anti-join (the
standard distributed-BFS shape; layers bounded, no transitive blowup);
the rest are single keyed aggs/windows over corpus scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import r6
from ..registry import query
from .graph_ops import _EDGE_CTE, _edges

_BFS_DEPTH = 4


@query(
    "graph_bfs_layers",
    oracle=f"""
    WITH RECURSIVE {_EDGE_CTE},
    ud AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
    seed AS (SELECT min(u) AS s FROM e),
    bfs(node, depth) AS (
      SELECT s, 0 FROM seed
      UNION
      SELECT ud.v, bfs.depth + 1
      FROM bfs JOIN ud ON ud.u = bfs.node
      WHERE bfs.depth < {_BFS_DEPTH}
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node
    FROM (SELECT node, min(depth) AS depth FROM bfs GROUP BY node)
    GROUP BY 1
    """,
)
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first layers from the smallest node of the co-purchase
    graph, depth ≤ 4: per layer, reachable-node count and id range.
    Spark runs the canonical distributed BFS — frontier ⋈ edges per
    layer, visited-set anti-join, union — a BOUNDED loop of dataframe
    ops (no collect, no lineage blowup at 4 layers). The oracle's
    recursive CTE recomputes (node, min-depth) exactly, so the hash
    certifies layer assignment, not just reach."""
    e = _edges(spark, sf_dir)
    ud = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    seed = e.agg(F.min("u").alias("node")).select(
        "node", F.lit(0).alias("depth")
    )
    visited = seed
    frontier = seed
    for d in range(1, _BFS_DEPTH + 1):
        nxt = (
            frontier.join(ud, frontier.node == ud.u)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("depth", F.lit(d))
        )
        # bounded loop: localCheckpoint truncates lineage layer-by-layer
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.union(nxt)
        frontier = nxt
    return visited.groupBy("depth").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.min("node").cast("bigint").alias("min_node"),
        F.max("node").cast("bigint").alias("max_node"),
    ).select(F.col("depth").cast("bigint"), "n_nodes", "min_node", "max_node")


@query(
    "ts_autocorr_lag",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT d.event_type AS event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(corr(d.c, l1.c), 6) AS autocorr_lag1,
           round(corr(d.c, l7.c), 6) AS autocorr_lag7
    FROM daily d
    LEFT JOIN daily l1 ON l1.event_type = d.event_type AND l1.day = d.day - 1
    LEFT JOIN daily l7 ON l7.event_type = d.event_type AND l7.day = d.day - 7
    GROUP BY 1
    """,
)
def ts_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 / lag-7 autocorrelation of the daily count series per event
    type. The lagged series aligns by CALENDAR self-join (day − 1 /
    day − 7), not a row-order window lag — missing days must pair with
    NULL (dropped by corr), not silently shift the series. Two broadcast-
    sized self-joins on the daily rollup (≤ types × days rows), corr is
    a plain two-pass-free aggregate in both engines."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    l1 = daily.select(
        F.col("event_type").alias("et1"), F.col("day").alias("d1"), F.col("c").alias("c1")
    )
    l7 = daily.select(
        F.col("event_type").alias("et7"), F.col("day").alias("d7"), F.col("c").alias("c7")
    )
    j = daily.join(
        l1, (F.col("et1") == F.col("event_type")) & (F.col("d1") == F.date_sub("day", 1)), "left"
    ).join(
        l7, (F.col("et7") == F.col("event_type")) & (F.col("d7") == F.date_sub("day", 7)), "left"
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        r6(F.corr("c", "c1")).alias("autocorr_lag1"),
        r6(F.corr("c", "c7")).alias("autocorr_lag7"),
    )


@query(
    "dq_k_anonymity",
    oracle="""
    WITH fine AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
             count(*) AS n
      FROM customer GROUP BY 1, 2, 3
    ),
    coarse AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 5000) AS BIGINT) AS bal_bucket5k,
             count(*) AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT 'fine(nation,segment,bal1k)' AS level,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS risky_groups,
           CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS risky_rows,
           CAST(min(n) AS BIGINT) AS min_group_size
    FROM fine
    UNION ALL
    SELECT 'coarse(nation,bal5k)',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT),
           CAST(min(n) AS BIGINT)
    FROM coarse
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k = 5) over customer quasi-identifiers at two
    generalization levels: fine = (nation, segment, $1k balance bucket),
    coarse = (nation, $5k bucket). Reports group counts, sub-k group /
    row exposure, and the minimum group size — the numbers a release
    review needs to pick the coarsest level that still satisfies k.
    Two keyed aggs + a 2-row union; at 100 TB each level is one
    partial+final count shuffle on its QI key."""
    c = t(spark, sf_dir, "customer")

    def _level(grp_cols: list, label: str) -> DataFrame:
        g = c.groupBy(*grp_cols).agg(F.count(F.lit(1)).alias("n"))
        return g.agg(
            F.lit(label).alias("level"),
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("n") < 5, 1).otherwise(0)).cast("bigint").alias(
                "risky_groups"
            ),
            F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("risky_rows"),
            F.min("n").cast("bigint").alias("min_group_size"),
        )

    fine = _level(
        ["c_nationkey", "c_mktsegment", F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_bucket")],
        "fine(nation,segment,bal1k)",
    )
    coarse = _level(
        ["c_nationkey", F.floor(F.col("c_acctbal") / 5000).cast("bigint").alias("bal_bucket5k")],
        "coarse(nation,bal5k)",
    )
    return fine.unionByName(coarse)


@query(
    "events_burst_detection",
    oracle="""
    WITH per_day AS (
      SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    rate AS (
      SELECT user_id,
             avg(c) AS lam,
             count(*) AS n_active_days
      FROM per_day GROUP BY 1
    )
    SELECT p.user_id AS user_id,
           CAST(r.n_active_days AS BIGINT) AS n_active_days,
           round(r.lam, 6) AS lambda_per_day,
           round(max((p.c - r.lam) / sqrt(r.lam)), 6) AS max_burst_z,
           CAST(sum(CASE WHEN (p.c - r.lam) / sqrt(r.lam) > 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_burst_days
    FROM per_day p JOIN rate r ON p.user_id = r.user_id
    GROUP BY 1, 2, 3
    HAVING max((p.c - r.lam) / sqrt(r.lam)) > 3
    """,
)
def events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson burst screening: each user's daily count against their own
    mean rate λ (over ACTIVE days); z = (c−λ)/√λ flags days a homogeneous
    Poisson process would not produce (z > 3 ≈ p < 0.0013) — the
    first-pass bot / incident / scraper screen. Emits only bursty users
    (max z > 3) with their rate and burst-day count. One keyed rollup to
    day grain, one keyed mean, one join back on user_id — the join is
    keyed-colocated (same key both sides), so AQE plans it shuffle-free
    after the rollup at scale."""
    e = t(spark, sf_dir, "events")
    per_day = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    rate = per_day.groupBy("user_id").agg(
        F.avg("c").alias("lam"), F.count(F.lit(1)).alias("n_active_days")
    )
    z = (F.col("c") - F.col("lam")) / F.sqrt(F.col("lam"))
    return (
        per_day.join(rate, "user_id")
        .groupBy("user_id", "n_active_days", "lam")
        .agg(
            F.max(z).alias("max_z"),
            F.sum(F.when(z > 3, 1).otherwise(0)).cast("bigint").alias("n_burst_days"),
        )
        .where(F.col("max_z") > 3)
        .select(
            "user_id",
            F.col("n_active_days").cast("bigint"),
            r6(F.col("lam")).alias("lambda_per_day"),
            r6(F.col("max_z")).alias("max_burst_z"),
            "n_burst_days",
        )
    )


# ------------------------------------------------------- round-6 batch BW


@query(
    "stream_session_dynamic_gap",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE event_type WHEN 'purchase' THEN 2700000000
                             WHEN 'click'    THEN 900000000
                             WHEN 'view'     THEN 900000000
                             ELSE 1800000000 END AS gap_us
      FROM events
    ),
    b AS (
      SELECT user_id, ts, gap_us,
             CASE WHEN max(epoch_us(ts) + gap_us) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR epoch_us(ts) >= max(epoch_us(ts) + gap_us) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) THEN 1 ELSE 0 END AS new_session
      FROM g
    ),
    s AS (
      SELECT user_id, ts, gap_us,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM b
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           max(epoch_us(ts) + gap_us) - epoch_us(min(ts)) AS window_span_us
    FROM s GROUP BY 1, 2
    """,
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a PER-EVENT inactivity gap (purchase holds a
    session open 45 min, click/view 15, else 30) — the batch twin of
    ``session_window(ts, gap_expr)`` with a dynamic gap column. Fixed-gap
    lag-vs-previous-row logic is WRONG here: a short-gap event following
    a long-gap one can still fall inside the window the earlier event
    opened, so the boundary test is ts ≥ running max of (ts + gap) over
    all PRIOR events — gaps-and-islands on the running window end. The
    emitted window_span_us is (max(ts+gap) − min(ts)): the session
    window's extent, matching streaming session_window semantics."""
    from ..functions.parity import bi, um

    e = t(spark, sf_dir, "events")
    gap_us = (
        F.when(F.col("event_type") == "purchase", 2_700_000_000)
        .when(F.col("event_type").isin("click", "view"), 900_000_000)
        .otherwise(1_800_000_000)
    )
    g = e.select("user_id", "ts", "event_id", gap_us.alias("gap_us"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prior_end = F.max(um("ts") + F.col("gap_us")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    b = g.withColumn(
        "new_session",
        F.when(prior_end.isNull() | (um("ts") >= prior_end), 1).otherwise(0),
    )
    wrun = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = b.withColumn("session_id", bi(F.sum("new_session").over(wrun)))
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max(um("ts") + F.col("gap_us")) - um(F.min("ts"))).alias(
            "window_span_us"
        ),
    )


@query(
    "agg_theil_decomposition",
    oracle="""
    WITH pos AS (
      SELECT c_nationkey, CAST(c_acctbal AS DOUBLE) AS x
      FROM customer WHERE c_acctbal > 0
    ),
    tot AS (SELECT avg(x) AS mu, sum(x) AS y FROM pos),
    gmu AS (
      SELECT c_nationkey, count(*) AS n_g, avg(x) AS mu_g, sum(x) AS y_g
      FROM pos GROUP BY c_nationkey
    ),
    grp AS (
      SELECT p.c_nationkey,
             sum((p.x / g.mu_g) * ln(p.x / g.mu_g)) / max(g.n_g) AS t_g
      FROM pos p JOIN gmu g USING (c_nationkey)
      GROUP BY p.c_nationkey
    )
    SELECT g.c_nationkey AS c_nationkey,
           CAST(m.n_g AS BIGINT) AS n_customers,
           round(m.mu_g, 6) AS mean_bal,
           round(g.t_g, 6) AS theil_within_g,
           round((m.y_g / t.y) * g.t_g, 6) AS contrib_within,
           round((m.y_g / t.y) * ln(m.mu_g / t.mu), 6) AS contrib_between
    FROM grp g JOIN gmu m USING (c_nationkey) CROSS JOIN tot t
    """,
)
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality index decomposed by nation: per group its own
    index T_g = mean((x/μ_g)·ln(x/μ_g)), its income-share-weighted
    within contribution, and the between-group term s_g·ln(μ_g/μ) —
    summing the two contribution columns over all rows reproduces total
    Theil exactly (the additive-decomposability property that makes
    Theil, not Gini, the index for drill-downs). Positive balances only
    (ln domain). One keyed agg + a 1-row global broadcast — the
    sub_scalar_global shape."""
    c = t(spark, sf_dir, "customer")
    pos = c.where(F.col("c_acctbal") > 0).select(
        "c_nationkey", F.col("c_acctbal").cast("double").alias("x")
    )
    wg = Window.partitionBy("c_nationkey")
    ratio = F.col("x") / F.avg("x").over(wg)
    grp = (
        pos.withColumn("term", ratio * F.log(ratio))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.avg("x").alias("mu_g"),
            F.sum("x").alias("y_g"),
            (F.sum("term") / F.count(F.lit(1))).alias("t_g"),
        )
    )
    tot = pos.agg(F.avg("x").alias("mu"), F.sum("x").alias("y"))
    j = grp.crossJoin(F.broadcast(tot))  # 1-row global, scalar broadcast
    return j.select(
        "c_nationkey",
        "n_customers",
        r6(F.col("mu_g")).alias("mean_bal"),
        r6(F.col("t_g")).alias("theil_within_g"),
        r6((F.col("y_g") / F.col("y")) * F.col("t_g")).alias("contrib_within"),
        r6((F.col("y_g") / F.col("y")) * F.log(F.col("mu_g") / F.col("mu"))).alias(
            "contrib_between"
        ),
    )


@query(
    "sql_order_by_all",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(c_nationkey % 5 AS BIGINT) AS region_mod,
           CAST(count(*) AS BIGINT) AS n
    FROM customer
    GROUP BY ALL
    ORDER BY ALL
    LIMIT 10
    """,
)
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ALL (Spark 4 / DuckDB shared surface): sort by every
    select-list column left-to-right without restating them — combined
    with LIMIT the ordering is SEMANTIC (which 10 rows survive), so the
    hash certifies the expansion order, not just syntax acceptance."""
    c = t(spark, sf_dir, "customer")
    c.createOrReplaceTempView("sql_oba_customer")
    return spark.sql(
        """
        SELECT c_mktsegment AS segment,
               CAST(c_nationkey % 5 AS BIGINT) AS region_mod,
               CAST(count(*) AS BIGINT) AS n
        FROM sql_oba_customer
        GROUP BY ALL
        ORDER BY ALL
        LIMIT 10
        """
    )
