"""§2 round-2 addendum — data-quality & robustness lane.

Production pipelines spend as much time validating data as transforming it.
This lane covers the four shapes that recur:

- dq_expectations — a rule table of constraint violations (nulls, ranges,
  referential integrity, distribution guards) evaluated in independent
  pruned scans and unioned to one (rule, n_violations) report. Each rule
  scans only the columns it needs; orphan checks are anti-joins. At 100 TB
  the FK checks dominate — they shuffle on the key like any join, and a
  bloom-filter runtime filter applies when one side is selective.
- events_attribution_lasttouch — marketing-style last-touch attribution:
  every purchase is attributed to the user's most recent prior
  non-purchase event within a 7-day window. One user-keyed window with a
  (ts, event_id) tiebreak — the same single-shuffle as-of shape as
  join_asof, with no event-stream amplification.
- agg_weighted_median — weighted median per group via cumulative-weight
  crossing point: collapse to distinct values first (groupBy), then one
  ordered window over the value-cardinality rows, never the raw rows.
- fn_try_safe — ANSI-safe scalar surface (try_divide / try_cast): errors
  become NULLs instead of failing a 1000-executor job at hour 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_WEEK_US = 7 * 24 * 3600 * 1_000_000


@query(
    "dq_expectations",
    oracle="""
    SELECT 'events_value_above_300' AS rule,
           (SELECT count(*) FROM events WHERE value > 300) AS n_violations
    UNION ALL
    SELECT 'lineitem_bad_discount',
           (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders_negative_total',
           (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
    UNION ALL
    SELECT 'orders_null_custkey',
           (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
    UNION ALL
    SELECT 'orders_orphan_custkey',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-violation report: six expectations over three tables,
    each evaluated in its own column-pruned scan (null / range /
    distribution guards are single-column aggregates; referential
    integrity is a keyed anti-join), unioned to one tiny report."""
    e = t(spark, sf_dir, "events")
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")

    def rule(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("rule"), F.count(F.lit(1)).alias("n_violations")
        )

    checks = [
        rule("events_value_above_300", e.where(F.col("value") > 300)),
        rule(
            "lineitem_bad_discount",
            li.where((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
        ),
        rule(
            "lineitem_orphan_orderkey",
            li.select("l_orderkey").join(
                o.select("o_orderkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_anti",
            ),
        ),
        rule("orders_negative_total", o.where(F.col("o_totalprice") <= 0)),
        rule("orders_null_custkey", o.where(F.col("o_custkey").isNull())),
        rule(
            "orders_orphan_custkey",
            o.select("o_custkey").join(
                c.select("c_custkey"),
                F.col("o_custkey") == F.col("c_custkey"),
                "left_anti",
            ),
        ),
    ]
    out = checks[0]
    for df in checks[1:]:
        out = out.unionAll(df)
    return out


@query(
    "events_attribution_lasttouch",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS t,
        last_value(CASE WHEN event_type <> 'purchase' THEN event_id END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_event_id,
        last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_event_type,
        last_value(CASE WHEN event_type <> 'purchase' THEN epoch_us(ts) END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_t
      FROM events
    )
    SELECT event_id AS purchase_id, user_id, attr_event_id, attr_event_type,
           t - attr_t AS gap_us
    FROM w
    WHERE event_type = 'purchase' AND attr_event_id IS NOT NULL
      AND t - attr_t <= 604800000000
    """,
)
def events_attribution_lasttouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase attributed to the same user's
    most recent strictly-prior non-purchase event within 7 days. One
    user-keyed window whose ``last(ignorenulls)`` carries a (t, id, type)
    struct — the triple is guaranteed to come from ONE row, and the
    (ts, event_id) ordering pins ties. Time math is epoch-microsecond
    BIGINT on both engines."""
    e = t(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.when(
        F.col("event_type") != "purchase",
        F.struct(
            t_us.alias("t"),
            F.col("event_id").alias("id"),
            F.col("event_type").alias("et"),
        ),
    )
    attr = F.last(prior, ignorenulls=True).over(w)
    return (
        e.select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "event_type",
            t_us.alias("t"),
            attr.alias("attr"),
        )
        .where(
            (F.col("event_type") == "purchase")
            & F.col("attr").isNotNull()
            & ((F.col("t") - F.col("attr.t")) <= F.lit(_WEEK_US))
        )
        .select(
            "purchase_id",
            "user_id",
            F.col("attr.id").alias("attr_event_id"),
            F.col("attr.et").alias("attr_event_type"),
            (F.col("t") - F.col("attr.t")).alias("gap_us"),
        )
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH g AS (
      SELECT l_returnflag, l_quantity AS x, sum(l_extendedprice) AS w
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT l_returnflag, x,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(w) OVER (PARTITION BY l_returnflag) AS total
      FROM g
    )
    SELECT l_returnflag, min(x) AS weighted_median
    FROM c WHERE cum >= 0.5 * total
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-weighted median quantity per return flag: first collapse to
    distinct (group, value) with summed weights — the window then runs
    over value-cardinality rows, not raw rows — then take the first value
    whose cumulative weight crosses half the total. Both engines
    accumulate the ordered sum in the same x order, so the crossing row
    agrees despite float partials. The median value itself is an untouched
    input double (no rounding needed)."""
    li = t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", F.col("l_quantity").alias("x")).agg(
        F.sum("l_extendedprice").alias("w")
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "x",
        F.sum("w").over(wc).alias("cum"),
        F.sum("w").over(wt).alias("total"),
    )
    return (
        c.where(F.col("cum") >= 0.5 * F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min("x").alias("weighted_median"))
    )


@query(
    "fn_try_safe",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / NULLIF(l_discount, 0) AS safe_div,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_int,
           TRY_CAST(CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) AS INTEGER) AS qty_int
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe scalar surface: ``try_divide`` nulls out zero divisors
    (instead of Inf or a job-killing exception under ANSI mode) and
    ``try_cast`` nulls out unparsable casts — the difference between a
    quarantined row and a dead 6-hour job at scale. The oracle spells the
    identical semantics with NULLIF and TRY_CAST."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.nullif(F.col("l_discount"), F.lit(0.0))).alias(
            "safe_div"
        ),
        F.expr("try_cast(l_returnflag AS int)").alias("flag_int"),
        F.expr("try_cast(cast(cast(floor(l_quantity) AS bigint) AS string) AS int)").alias(
            "qty_int"
        ),
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH m AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ), d AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS dev
      FROM events e JOIN m USING (event_type)
    ), md AS (
      SELECT event_type, median(dev) AS mad FROM d GROUP BY 1
    )
    SELECT d.event_id, d.event_type,
           round((d.value - d.med) / (1.4826 * md.mad), 6) AS robust_z
    FROM d JOIN md USING (event_type)
    WHERE abs((d.value - d.med) / (1.4826 * md.mad)) > 3.5
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    heavy-tail-safe sibling of events_zscore_outliers (mean/stddev are
    themselves dragged by the outliers they hunt; median/MAD are not).
    Two tiny per-series exact-median aggregates broadcast back onto the
    stream; 1.4826·MAD rescales to σ-equivalents so the 3.5 cutoff reads
    like a z-score. Exact medians interpolate identically in both
    engines on raw input doubles."""
    e = t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    d = e.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = d.groupBy("event_type").agg(F.median("dev").alias("mad"))
    z = (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    return (
        d.join(F.broadcast(mad), "event_type")
        .where(F.abs(z) > 3.5)
        .select("event_id", "event_type", r6(z).alias("robust_z"))
    )


@query(
    "events_purge_tombstones",
    oracle="""
    WITH tomb AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
    ), marked AS (
      SELECT e.event_type,
             CASE WHEN t.user_id IS NULL THEN 0 ELSE 1 END AS purged
      FROM events e LEFT JOIN tomb t ON t.user_id = e.user_id
    )
    SELECT event_type,
           count(*)                                   AS n_before,
           CAST(sum(1 - purged) AS BIGINT)            AS n_after,
           CAST(sum(purged) AS BIGINT)                AS n_purged
    FROM marked
    GROUP BY event_type
    """,
)
def events_purge_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten purge with audit — the compliance workflow a
    production table needs: a tombstone list of subject keys (here the
    deterministic user_id ≡ 0 mod 97 stand-in for a deletion-request
    table) anti-joins the fact table, and the audit reports per-type
    before/after/purged counts that must reconcile (n_before = n_after +
    n_purged — checked by the oracle equality itself). Plan: ONE
    broadcast-able join against the tombstone list + one keyed agg; at
    100 TB this runs partition-wise as a rewrite (delete = rewrite of
    affected partitions) with the same anti-join shape, and the
    tombstone list stays broadcast-sized by definition of a deletion
    queue. The surviving-rows DataFrame is the same plan minus the agg
    (dropDuplicates of the audit: filter purged = 0)."""
    from ..functions.parity import bi

    e = t(spark, sf_dir, "events")
    tomb = (
        e.filter(F.col("user_id") % 97 == 0).select("user_id").distinct()
    )
    marked = e.join(
        F.broadcast(tomb.withColumn("_t", F.lit(1))), "user_id", "left"
    ).withColumn("purged", F.when(F.col("_t").isNotNull(), 1).otherwise(0))
    return marked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_before"),
        bi(F.sum(1 - F.col("purged"))).alias("n_after"),
        bi(F.sum("purged")).alias("n_purged"),
    )


@query(
    "events_ab_srm_check",
    oracle="""
    WITH assigned AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      FROM events
    ),
    counts AS (
      SELECT event_type,
             count(*) FILTER (WHERE arm = 'A') AS n_a,
             count(*) FILTER (WHERE arm = 'B') AS n_b
      FROM assigned GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round(power(n_a - n_b, 2) / (n_a + n_b), 6) AS chi2,
           power(n_a - n_b, 2) / (n_a + n_b) > 3.841 AS srm_flag
    FROM counts
    """,
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail — the first thing an A/B platform
    checks before reading any metric: with a 50/50 split by user-id
    parity (deterministic, engine-portable), the per-stream arm counts
    feed a 1-df chi-square against equal expectation ((n_a−n_b)²/(n_a+n_b)
    — the two-cell Pearson statistic in closed form) and flag at the
    0.05 critical value 3.841. One scan, one conditional agg at
    event-type grain; no randomness, no per-user state. A real
    assignment hash would swap the parity for a salted hash — the SRM
    algebra is unchanged (events_ab_ttest is the downstream metric
    test this guards)."""
    e = t(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("n_b"),
    )
    chi2 = F.pow(F.col("n_a") - F.col("n_b"), 2) / (F.col("n_a") + F.col("n_b"))
    return counts.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        r6(chi2).alias("chi2"),
        (chi2 > 3.841).alias("srm_flag"),
    )


@query(
    "dq_freshness_sla",
    oracle="""
    WITH g AS (SELECT max(ts) AS global_max FROM events),
    s AS (
      SELECT event_type, max(ts) AS last_ts, count(*) AS n_events
      FROM events GROUP BY event_type
    )
    SELECT s.event_type,
           CAST(s.n_events AS BIGINT) AS n_events,
           s.last_ts,
           CAST(epoch_us(g.global_max) - epoch_us(s.last_ts) AS BIGINT) AS lag_us,
           epoch_us(g.global_max) - epoch_us(s.last_ts) > 3600000000 AS stale
    FROM s CROSS JOIN g
    """,
)
def dq_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness monitoring — the ops report that pages
    someone: each event stream's last-seen timestamp, its lag behind
    the most advanced stream, and a 1-hour SLA verdict. Two aggregates
    (per-stream max, global max — the global is a 1-row broadcast
    cross-joined in) over one scan; at 100 TB this is the query you run
    on the last partition only, and the mergeable-max algebra means
    per-partition freshness rolls up exactly (same argument as
    agg_incremental_merge). Lag is integer microseconds (um parity
    discipline, SURVEY §5.3)."""
    from ..functions.parity import um

    e = t(spark, sf_dir, "events")
    g = e.agg(F.max("ts").alias("global_max"))
    s = e.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n_events")
    )
    lag = um("global_max") - um("last_ts")
    return s.crossJoin(F.broadcast(g)).select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "last_ts",
        lag.alias("lag_us"),
        (lag > 3_600_000_000).alias("stale"),
    )


@query(
    "events_bot_detection",
    oracle="""
    WITH per_type AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    shares AS (
      SELECT user_id, max(c) AS top_c, sum(c) AS n_events
      FROM per_type GROUP BY 1
    ),
    activity AS (
      SELECT user_id,
             count(DISTINCT date_trunc('hour', ts)) AS active_hours,
             count(*) FILTER (WHERE hour(ts) < 6) AS night_events
      FROM events GROUP BY 1
    )
    SELECT s.user_id,
           CAST(s.n_events AS BIGINT) AS n_events,
           CAST(a.active_hours AS BIGINT) AS active_hours,
           round(s.n_events / CAST(a.active_hours AS DOUBLE), 6) AS events_per_hour,
           round(s.top_c / CAST(s.n_events AS DOUBLE), 6) AS top_type_share,
           round(a.night_events / CAST(s.n_events AS DOUBLE), 6) AS night_share,
           (s.n_events / CAST(a.active_hours AS DOUBLE) > 3.0
            OR s.top_c / CAST(s.n_events AS DOUBLE) > 0.6) AS bot_flag
    FROM shares s JOIN activity a USING (user_id)
    """,
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral bot scoring — the abuse gate a training-data pipeline
    runs before user-generated content enters a corpus: per-user event
    rate (events per distinct active hour), repetitiveness (top event
    type's share), and night-activity share, combined into a rule flag
    (rate > 3/h OR top-type share > 0.6). Two aggregations, BOTH keyed
    on user_id — the (user, type) count rolls up to the share stats and
    joins the activity agg on the same key, so one shuffle partitioning
    serves the whole query and no per-user history is materialized.
    Thresholds are deliberately legible rules, not a model: this op is
    the feature+gate plumbing; swapping in learned weights changes the
    projection, not the shape."""
    e = t(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    shares = per_type.groupBy("user_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_events")
    )
    activity = e.groupBy("user_id").agg(
        F.countDistinct(F.date_trunc("hour", "ts")).alias("active_hours"),
        F.sum(F.when(F.hour("ts") < 6, 1).otherwise(0)).alias("night_events"),
    )
    rate = F.col("n_events") / F.col("active_hours").cast("double")
    top_share = F.col("top_c") / F.col("n_events").cast("double")
    return shares.join(activity, "user_id").select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("active_hours").cast("long").alias("active_hours"),
        r6(rate).alias("events_per_hour"),
        r6(top_share).alias("top_type_share"),
        r6(F.col("night_events") / F.col("n_events").cast("double")).alias("night_share"),
        ((rate > 3.0) | (top_share > 0.6)).alias("bot_flag"),
    )


@query(
    "dq_referential_integrity",
    oracle="""
    WITH checks AS (
      SELECT 'lineitem->orders' AS relation,
             (SELECT count(*) FROM lineitem) AS n_child,
             (SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
      UNION ALL
      SELECT 'orders->customer',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'customer->nation',
             (SELECT count(*) FROM customer),
             (SELECT count(*) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM nation n
                                 WHERE n.n_nationkey = c.c_nationkey))
      UNION ALL
      SELECT 'lineitem->part',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM part p
                                 WHERE p.p_partkey = l.l_partkey))
    )
    SELECT relation, CAST(n_child AS BIGINT) AS n_child,
           CAST(n_orphans AS BIGINT) AS n_orphans,
           n_orphans = 0 AS fk_holds
    FROM checks
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan counts
    for the four FK relations (lineitem→orders, orders→customer,
    customer→nation, lineitem→part) — the first report a warehouse
    onboarding runs, and the one that catches a bad backfill before any
    query does. Each check is ONE left-anti join aggregated to a count:
    anti joins broadcast when the parent's key column fits (nation
    always; orders/part per AQE) and otherwise shuffle on the key — no
    EXISTS-per-row evaluation, no parent table materialized wider than
    its key. Child-side counts reuse the same scans; output is one row
    per relation with a pass verdict."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    p = t(spark, sf_dir, "part")

    def check(name, child, key, parent, pkey):
        orphans = child.select(key).join(
            parent.select(F.col(pkey).alias(key)), key, "left_anti"
        )
        return (
            child.agg(F.count(F.lit(1)).alias("n_child"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
            .select(
                F.lit(name).alias("relation"),
                bi(F.col("n_child")).alias("n_child"),
                bi(F.col("n_orphans")).alias("n_orphans"),
                (F.col("n_orphans") == 0).alias("fk_holds"),
            )
        )

    return (
        check("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionAll(check("orders->customer", o, "o_custkey", c, "c_custkey"))
        .unionAll(check("customer->nation", c, "c_nationkey", n, "n_nationkey"))
        .unionAll(check("lineitem->part", li, "l_partkey", p, "p_partkey"))
    )


@query(
    "events_seasonal_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT CAST(ts AS DATE) AS day,
             isodow(CAST(ts AS DATE)) AS dow,
             hour(ts) AS hr,
             count(*) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    baseline AS (
      SELECT dow, hr,
             sum(n) AS tot_n, count(*) AS n_cells
      FROM hourly GROUP BY 1, 2
    )
    SELECT CAST(h.day AS VARCHAR) AS day,
           CAST(h.hr AS BIGINT) AS hr,
           CAST(h.n AS BIGINT) AS n_events,
           round((b.tot_n - h.n) / CAST(b.n_cells - 1 AS DOUBLE), 6) AS baseline_n,
           h.n * (b.n_cells - 1) > 2 * (b.tot_n - h.n)
             OR 2 * h.n * (b.n_cells - 1) < (b.tot_n - h.n) AS anomaly
    FROM hourly h
    JOIN baseline b ON b.dow = h.dow AND b.hr = h.hr
    WHERE b.n_cells > 1
    """,
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection: each (day, hour)'s event count
    against the LEAVE-ONE-OUT average of the same weekday-hour cell
    across the corpus — traffic has day-of-week × hour-of-day structure
    that a global z-score (events_zscore_outliers) washes out, so the
    baseline is seasonal and excludes the cell being judged (the
    ml_target_encoding discipline applied to monitoring). Flag at ±2×
    baseline, compared in EXACT INTEGER form (n·(cells−1) vs 2·Σothers —
    no float thresholds, §5.3-clean). Two keyed aggs: (day, dow, hr)
    then (dow, hr); the baseline is a 7×24-row broadcast dimension."""
    e = t(spark, sf_dir, "events")
    iso_dow = ((F.dayofweek(F.to_date("ts")) + 5) % 7) + 1
    hourly = e.groupBy(
        F.to_date("ts").alias("day"),
        iso_dow.alias("dow"),
        F.hour("ts").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    baseline = hourly.groupBy("dow", "hr").agg(
        F.sum("n").alias("tot_n"), F.count(F.lit(1)).alias("n_cells")
    )
    j = hourly.join(F.broadcast(baseline), ["dow", "hr"]).where(F.col("n_cells") > 1)
    others = F.col("tot_n") - F.col("n")
    cells1 = F.col("n_cells") - 1
    return j.select(
        F.col("day").cast("string").alias("day"),
        bi(F.col("hr")).alias("hr"),
        bi(F.col("n")).alias("n_events"),
        r6(others / cells1.cast("double")).alias("baseline_n"),
        ((F.col("n") * cells1 > 2 * others) | (2 * F.col("n") * cells1 < others)).alias(
            "anomaly"
        ),
    )


@query(
    "dq_order_balance_check",
    oracle="""
    WITH line_totals AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100, 0)
                      AS BIGINT)) AS BIGINT) AS charged_cents,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY 1
    ), joined AS (
      SELECT o.o_orderkey, o.o_orderstatus,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS header_cents,
             lt.charged_cents, lt.n_lines
      FROM orders o JOIN line_totals lt ON lt.l_orderkey = o.o_orderkey
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN abs(header_cents - charged_cents) * 20 > header_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_imbalanced,
           round(avg(abs(header_cents - charged_cents)) / 100.0, 6) AS avg_abs_gap,
           round(CAST(max(abs(header_cents - charged_cents)) AS DOUBLE) / 100.0, 2)
             AS max_abs_gap
    FROM joined
    GROUP BY o_orderstatus
    """,
)
def dq_order_balance_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table balance reconciliation — the classic financial DQ
    gate: does each order header's total agree with the sum of its line
    charges? Money flows as exact integer CENTS (each line charged
    amount quantized once in identical IEEE arithmetic, summed as
    BIGINT — lineitem_abc_pareto's discipline), the imbalance flag is
    an INTEGER comparison (gap×20 > header ⇔ gap > 5% of header), and
    the roll-up reports per-status order counts, flagged counts, and
    average/max absolute gaps. One fact-fact join on the natural key
    (order-grain collapse before the join — the bucketable shape), then
    a status-grain agg. At 100 TB this is the daily ledger-vs-lines
    consistency job; the >5% flag threshold is deliberately integer so
    the verdict can never flip on float summation order."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    charged_cents = F.round(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100,
        0,
    ).cast("long")
    lt = li.groupBy("l_orderkey").agg(
        F.sum(charged_cents).alias("charged_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    joined = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("header_cents"),
    ).join(lt, F.col("o_orderkey") == F.col("l_orderkey"))
    gap = F.abs(F.col("header_cents") - F.col("charged_cents"))
    return joined.groupBy("o_orderstatus").agg(
        bi(F.count(F.lit(1))).alias("n_orders"),
        bi(F.sum(F.when(gap * 20 > F.col("header_cents"), 1).otherwise(0))).alias(
            "n_imbalanced"
        ),
        r6(F.avg(gap) / 100.0).alias("avg_abs_gap"),
        F.round(F.max(gap).cast("double") / 100.0, 2).alias("max_abs_gap"),
    )


@query(
    "dq_observe_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)          AS n_rows,
           round(sum(l_quantity), 4)         AS sum_qty,
           round(min(l_extendedprice), 2)    AS min_price,
           round(max(l_extendedprice), 2)    AS max_price,
           round(avg(l_discount), 6)         AS avg_disc
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    """,
)
def dq_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via the Observation API — DQ metrics
    collected DURING the main job, not by a second scan: the filtered
    lineitem projection materializes once (a noop sink stands in for the
    real downstream write) with ``.observe()`` accumulating count / sum /
    min / max / avg as the rows stream past; the metrics arrive on the
    driver as job-completion listener payload, costing ZERO extra reads.
    This is how production jobs self-report row counts and value ranges
    at 100 TB — an `observe` on the write path replaces the "run the
    pipeline, then run a validation query" double scan that
    dq_expectations-style checks would otherwise pay. The oracle
    recomputes the same aggregates relationally, certifying the
    listener-path arithmetic."""
    from pyspark.sql import Observation

    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    obs = Observation()
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.avg("l_discount").alias("avg_disc"),
    )
    observed.select("l_orderkey", "l_quantity").write.format("noop").mode(
        "overwrite"
    ).save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                round(float(m["sum_qty"]), 4),
                round(float(m["min_price"]), 2),
                round(float(m["max_price"]), 2),
                round(float(m["avg_disc"]), 6),
            )
        ],
        schema="n_rows bigint, sum_qty double, min_price double,"
        " max_price double, avg_disc double",
    )


@query(
    "dq_schema_drift",
    oracle="""
    SELECT * FROM (VALUES
      ('event_id',   'unchanged',    'bigint', 'bigint'),
      ('event_type', 'removed',      'string', NULL),
      ('ingest_tag', 'added',        NULL,     'string'),
      ('props',      'unchanged',    'string', 'string'),
      ('ts',         'unchanged',    'timestamp_ntz', 'timestamp_ntz'),
      ('user_id',    'type_changed', 'bigint', 'string'),
      ('value',      'unchanged',    'double', 'double')
    ) AS t(column_name, status, old_type, new_type)
    """,
)
def dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift detection between two snapshots of a feed — the DQ
    gate that catches an upstream producer silently renaming, dropping,
    or re-typing a column BEFORE a 100 TB backfill bakes the drift in.
    The 'yesterday' snapshot is the events table; 'today' is a scratch
    parquet write with three planted drifts (event_type dropped,
    ingest_tag added, user_id re-typed bigint → string — the classic
    "ids got stringly-typed upstream" failure). Detection reads ONLY
    parquet footers (StructType field lists — metadata, zero data rows
    scanned regardless of table size) and diffs them driver-side into
    one verdict row per column in either schema. The oracle is the
    expected verdict table as literal VALUES: deterministic fixture →
    deterministic diff, so the hash certifies the classifier logic
    (added / removed / type_changed / unchanged), not just row counts.
    Timestamp note: events.ts surfaces as timestamp_ntz through the
    catalog's nanos-safe loader; the drift copy round-trips it
    unchanged."""
    import os

    from .sources import _scratch

    e = t(spark, sf_dir, "events")
    path = _scratch(sf_dir, "events_drifted")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        drifted = e.select(
            "event_id",
            F.col("user_id").cast("string").alias("user_id"),
            "value",
            "props",
            "ts",
            F.lit("batch-42").alias("ingest_tag"),
        )
        drifted.write.mode("overwrite").parquet(path)
    new_schema = spark.read.parquet(path).schema

    old = {f.name: f.dataType.simpleString() for f in e.schema.fields}
    new = {f.name: f.dataType.simpleString() for f in new_schema.fields}
    rows = []
    for name in sorted(set(old) | set(new)):
        if name not in new:
            rows.append((name, "removed", old[name], None))
        elif name not in old:
            rows.append((name, "added", None, new[name]))
        elif old[name] != new[name]:
            rows.append((name, "type_changed", old[name], new[name]))
        else:
            rows.append((name, "unchanged", old[name], new[name]))
    return spark.createDataFrame(
        rows, "column_name string, status string, old_type string, new_type string"
    )
