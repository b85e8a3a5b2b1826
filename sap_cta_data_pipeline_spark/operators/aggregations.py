"""§2-D Aggregations.

All group-bys here are plain hash aggregations: Spark plans them as
partial (map-side) + final aggregate, so the shuffle carries one row per
(partition, group), not per input row — the 100-TB-safe shape. Group
cardinalities are tiny-to-moderate (6 … |customers|), so no skew handling
is needed; AQE coalesces post-shuffle partitions at small SF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..catalog import load_table as t
from ..catalog import register_views
from ..functions.parity import bi, r2, r4, r6
from ..registry import query


@query(
    "agg_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 2)                                          AS sum_qty,
      round(sum(l_extendedprice), 2)                                     AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
      round(avg(l_quantity), 6)                                          AS avg_qty,
      round(avg(l_extendedprice), 6)                                     AS avg_price,
      round(avg(l_discount), 6)                                          AS avg_disc,
      count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q1-shaped) pricing summary: scan → filter → hash agg.

    Scale: the only shuffle carries ≤ 6 groups × n_partitions partial rows;
    the scan is the whole cost and prunes to 7 of 11 columns.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r2(F.sum("l_quantity")).alias("sum_qty"),
            r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            r2(F.sum(disc_price)).alias("sum_disc_price"),
            r2(F.sum(charge)).alias("sum_charge"),
            r6(F.avg("l_quantity")).alias("avg_qty"),
            r6(F.avg("l_extendedprice")).alias("avg_price"),
            r6(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_global",
    oracle="""
    SELECT
      count(*)                              AS n_rows,
      round(sum(l_extendedprice), 2)        AS sum_price,
      round(min(l_extendedprice), 6)        AS min_price,
      round(max(l_extendedprice), 6)        AS max_price,
      round(avg(l_extendedprice), 6)        AS avg_price,
      round(sum(l_quantity), 4)             AS sum_qty,
      count(DISTINCT l_returnflag)          AS n_flags
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped global aggregate: partial-agg per partition → single final
    row; no wide shuffle of data rows at any scale."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        r2(F.sum("l_extendedprice")).alias("sum_price"),
        r6(F.min("l_extendedprice")).alias("min_price"),
        r6(F.max("l_extendedprice")).alias("max_price"),
        r6(F.avg("l_extendedprice")).alias("avg_price"),
        r4(F.sum("l_quantity")).alias("sum_qty"),
        F.countDistinct("l_returnflag").alias("n_flags"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT
      l_suppkey,
      count(DISTINCT l_partkey) AS n_parts,
      count(*)                  AS n_items
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group. Spark expands distinct aggregates into a
    two-phase plan (dedup on (suppkey, partkey), then count) — scales as a
    pair of hash shuffles keyed by the group column."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT
      o_custkey,
      count(*)                     AS n_orders,
      round(sum(o_totalprice), 2)  AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r2(F.sum("o_totalprice")).alias("total_spent"),
        )
        .filter(F.col("n_orders") > 12)
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT
      o_orderpriority,
      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
      round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS f_revenue,
      round(avg(CASE WHEN o_totalprice > 100000 THEN 1.0 ELSE 0.0 END), 6)      AS big_order_ratio
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivoted conditional aggregation — sum(CASE WHEN …) flags."""
    o = t(spark, sf_dir, "orders")
    st = F.col("o_orderstatus")
    return o.groupBy("o_orderpriority").agg(
        bi(F.sum(F.when(st == "F", 1).otherwise(0))).alias("n_f"),
        bi(F.sum(F.when(st == "O", 1).otherwise(0))).alias("n_o"),
        bi(F.sum(F.when(st == "P", 1).otherwise(0))).alias("n_p"),
        r2(F.sum(F.when(st == "F", F.col("o_totalprice")).otherwise(F.lit(0.0)))).alias("f_revenue"),
        r6(F.avg(F.when(F.col("o_totalprice") > 100000, F.lit(1.0)).otherwise(F.lit(0.0)))).alias(
            "big_order_ratio"
        ),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT
      l_returnflag,
      round(stddev_samp(l_quantity), 6)             AS sd_qty,
      round(var_samp(l_quantity), 6)                AS var_qty,
      round(corr(l_quantity, l_extendedprice), 6)   AS corr_qty_price,
      round(avg(l_discount), 6)                     AS avg_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample stddev/variance, correlation)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r6(F.stddev_samp("l_quantity")).alias("sd_qty"),
        r6(F.var_samp("l_quantity")).alias("var_qty"),
        r6(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        r6(F.avg("l_discount")).alias("avg_disc"),
    )


@query(
    "agg_median_exact",
    oracle="""
    SELECT
      o_orderpriority,
      round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
      round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
      count(*)                                   AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (interpolating, Spark `percentile` ≡ DuckDB
    `quantile_cont`). Exact percentile requires per-group sort — at 100 TB
    switch to `agg_quantile_approx` (sketch-based, single pass)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        r4(F.expr("percentile(o_totalprice, 0.5)")).alias("median_price"),
        r4(F.expr("percentile(o_totalprice, 0.9)")).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query("agg_quantile_approx")  # rows-only: sketch contents are engine-specific
def agg_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via Spark's QuantileSummaries sketch
    (Greenwald–Khanna): one pass, mergeable partials — the 100-TB
    replacement for exact percentile."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        r4(F.percentile_approx("o_totalprice", 0.5, 10000)).alias("approx_median"),
        r4(F.percentile_approx("o_totalprice", 0.9, 10000)).alias("approx_p90"),
    )


@query("agg_countd_approx")  # rows-only: HLL estimates are engine-specific
def agg_countd_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate COUNT(DISTINCT) via HyperLogLog++: mergeable fixed-size
    sketches instead of a dedup shuffle — the 100-TB distinct-count path."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT
      r_name,
      n_name,
      round(sum(o_totalprice), 2)            AS revenue,
      count(*)                               AS n_orders,
      CAST(GROUPING(r_name) AS BIGINT)       AS g_region,
      CAST(GROUPING(n_name) AS BIGINT)       AS g_nation
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping flags. Nation / region are bounded dimensions
    (25 / 5 rows at every scale) and carry an explicit broadcast hint;
    customer is UNBOUNDED at 100 TB, so whether that edge broadcasts is
    left to AQE's runtime-stats decision — same policy as join_multiway
    (joins.py). The join only needs (c_custkey, c_nationkey), so customer
    is pre-projected to those two columns before the join: at 100 TB that
    drops the shuffled payload from the full customer row to 16 bytes/row,
    and at small SF it keeps AQE free to choose broadcast from real
    post-projection stats. Round 4: the rollup is computed by
    RE-AGGREGATION from the finest grain — one ordinary partial+final
    hash agg collapses the fact stream to the (region, nation) grain
    (≤ |regions|·|nations| rows), and only that tiny frame goes through
    the rollup's 3-way EXPAND. Spark's single-pass rollup expands EVERY
    fact row ×(levels+1) BEFORE the partial agg (the sf10 floor study
    measured the expand at 3× the useful work: 2.06 s → 0.7 s); the
    re-aggregation form is valid because sum/count are decomposable —
    the same reason partial aggregation itself works — and is exactly
    how a 100 TB rollup must be built: expand on the fact side costs
    (levels+1)× the corpus scan, expand on the finest-grain result is
    free. Rounding happens once, at the final grain (parity policy)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    c_slim = c.select("c_custkey", "c_nationkey")
    joined = (
        o.join(c_slim, o.o_custkey == c_slim.c_custkey)
        .join(F.broadcast(n), c_slim.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    finest = joined.groupBy("r_name", "n_name").agg(
        F.sum("o_totalprice").alias("rev_part"),
        F.count(F.lit(1)).alias("n_part"),
    )
    return finest.rollup("r_name", "n_name").agg(
        r2(F.sum("rev_part")).alias("revenue"),
        bi(F.sum("n_part")).alias("n_orders"),
        bi(F.grouping("r_name")).alias("g_region"),
        bi(F.grouping("n_name")).alias("g_nation"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 4)          AS sum_qty,
      count(*)                           AS n,
      CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
      CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus)."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        r4(F.sum("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
        bi(F.grouping("l_returnflag")).alias("g_flag"),
        bi(F.grouping("l_linestatus")).alias("g_status"),
    )


_GROUPING_SETS_SQL = """
SELECT
  c_mktsegment,
  n_name,
  round(sum(c_acctbal), 2) AS acctbal,
  count(*)                 AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
"""


@query("agg_grouping_sets", oracle=_GROUPING_SETS_SQL)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — runs through spark.sql over the registered
    views (SQL-surface parity, SURVEY.md §3.2); identical text runs on the
    DuckDB oracle."""
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(_GROUPING_SETS_SQL)


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT
      o_custkey,
      array_to_string(list_sort(list(year(o_orderdate))), ',') AS order_years_csv,
      count(*)                                                 AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list with deterministic ordering. collect_list order is
    nondeterministic under parallelism, so the list is array_sort-ed; the
    output is canonicalized to CSV because array cells are not reliably
    comparable across engines in a value-hash (SURVEY.md §5.3)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list(bi(F.year("o_orderdate"))))).alias(
            "order_years_csv"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


@pandas_udf(DoubleType())
def _geomean_udaf(v: pd.Series) -> float:
    """Grouped-agg pandas UDAF: geometric mean (Arrow-batched, one call per
    group — the vectorized slow-path escape hatch, §2-L)."""
    return float(np.exp(np.log(v.astype("float64")).mean()))


@query(
    "agg_udaf_geomean",
    oracle="""
    SELECT
      o_orderpriority,
      round(exp(avg(ln(o_totalprice))), 4) AS geomean_price,
      count(*)                             AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF (geometric mean) as a pandas GROUPED_AGG UDF. Note the
    SQL-native formulation exp(avg(ln(x))) is the JVM-side fast path; the
    UDAF exists to exercise the custom-aggregate surface."""
    o = t(spark, sf_dir, "orders")
    # A group-agg pandas UDF cannot mix with JVM aggregates in one agg();
    # the row count comes from a cheap second hash agg joined back.
    gm = o.groupBy("o_orderpriority").agg(
        r4(_geomean_udaf(F.col("o_totalprice"))).alias("geomean_price")
    )
    counts = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    return gm.join(counts, "o_orderpriority")


@query(
    "agg_boolean_every_any",
    oracle="""
    SELECT event_type,
           bool_and(value > 0.0)    AS all_positive,
           bool_or(value > 99.0)    AS any_large,
           CAST(count_if(value > 50.0) AS BIGINT) AS n_over_50,
           count(*)                 AS n
    FROM events
    GROUP BY event_type
    """,
)
def agg_boolean_every_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate surface: every()/any() (ANSI bool_and/bool_or)
    and count_if per group — the predicates-as-aggregates idiom data
    quality checks compile to (dq_expectations builds exactly these by
    hand from conditional sums). All three are algebraic single-bit/
    counter state: partial+final agg, one shuffle, O(1) per-group
    memory."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 0.0).alias("all_positive"),
        F.bool_or(F.col("value") > 99.0).alias("any_large"),
        F.count_if(F.col("value") > 50.0).alias("n_over_50"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_decimal_exact_money",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price_exact,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_exact,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_decimal_exact_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-money aggregation discipline: prices are cast to
    DECIMAL(18,2) BEFORE summation, so the group sums are exact integers
    of cents — no float summation-order error, no rounding policy needed,
    and the result is bit-identical on ANY partitioning/merge order
    (decimal addition is associative; float addition is not). This is
    the finance-grade twin of agg_pricing_summary's float lane: the
    float lane needs the r2-dominates-error argument (parity.py), the
    decimal lane needs none. The discounted sum multiplies in decimal
    too (DECIMAL(18,2) × DECIMAL(4,2) widens losslessly). Final cast to
    DOUBLE is for cross-engine dtype parity and is exact below 2⁵³
    cents. At 100 TB decimal aggregation is also the MERGEABLE form:
    per-partition cent-sums recombine exactly (agg_incremental_merge's
    algebra), which float partials only do approximately."""
    li = t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(price).alias("sp"),
            F.sum(price * (1 - disc)).alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            F.col("sp").cast("double").alias("sum_price_exact"),
            F.col("sd").cast("double").alias("sum_disc_exact"),
            bi(F.col("n")).alias("n"),
        )
    )


@query(
    "agg_count_distinct_multi",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_days,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_count_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) on DIFFERENT columns in one aggregate —
    the surface every KPI query uses and the planner case worth pinning:
    Catalyst compiles n distinct-columns via EXPAND (each input row
    replicated once per distinct spec with a grouping id), then a
    two-level aggregate — one scan, not n self-joins, at the cost of an
    n× shuffle expansion. At 100 TB that expansion is the documented
    trade: if it hurts, the swap is one approx_count_distinct per
    column (agg_countd_approx's sketch lane) which needs NO expand —
    exact-and-expand vs approximate-and-linear is the distinct-count
    scale decision in one query."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        bi(F.countDistinct("o_custkey")).alias("n_customers"),
        bi(F.countDistinct(F.to_date("o_orderdate"))).alias("n_days"),
        bi(F.count(F.lit(1))).alias("n_orders"),
        r2(F.sum("o_totalprice")).alias("revenue"),
    )


@query(
    "agg_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers on ROLLUP — the surface that makes subtotal rows
    DISTINGUISHABLE from genuine NULL group values (agg_rollup's NULLs
    are ambiguous the moment a grouping column is nullable; grouping()=1
    says 'this NULL means ALL'). Report writers and OLAP cube consumers
    key on exactly these markers. Same single-pass expand+agg plan as
    agg_rollup; the markers are free metadata of the grouping-set id."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            bi(F.grouping("l_returnflag")).alias("g_flag"),
            bi(F.grouping("l_linestatus")).alias("g_status"),
            bi(F.count(F.lit(1))).alias("n"),
            r2(F.sum("l_quantity")).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "sum_qty")
    )


@query(
    "agg_winsorized_stats",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(value, 0.05) AS lo, quantile_cont(value, 0.95) AS hi
      FROM events
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(e.value), 6) AS raw_mean,
           round(avg(least(greatest(e.value, b.lo), b.hi)), 6) AS winsorized_mean,
           CAST(count(*) FILTER (WHERE e.value < b.lo OR e.value > b.hi) AS BIGINT)
             AS n_clamped
    FROM events e CROSS JOIN b
    GROUP BY e.event_type
    """,
)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized means per stream — the robust-metrics discipline for
    heavy-tailed value columns (a handful of whale events should not own
    an average that feeds alerting or A/B readouts; events_ab_ttest on
    raw means is exactly where this bites): values clamp to the global
    [p5, p95] band before averaging, with the clamp count reported so
    the trim is auditable. Two-phase: one exact-percentile pass builds
    the 1-row band (broadcast), then a single conditional agg — the
    same stats-pass-then-projection shape as profile_histogram_auto;
    at 100 TB swap the exact percentiles for the GK sketch
    (quantile_accuracy_eval is the calibration that licenses it). The
    band is computed on identical inputs both engines → identical
    clamp boundaries (§5.3)."""
    e = t(spark, sf_dir, "events")
    b = e.agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    j = e.crossJoin(F.broadcast(b))
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return j.groupBy("event_type").agg(
        bi(F.count(F.lit(1))).alias("n"),
        r6(F.avg("value")).alias("raw_mean"),
        r6(F.avg(clamped)).alias("winsorized_mean"),
        bi(
            F.sum(((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).cast("int"))
        ).alias("n_clamped"),
    )
