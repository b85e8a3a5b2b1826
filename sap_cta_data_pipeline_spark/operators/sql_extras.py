"""§2 round-2 addendum — remaining ANSI aggregate/window surfaces.

Completes the §2-D/E function surface with the forms users reach for that
round 1 did not register: discrete percentiles, bivariate statistics
(corr / covariance / linear-regression aggregates), a deterministic MODE,
and per-partition COUNT(DISTINCT) at row grain.

Scale notes:
- percentile_disc / mode / regr_* are all single-shuffle grouped
  aggregates with partial+final phases (regr_* and corr are algebraic:
  their state is a handful of sums/moments, constant-size per group);
- the deterministic mode is groupBy(key, value) + per-key rank — two
  shuffles but both keyed and combiner-friendly, and it pins tie-breaks
  (engine-native mode() is unspecified under ties → unusable for parity
  or reproducible pipelines);
- win_count_distinct keeps row grain with a per-partition exact distinct
  via collect_set over the window — state is per-key distinct values,
  bounded here by suppliers-per-order (≤7); for unbounded-cardinality keys
  the scale path is a grouped countDistinct re-joined onto the fact, which
  is the decorrelated form of the same query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r4, r6
from ..registry import query


@query(
    "agg_percentile_disc",
    oracle="""
    SELECT o_orderstatus,
           percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
           percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
           percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (exact order statistics — an actual member of
    the group, no interpolation; contrast agg_median_exact's continuous
    median). Exact-but-distributed: per-group sort only, no global sort.
    The approximate twin for 100 TB is agg_quantile_approx /
    agg_quantile_mergeable (KLL-style mergeable sketches)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)").alias("p25"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)").alias("p50"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)").alias("p75"),
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH counted AS (
      SELECT l_returnflag, l_quantity, count(*) AS cnt
      FROM lineitem
      GROUP BY l_returnflag, l_quantity
    ), ranked AS (
      SELECT l_returnflag, l_quantity, cnt,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cnt DESC, l_quantity ASC) AS rk
      FROM counted
    )
    SELECT l_returnflag,
           l_quantity AS mode_quantity,
           cnt        AS mode_count
    FROM ranked WHERE rk = 1
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE with a pinned tie-break (highest count, then smallest value).
    Engine-native mode() leaves ties unspecified — across engines, runs,
    and partitionings that is a reproducibility bug; a training-data
    pipeline needs the same mode every run. Shape: counted groupBy
    (combiner-friendly) then a per-key rank over group-count rows (tiny:
    |distinct values per key|)."""
    li = t(spark, sf_dir, "lineitem")
    counted = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.asc("l_quantity"))
    return (
        counted.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_quantity"),
            F.col("cnt").alias("mode_count"),
        )
    )


@query(
    "agg_corr_regr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)           AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4)     AS covar_qty_price,
           round(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics + linear-regression aggregates per group. All
    algebraic aggregates (state = co-moment sums) → partial+final with
    constant per-group state; at 100 TB this is a single shuffle of
    5-doubles-per-group, nothing more."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r6(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        r4(F.covar_samp("l_quantity", "l_extendedprice")).alias("covar_qty_price"),
        r6(F.regr_slope("l_extendedprice", "l_quantity")).alias("slope"),
        r4(F.regr_intercept("l_extendedprice", "l_quantity")).alias("intercept"),
        r6(F.regr_r2("l_extendedprice", "l_quantity")).alias("r2"),
    )


@query(
    "win_count_distinct",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supp_in_order,
           count(DISTINCT l_partkey) OVER (PARTITION BY l_orderkey) AS n_parts_in_order
    FROM lineitem
    """,
)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition exact COUNT(DISTINCT) at row grain. Spark's window
    operator rejects DISTINCT aggregates, so the idiomatic form is
    size(collect_set(..)) over the window — exact, one shuffle by the
    partition key. Window state is the per-order distinct set (≤7 here);
    for high-cardinality keys use groupBy(key).countDistinct + re-join
    (same result, bounded state)."""
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        bi(F.size(F.collect_set("l_suppkey").over(w))).alias("n_supp_in_order"),
        bi(F.size(F.collect_set("l_partkey").over(w))).alias("n_parts_in_order"),
    )


@query(
    "agg_moments_high",
    oracle="""
    WITH m AS (
      SELECT event_type,
             count(*)                              AS n,
             sum(value)                            AS s1,
             sum(value * value)                    AS s2,
             sum(value * value * value)            AS s3,
             sum(value * value * value * value)    AS s4
      FROM events GROUP BY 1
    )
    SELECT event_type, n,
           round(s1 / n, 6) AS mean,
           round((s2 / n - (s1 / n) ^ 2), 6) AS m2,
           round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) ^ 3)
                 / ((s2 / n - (s1 / n) ^ 2) ^ 1.5), 6) AS skewness,
           round((s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * ((s1 / n) ^ 2) * (s2 / n)
                  - 3 * (s1 / n) ^ 4)
                 / ((s2 / n - (s1 / n) ^ 2) ^ 2) - 3, 6) AS excess_kurtosis
    FROM m
    """,
)
def agg_moments_high(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness / excess kurtosis per series from RAW POWER SUMS
    (Σx..Σx⁴) — one algebraic pass, mergeable partials, and the SAME
    closed-form combination on both engines. Engine-builtin skewness()/
    kurtosis() differ across systems in bias correction (sample vs
    population), so the explicit formula is the portable contract; it is
    also exactly the shape a 100 TB profiler persists (power sums merge
    by addition, unlike finished skewness values)."""
    e = t(spark, sf_dir, "events")
    v = F.col("value")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    mean = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mean**2
    m3 = F.col("s3") / F.col("n") - 3 * mean * (F.col("s2") / F.col("n")) + 2 * mean**3
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mean * (F.col("s3") / F.col("n"))
        + 6 * (mean**2) * (F.col("s2") / F.col("n"))
        - 3 * mean**4
    )
    return m.select(
        "event_type",
        "n",
        r6(mean).alias("mean"),
        r6(m2).alias("m2"),
        r6(m3 / m2**1.5).alias("skewness"),
        r6(m4 / m2**2 - 3).alias("excess_kurtosis"),
    )
