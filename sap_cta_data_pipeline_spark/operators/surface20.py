"""§2 round-8 batch DX — calendar-interval semantics + exact linear
SHAP attribution.

- ``fn_interval_calendar_arith``: the add-months/date-arith parity
  surface every billing system hits — calendar-aware month addition
  CLAMPS to end of month (Jan 31 + 1 month = Feb 28/29, and both
  engines agree: Spark add_months == DuckDB + INTERVAL n MONTH),
  leap-day handling, month-boundary day diffs, and quarter bucketing.
  The clamp cases are pinned on explicit literals in tests.
- ``ml_shap_linear_exact``: for a linear model SHAP values are exact
  and closed-form — φⱼ(x) = wⱼ·(xⱼ − E[xⱼ]) (interventional SHAP;
  Lundberg & Lee 2017 §4.1 "Linear SHAP") — so the whole attribution
  is two scans: fit the two-feature OLS from sufficient statistics
  (the ml_ols_two_feature normal-equations fold), then attribute every
  order's prediction to its features and aggregate mean |φ| per order
  priority. No sampling, no kernel — the exact values a SHAP library
  would return for this model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "fn_interval_calendar_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate,
           CAST(CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS plus_1m,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus_3m,
           CAST(CAST(o_orderdate - INTERVAL 1 YEAR  AS DATE) AS VARCHAR) AS minus_1y,
           CAST(CAST(o_orderdate + INTERVAL 45 DAY AS DATE) AS VARCHAR) AS plus_45d,
           CAST(date_diff('day', o_orderdate,
                date_trunc('month', o_orderdate)
                + INTERVAL 1 MONTH) AS BIGINT) AS days_to_month_end,
           CAST(date_part('quarter', o_orderdate) AS INT) AS q
    FROM orders WHERE o_orderkey % 251 = 0
    """,
)
def fn_interval_calendar_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic parity: month/year addition is
    CALENDAR-aware (clamped to month end — Spark ``add_months`` and
    DuckDB ``+ INTERVAL n MONTH`` both implement the SQL standard's
    clamp; the Jan-31 and leap-Feb literal cases are pinned in tests),
    day addition is pure, days-to-month-end composes date_trunc with
    month addition, and quarter() buckets. The subset filter keeps the
    lane row-light; semantics, not volume, are under test.

    Scale: pure map-side date arithmetic — zero shuffle, codegen'd."""
    o = t(spark, sf_dir, "orders").filter("o_orderkey % 251 = 0")
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.add_months("o_orderdate", 1).cast("string").alias("plus_1m"),
        F.add_months("o_orderdate", 3).cast("string").alias("plus_3m"),
        F.add_months("o_orderdate", -12).cast("string").alias("minus_1y"),
        F.date_add("o_orderdate", 45).cast("string").alias("plus_45d"),
        F.datediff(
            F.add_months(F.date_trunc("month", "o_orderdate").cast("date"), 1),
            F.col("o_orderdate"),
        )
        .cast("long")
        .alias("days_to_month_end"),
        F.quarter("o_orderdate").cast("int").alias("q"),
    )


@query(
    "ml_shap_linear_exact",
    oracle="""
    WITH feat AS (
      SELECT o.o_orderkey, o.o_orderpriority AS priority,
             CAST(o.o_totalprice AS DOUBLE) AS y,
             CAST(count(*) AS DOUBLE) AS x1,
             CAST(sum(l.l_quantity) AS DOUBLE) AS x2
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_totalprice
    ),
    s AS (
      SELECT count(*) AS n,
             avg(x1) AS m1, avg(x2) AS m2, avg(y) AS my,
             sum(x1 * x1) AS s11r, sum(x2 * x2) AS s22r,
             sum(x1 * x2) AS s12r, sum(x1 * y) AS s1yr,
             sum(x2 * y) AS s2yr
      FROM feat
    ),
    coef AS (
      SELECT m1, m2,
             (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) AS b1,
             (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS b2
      FROM (
        SELECT n, m1, m2, my,
               s11r - n * m1 * m1 AS s11, s22r - n * m2 * m2 AS s22,
               s12r - n * m1 * m2 AS s12, s1yr - n * m1 * my AS s1y,
               s2yr - n * m2 * my AS s2y
        FROM s
      )
    )
    SELECT f.priority,
           CAST(count(*) AS BIGINT)                   AS n_orders,
           round(avg(abs(c.b1 * (f.x1 - c.m1))), 6)   AS mean_abs_shap_x1,
           round(avg(abs(c.b2 * (f.x2 - c.m2))), 6)   AS mean_abs_shap_x2,
           round(avg(c.b1 * (f.x1 - c.m1)), 6)        AS mean_shap_x1,
           round(avg(c.b2 * (f.x2 - c.m2)), 6)        AS mean_shap_x2
    FROM feat f CROSS JOIN coef c
    GROUP BY f.priority
    """,
)
def ml_shap_linear_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact SHAP for a linear model (Linear SHAP, Lundberg & Lee 2017):
    fit y = b₀ + b₁·x₁ + b₂·x₂ (x₁ = lines per order, x₂ = total
    quantity, y = order value) from sufficient statistics — the same
    normal-equations fold as ml_ols_two_feature — then attribute
    EVERY order exactly: φⱼ = bⱼ·(xⱼ − mean(xⱼ)), and report per
    order-priority mean |φ| (global feature importance) and mean φ
    (directional effect). φ₁ + φ₂ + mean(y) reconstructs each
    prediction exactly — the additivity axiom, pinned in tests.

    Scale: two corpus passes — one join+agg builds the feature frame,
    one 1-row sufficient-stats aggregate fits the model (broadcast back
    as a scalar frame), one more agg attributes. No per-row model
    object, no Python; this is why linear SHAP is the only SHAP that
    runs casually at 100 TB."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    feat = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").cast("double").alias("y"),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("x1"),
            F.sum("l_quantity").cast("double").alias("x2"),
        )
    )
    s = feat.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x1").alias("m1"),
        F.avg("x2").alias("m2"),
        F.avg("y").alias("my"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11r"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22r"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12r"),
        F.sum(F.col("x1") * F.col("y")).alias("s1yr"),
        F.sum(F.col("x2") * F.col("y")).alias("s2yr"),
    )
    cen = s.select(
        "m1",
        "m2",
        (F.col("s11r") - F.col("n") * F.col("m1") * F.col("m1")).alias("s11"),
        (F.col("s22r") - F.col("n") * F.col("m2") * F.col("m2")).alias("s22"),
        (F.col("s12r") - F.col("n") * F.col("m1") * F.col("m2")).alias("s12"),
        (F.col("s1yr") - F.col("n") * F.col("m1") * F.col("my")).alias("s1y"),
        (F.col("s2yr") - F.col("n") * F.col("m2") * F.col("my")).alias("s2y"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    coef = cen.select(
        "m1",
        "m2",
        ((F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det).alias(
            "b1"
        ),
        ((F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det).alias(
            "b2"
        ),
    )
    phi1 = F.col("b1") * (F.col("x1") - F.col("m1"))
    phi2 = F.col("b2") * (F.col("x2") - F.col("m2"))
    return (
        feat.crossJoin(F.broadcast(coef))
        .groupBy("priority")
        .agg(
            bi(F.count(F.lit(1))).alias("n_orders"),
            r6(F.avg(F.abs(phi1))).alias("mean_abs_shap_x1"),
            r6(F.avg(F.abs(phi2))).alias("mean_abs_shap_x2"),
            r6(F.avg(phi1)).alias("mean_shap_x1"),
            r6(F.avg(phi2)).alias("mean_shap_x2"),
        )
    )
