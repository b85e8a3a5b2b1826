"""§2 round-7 batch CT — experimentation depth (sequential monitoring,
power planning).

Completes the A/B lane (t-test, SRM χ², CUPED, DiD — rounds 1-6) with
the two tools an experimentation platform runs AROUND a test:

- SEQUENTIAL monitoring (SPRT): the day-by-day cumulative
  log-likelihood ratio between H1 ('treatment lifts conversion 10%
  relative') and H0 ('no lift'), with Wald's decision boundaries —
  the statistically-licensed alternative to peeking at a fixed-horizon
  p-value every morning (which inflates false positives, the classic
  experimentation bug),
- POWER / MDE planning: from the observed control rate and traffic,
  the minimum detectable relative lift at α=0.05 / power=0.8 and the
  required per-arm n for a grid of target lifts — the 'how long must
  this test run' answer.

Arms derive from user_id parity (deterministic, engine-independent —
the split_train_test discipline; no rand()). Scale: both reduce to
day- or 1-row-grain aggregates after one corpus scan; the SPRT fold is
a day-grain cumulative window (O(days) rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

#: z-quantiles as literals (both engines lack an inverse-normal builtin
#: with guaranteed cross-engine bits): z_{1-α/2} for α=0.05, z_{power}
#: for 0.8 — the standard two-sided 5% / 80% design constants.
_Z_ALPHA = 1.959964
_Z_POWER = 0.841621
_LIFT_H1 = 0.10  # SPRT's H1: +10% relative conversion lift


@query(
    "events_ab_sequential_sprt",
    oracle=f"""
    WITH a AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             user_id % 2 AS arm,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
      FROM events
    ),
    d AS (
      SELECT day, arm, count(*) * 1.0 AS n, sum(conv) * 1.0 AS c
      FROM a GROUP BY 1, 2
    ),
    p AS (
      SELECT day,
             sum(CASE WHEN arm = 0 THEN n END) AS n0,
             sum(CASE WHEN arm = 0 THEN c END) AS c0,
             sum(CASE WHEN arm = 1 THEN n END) AS n1,
             sum(CASE WHEN arm = 1 THEN c END) AS c1
      FROM d GROUP BY 1
    ),
    cum AS (
      SELECT day,
             sum(n0) OVER w AS n0, sum(c0) OVER w AS c0,
             sum(n1) OVER w AS n1, sum(c1) OVER w AS c1
      FROM p WINDOW w AS (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    llr AS (
      SELECT day, n0, c0, n1, c1,
             -- p0 = pooled MLE under H0; p1 = p0*(1+lift) under H1 (treat arm)
             (c0 + c1) / (n0 + n1) AS p0
      FROM cum
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(n0 + n1 AS BIGINT) AS exposures,
           round(c1 * ln((p0 * (1 + {_LIFT_H1})) / p0)
                 + (n1 - c1) * ln((1 - p0 * (1 + {_LIFT_H1})) / (1 - p0)), 6)
             AS llr,
           CASE WHEN c1 * ln((p0 * (1 + {_LIFT_H1})) / p0)
                     + (n1 - c1) * ln((1 - p0 * (1 + {_LIFT_H1})) / (1 - p0))
                     >= ln(0.8 / 0.05) THEN 'accept_h1'
                WHEN c1 * ln((p0 * (1 + {_LIFT_H1})) / p0)
                     + (n1 - c1) * ln((1 - p0 * (1 + {_LIFT_H1})) / (1 - p0))
                     <= ln(0.2 / 0.95) THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM llr
    """,
)
def events_ab_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT monitoring of the treatment arm: per day, the
    CUMULATIVE log-likelihood ratio of the treatment conversions under
    H1 (rate = pooled·1.10) vs H0 (rate = pooled), with the classical
    boundaries ln(β̄/α) above (accept H1) and ln(β/ᾱ) below (accept H0),
    α=0.05, β=0.2. Every day's row carries its decision — 'continue'
    until a boundary crossing, after which stopping is licensed; this
    is what replaces daily p-value peeking. One scan → day×arm agg →
    day-grain cumulative window (O(days) rows) → pure log arithmetic."""
    e = t(spark, sf_dir, "events")
    a = e.select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        (F.col("user_id") % 2).alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("conv"),
    )
    d = a.groupBy("day", "arm").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("conv").cast("double").alias("c"),
    )
    p = d.groupBy("day").agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("c"))).alias("c0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("c"))).alias("c1"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = p.select(
        "day",
        F.sum("n0").over(w).alias("n0"),
        F.sum("c0").over(w).alias("c0"),
        F.sum("n1").over(w).alias("n1"),
        F.sum("c1").over(w).alias("c1"),
    )
    p0 = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    p1 = p0 * (1 + _LIFT_H1)
    llr = F.col("c1") * F.log(p1 / p0) + (F.col("n1") - F.col("c1")) * F.log(
        (1 - p1) / (1 - p0)
    )
    import math

    upper = math.log(0.8 / 0.05)
    lower = math.log(0.2 / 0.95)
    return cum.select(
        F.col("day").cast("string").alias("day"),
        bi(F.col("n0") + F.col("n1")).alias("exposures"),
        r6(llr).alias("llr"),
        F.when(llr >= upper, "accept_h1")
        .when(llr <= lower, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )


@query(
    "events_ab_power_mde",
    oracle=f"""
    WITH base AS (
      SELECT count(*) / 2.0 AS n_arm,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               / (count(*) * 1.0) AS p
      FROM events
    ),
    lifts AS (
      SELECT unnest([0.01, 0.05, 0.10]) AS rel_lift
    )
    SELECT round(rel_lift, 6) AS rel_lift,
           CAST(base.n_arm AS BIGINT) AS observed_n_per_arm,
           round(base.p, 6) AS base_rate,
           -- required n/arm: two-proportion z-test approximation
           CAST(ceil(pow({_Z_ALPHA} + {_Z_POWER}, 2)
                 * (base.p * (1 - base.p)
                    + (base.p * (1 + rel_lift)) * (1 - base.p * (1 + rel_lift)))
                 / pow(base.p * rel_lift, 2)) AS BIGINT) AS required_n_per_arm,
           -- MDE at the OBSERVED n/arm (absolute, then relative)
           round(({_Z_ALPHA} + {_Z_POWER})
                 * sqrt(2 * base.p * (1 - base.p) / base.n_arm) / base.p, 6)
             AS mde_relative
    FROM lifts, base
    """,
)
def events_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-planning table: for target relative lifts {1%, 5%, 10%}, the
    required per-arm sample size (two-proportion z approximation with
    the α=0.05 / power=0.8 constants as literals — no cross-engine
    inverse-normal exists), plus the minimum detectable relative effect
    at the traffic actually observed. The 'can this test ever conclude'
    row an experimentation platform shows before anyone launches. One
    1-row aggregate crossed with a 3-row literal grid."""
    e = t(spark, sf_dir, "events")
    base = e.agg(
        (F.count(F.lit(1)) / 2.0).alias("n_arm"),
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("p"),
    )
    lifts = spark.createDataFrame(
        [(0.01,), (0.05,), (0.10,)], "rel_lift double"
    )
    j = lifts.crossJoin(F.broadcast(base))
    z2 = (_Z_ALPHA + _Z_POWER) ** 2
    p, lift = F.col("p"), F.col("rel_lift")
    p1 = p * (1 + lift)
    required = F.ceil(
        z2 * (p * (1 - p) + p1 * (1 - p1)) / F.pow(p * lift, 2)
    ).cast("bigint")
    mde = (
        (_Z_ALPHA + _Z_POWER)
        * F.sqrt(2 * p * (1 - p) / F.col("n_arm"))
        / p
    )
    return j.select(
        r6(lift).alias("rel_lift"),
        bi(F.col("n_arm")).alias("observed_n_per_arm"),
        r6(p).alias("base_rate"),
        required.alias("required_n_per_arm"),
        r6(mde).alias("mde_relative"),
    )
