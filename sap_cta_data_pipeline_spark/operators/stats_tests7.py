"""§2 round-9 batch FT — heteroscedastic ANOVA + equivalence testing.

``stats_welch_anova``: Welch's F* — one-way ANOVA WITHOUT the
equal-variance assumption (the variant actually safe on business
metrics, whose variances differ by segment): per-group weights
w_j = n_j/s_j², F* = [Σw_j(x̄_j−x̃)²/(k−1)] / [1 + 2(k−2)/(k²−1)·Λ]
with the Welch-Satterthwaite Λ and degrees of freedom ν =
(k²−1)/(3Λ). Complements stats_anova_oneway (pooled-variance F) and
stats_levene_brown_forsythe (the variance-equality screen that decides
which to trust).

``stats_tost_equivalence``: two one-sided tests — the NON-INFERIORITY /
equivalence answer a plain t-test cannot give ("the arms are the same
within ±δ" needs evidence FOR the null): z_lower = (Δ+δ)/se,
z_upper = (δ−Δ)/se against a ±5% relative margin on per-user event
values; equivalence holds when BOTH exceed the one-sided critical
value. Every moment is an exact integer sum until the final
expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "stats_welch_anova",
    oracle="""
    WITH x AS (
      SELECT event_type AS grp,
             CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT grp, count(*) AS n, sum(v) AS s, sum(v * v) AS q
      FROM x GROUP BY grp HAVING count(*) >= 2
    ),
    m AS (
      SELECT grp, n,
             CAST(s AS DOUBLE) / n AS mean,
             (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * (CAST(s AS DOUBLE) / n))
               / (n - 1) AS var
      FROM g
    ),
    w AS (
      SELECT grp, n, mean, n / var AS wj FROM m WHERE var > 0
    ),
    tot AS (
      SELECT count(*) AS k, sum(wj) AS sw, sum(wj * mean) AS swm FROM w
    ),
    lam AS (
      SELECT tot.k, tot.sw,
             sum(wj * (mean - tot.swm / tot.sw)
                    * (mean - tot.swm / tot.sw)) AS num_ss,
             sum((1 - wj / tot.sw) * (1 - wj / tot.sw) / (n - 1)) AS lam_raw
      FROM w, tot GROUP BY tot.k, tot.sw
    )
    SELECT CAST(k AS BIGINT) AS k,
           round(num_ss / (k - 1)
                 / (1 + 2.0 * (k - 2) / (CAST(k AS DOUBLE) * k - 1)
                      * lam_raw), 6) AS f_star,
           round((CAST(k AS DOUBLE) * k - 1)
                 / (3.0 * lam_raw), 6) AS df2
    FROM lam
    """,
)
def stats_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's F* across event types on cent-quantized values: per-group
    (n, Σv, Σv²) integer sufficient stats → means/variances → precision
    weights w_j = n_j/s_j², weighted grand mean, and the Welch
    correction Λ = 3Σ[(1−w_j/Σw)²/(n_j−1)]/(k²−1), giving
    F* = [Σw_j(x̄_j−x̃)²/(k−1)] / [1+2(k−2)Λ/3·…] with ν₂ = (k²−1)/(3Λ)
    (Welch 1951 — both engines assemble the identical expression;
    S = Σ(1−w_j/Σw)²/(n_j−1), denominator 1+2(k−2)S/(k²−1), ν₂ =
    (k²−1)/(3S)). Planted pin: two groups reduce Welch's F* to the
    squared Welch t (F* = t², hand-checked).

    Scale: one hash agg to groups (k rows), then k-row algebra; the
    cheapest test envelope, variance-robust."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = e.select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    )
    g = (
        x.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v") * F.col("v")).alias("q"),
        )
        .filter(F.col("n") >= 2)
    )
    sd, nd = F.col("s").cast("double"), F.col("n")
    m = g.select(
        "grp",
        "n",
        (sd / nd).alias("mean"),
        (
            (F.col("q").cast("double") - sd * (sd / nd)) / (nd - 1)
        ).alias("var"),
    )
    w = m.filter(F.col("var") > 0).select(
        "grp", "n", "mean", (F.col("n") / F.col("var")).alias("wj")
    )
    tot = w.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("wj").alias("sw"),
        F.sum(F.col("wj") * F.col("mean")).alias("swm"),
    )
    grand = F.col("swm") / F.col("sw")
    lam = w.crossJoin(F.broadcast(tot)).agg(
        F.any_value(F.col("k")).alias("k"),
        F.sum(
            F.col("wj") * (F.col("mean") - grand) * (F.col("mean") - grand)
        ).alias("num_ss"),
        F.sum(
            (1 - F.col("wj") / F.col("sw"))
            * (1 - F.col("wj") / F.col("sw"))
            / (F.col("n") - 1)
        ).alias("lam_raw"),
    )
    kd = F.col("k").cast("double")
    return lam.select(
        bi(F.col("k")).alias("k"),
        r6(
            F.col("num_ss")
            / (F.col("k") - 1)
            / (
                1
                + 2.0 * (F.col("k") - 2) / (kd * F.col("k") - 1)
                * F.col("lam_raw")
            )
        ).alias("f_star"),
        r6((kd * F.col("k") - 1) / (3.0 * F.col("lam_raw"))).alias("df2"),
    )


_DELTA_REL = 0.05  # equivalence margin: ±5% of the pooled mean


@query(
    "stats_tost_equivalence",
    oracle=f"""
    WITH per AS (
      SELECT user_id, (user_id % 2 = 0) AS arm,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS v
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    g AS (
      SELECT arm, count(*) AS n, sum(v) AS s, sum(v * v) AS q
      FROM per GROUP BY arm
    ),
    m AS (
      SELECT arm, n, CAST(s AS DOUBLE) / n AS mean,
             (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * (CAST(s AS DOUBLE) / n))
               / (n - 1) / n AS var_mean
      FROM g
    ),
    duo AS (
      SELECT max(CASE WHEN arm THEN mean END) AS m1,
             max(CASE WHEN NOT arm THEN mean END) AS m0,
             max(CASE WHEN arm THEN var_mean END) AS v1,
             max(CASE WHEN NOT arm THEN var_mean END) AS v0,
             max(CASE WHEN arm THEN n END) AS n1,
             max(CASE WHEN NOT arm THEN n END) AS n0
      FROM m
    )
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treat,
           round((m1 - m0) / 100, 6) AS diff_dollars,
           round({_DELTA_REL} * ((m0 + m1) / 2) / 100, 6) AS margin_dollars,
           round(((m1 - m0) + {_DELTA_REL} * ((m0 + m1) / 2))
                 / sqrt(v0 + v1), 6) AS z_lower,
           round(({_DELTA_REL} * ((m0 + m1) / 2) - (m1 - m0))
                 / sqrt(v0 + v1), 6) AS z_upper,
           (((m1 - m0) + {_DELTA_REL} * ((m0 + m1) / 2))
              / sqrt(v0 + v1) > 1.6448536269514722
            AND ({_DELTA_REL} * ((m0 + m1) / 2) - (m1 - m0))
              / sqrt(v0 + v1) > 1.6448536269514722) AS equivalent
    FROM duo
    """,
)
def stats_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence on per-user spend between the even/odd-user
    arms (the standing synthetic A/B split): Δ = m₁−m₀ against a ±5%
    relative margin δ, z_lower = (Δ+δ)/se and z_upper = (δ−Δ)/se with
    the Welch se from exact integer sums, equivalence iff BOTH one-sided
    z's clear z₀.₀₅ = 1.6448536… — the non-inferiority verdict a plain
    t-test's non-significance can never license. Planted pins: identical
    arms are equivalent; a shifted arm (shift > δ) is not.

    Scale: one per-user agg + a 2-row arm fold — the events_ab_ttest
    envelope with the opposite hypothesis structure."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("v")
    ).select("user_id", (F.col("user_id") % 2 == 0).alias("arm"), "v")
    g = per.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    sd, nd = F.col("s").cast("double"), F.col("n")
    m = g.select(
        "arm",
        "n",
        (sd / nd).alias("mean"),
        (
            (F.col("q").cast("double") - sd * (sd / nd))
            / (nd - 1)
            / nd
        ).alias("var_mean"),
    )
    duo = m.agg(
        F.max(F.when(F.col("arm"), F.col("mean"))).alias("m1"),
        F.max(F.when(~F.col("arm"), F.col("mean"))).alias("m0"),
        F.max(F.when(F.col("arm"), F.col("var_mean"))).alias("v1"),
        F.max(F.when(~F.col("arm"), F.col("var_mean"))).alias("v0"),
        F.max(F.when(F.col("arm"), F.col("n"))).alias("n1"),
        F.max(F.when(~F.col("arm"), F.col("n"))).alias("n0"),
    )
    diff = F.col("m1") - F.col("m0")
    delta = _DELTA_REL * ((F.col("m0") + F.col("m1")) / 2)
    se = F.sqrt(F.col("v0") + F.col("v1"))
    zcrit = 1.6448536269514722
    return duo.select(
        bi(F.col("n0")).alias("n_control"),
        bi(F.col("n1")).alias("n_treat"),
        r6(diff / 100).alias("diff_dollars"),
        r6(delta / 100).alias("margin_dollars"),
        r6((diff + delta) / se).alias("z_lower"),
        r6((delta - diff) / se).alias("z_upper"),
        (
            ((diff + delta) / se > zcrit) & ((delta - diff) / se > zcrit)
        ).alias("equivalent"),
    )
