"""§2 round-9 batch EV — robust/classical test depth: Brown–Forsythe
homogeneity of variance, Cohen's d / Hedges' g effect sizes, the
Jarque–Bera normality test, and Cramér's V association strength.

Design rule shared by all four lanes (the SURVEY §5.3 rationals-on-
boundaries discipline): every statistic is assembled from INTEGER
sufficient statistics (counts, integer sums, integer sums of squares /
power sums) so both engines perform the final double arithmetic on
bit-identical operands — float summation order never differs because
floats are never summed across rows. Where a square-sum can exceed
int64 (Brown–Forsythe's Σz², cents-scaled), the Spark side sums as
DECIMAL(38,0) and DuckDB's native HUGEINT sum matches exactly; both
convert once to double. `pow(x, 1.5)` is avoided in favor of
`x * sqrt(x)` (sqrt is IEEE-exact; fractional pow is libm-dependent).

Scale notes (SCALE.md batch EV): every lane is one keyed fact-grain
aggregation (groups / arms / users / cells) followed by a k-row
combine — the sufficient-statistic shape that makes classical tests
free at 100 TB; nothing is quadratic, nothing iterates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "stats_levene_brown_forsythe",
    oracle="""
    WITH x AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    ), med AS (
      SELECT grp, CAST(2 * median(cents) AS BIGINT) AS med2
      FROM x GROUP BY grp
    ), z AS (
      SELECT x.grp, abs(2 * x.cents - med.med2) AS z2
      FROM x JOIN med USING (grp)
    ), g AS (
      SELECT grp, count(*) AS n, sum(z2) AS s,
             CAST(sum(z2 * z2) AS DOUBLE) AS q
      FROM z GROUP BY grp
    ), tot AS (
      SELECT count(*) AS k, sum(n) AS n_total, sum(s) AS s_total,
             sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sum_sj2_nj,
             sum(q - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS ssw
      FROM g
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(n_total AS BIGINT) AS n_total,
           round(((CAST(n_total AS DOUBLE) - k) / (k - 1))
                 * (sum_sj2_nj
                    - CAST(s_total AS DOUBLE) * CAST(s_total AS DOUBLE) / n_total)
                 / ssw, 6) AS w_stat
    FROM tot
    """,
)
def stats_levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (Levene with group MEDIANS — the robust
    variant) of order-value variance homogeneity across order
    priorities: z_ij = |x_ij − med_j|, W = ((N−k)/(k−1)) · SSB(z) /
    SSW(z). The deviations are kept EXACT integers by working in
    doubled cents (2·median of integers is always an integer, odd or
    even n), so the group sufficient statistics (n, Σz, Σz²) are
    integer-exact in both engines; Σz² sums as DECIMAL(38,0)
    Spark-side / HUGEINT DuckDB-side (it can exceed int64). W is
    scale-invariant, so the doubling cancels.

    Scale: one fact-grain groupBy for the medians, one for the z
    sufficient stats (both on the SAME 5-group key — the second reuses
    the shuffle), then a 5-row combine. The classical gatekeeper before
    trusting a pooled-variance ANOVA, priced at two scans."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    med = x.groupBy("grp").agg(
        (2 * F.median("cents")).cast("long").alias("med2")
    )
    z = x.join(med, "grp").select(
        "grp", F.abs(2 * F.col("cents") - F.col("med2")).alias("z2")
    )
    g = z.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z2").alias("s"),
        F.sum((F.col("z2") * F.col("z2")).cast("decimal(38,0)"))
        .cast("double")
        .alias("q"),
    )
    sd = F.col("s").cast("double")
    tot = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_total"),
        F.sum("s").alias("s_total"),
        F.sum(sd * sd / F.col("n")).alias("sum_sj2_nj"),
        F.sum(F.col("q") - sd * sd / F.col("n")).alias("ssw"),
    )
    ntd = F.col("n_total").cast("double")
    std = F.col("s_total").cast("double")
    return tot.select(
        bi(F.col("k")).alias("k"),
        bi(F.col("n_total")).alias("n_total"),
        r6(
            ((ntd - F.col("k")) / (F.col("k") - 1))
            * (F.col("sum_sj2_nj") - std * std / F.col("n_total"))
            / F.col("ssw")
        ).alias("w_stat"),
    )


@query(
    "stats_cohens_d",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS arm, count(*) AS c
      FROM events GROUP BY user_id
    ), a AS (
      SELECT arm, count(*) AS n, sum(c) AS s, sum(c * c) AS q
      FROM u GROUP BY arm
    ), w AS (
      SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
             max(CASE WHEN arm = 1 THEN n END) AS n1,
             max(CASE WHEN arm = 0 THEN CAST(s AS DOUBLE) / n END) AS m0,
             max(CASE WHEN arm = 1 THEN CAST(s AS DOUBLE) / n END) AS m1,
             max(CASE WHEN arm = 0 THEN
                 CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
                 END) AS ss0,
             max(CASE WHEN arm = 1 THEN
                 CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n
                 END) AS ss1
      FROM a
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           round(m0, 6) AS mean0, round(m1, 6) AS mean1,
           round((m1 - m0) / sqrt((ss0 + ss1) / (n0 + n1 - 2)), 6) AS cohens_d,
           round(((m1 - m0) / sqrt((ss0 + ss1) / (n0 + n1 - 2)))
                 * (1 - 3.0 / (4 * (n0 + n1) - 9)), 6) AS hedges_g
    FROM w
    """,
)
def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and Hedges' g (the small-sample-corrected d) for
    per-user activity between the two experiment arms — the EFFECT SIZE
    the t-test lane (events_ab_ttest) deliberately doesn't report:
    significance says an effect exists, d says whether anyone should
    care. Pooled SD from integer per-arm sufficient statistics (n, Σc,
    Σc²); g = d·(1 − 3/(4N−9)).

    Scale: one user-grain aggregation (the only corpus shuffle), a
    2-row arm aggregate, a 1-row fold."""
    e = t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).select(
        (F.col("user_id") % 2).cast("int").alias("arm"), "c"
    )
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    w = a.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, sd / F.col("n"))).alias("m0"),
        F.max(F.when(F.col("arm") == 1, sd / F.col("n"))).alias("m1"),
        F.max(F.when(F.col("arm") == 0, qd - sd * sd / F.col("n"))).alias("ss0"),
        F.max(F.when(F.col("arm") == 1, qd - sd * sd / F.col("n"))).alias("ss1"),
    )
    d = (F.col("m1") - F.col("m0")) / F.sqrt(
        (F.col("ss0") + F.col("ss1")) / (F.col("n0") + F.col("n1") - 2)
    )
    return w.select(
        bi(F.col("n0")).alias("n0"),
        bi(F.col("n1")).alias("n1"),
        r6(F.col("m0")).alias("mean0"),
        r6(F.col("m1")).alias("mean1"),
        r6(d).alias("cohens_d"),
        r6(d * (1 - 3.0 / (4 * (F.col("n0") + F.col("n1")) - 9))).alias(
            "hedges_g"
        ),
    )


@query(
    "stats_jarque_bera",
    oracle="""
    WITH p AS (
      SELECT count(*) AS n,
             sum(x) AS s1, sum(x * x) AS s2,
             sum(x * x * x) AS s3, sum(x * x * x * x) AS s4
      FROM (SELECT CAST(l_quantity AS BIGINT) AS x FROM lineitem)
    ), m AS (
      SELECT n,
             CAST(s1 AS DOUBLE) / n AS m1,
             CAST(s2 AS DOUBLE) / n AS r2_,
             CAST(s3 AS DOUBLE) / n AS r3_,
             CAST(s4 AS DOUBLE) / n AS r4_
      FROM p
    ), c AS (
      SELECT n, m1,
             r2_ - m1 * m1 AS m2,
             r3_ - 3 * m1 * r2_ + 2 * m1 * m1 * m1 AS m3,
             r4_ - 4 * m1 * r3_ + 6 * m1 * m1 * r2_ - 3 * m1 * m1 * m1 * m1 AS m4
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
           round(m4 / (m2 * m2) - 3, 6) AS kurtosis_excess,
           round((n / 6.0) * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                 + ((m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3)) / 4), 6) AS jb_stat
    FROM c
    """,
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test on order quantities: JB = n/6 ·
    (S² + K²/4) from sample skewness S and excess kurtosis K, both
    assembled from INTEGER power sums (Σx..Σx⁴ of small-int quantities —
    exact int64 to beyond sf1 scale) so the central-moment doubles are
    bit-identical in both engines; m2^1.5 is computed as m2·sqrt(m2),
    never fractional pow (libm-dependent last ulp).

    Scale: ONE distributed aggregation producing five integers — the
    sufficient-statistic normality check at any volume; the same five
    integers are mergeable across partitions/days for incremental
    monitoring (agg_incremental_merge's contract)."""
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    p = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    rr2 = F.col("s2").cast("double") / nd
    rr3 = F.col("s3").cast("double") / nd
    rr4 = F.col("s4").cast("double") / nd
    m = p.select(
        F.col("n"), m1.alias("m1"), rr2.alias("r2_"), rr3.alias("r3_"), rr4.alias("r4_")
    )
    m1c = F.col("m1")
    c = m.select(
        "n",
        "m1",
        (F.col("r2_") - m1c * m1c).alias("m2"),
        (F.col("r3_") - 3 * m1c * F.col("r2_") + 2 * m1c * m1c * m1c).alias("m3"),
        (
            F.col("r4_")
            - 4 * m1c * F.col("r3_")
            + 6 * m1c * m1c * F.col("r2_")
            - 3 * m1c * m1c * m1c * m1c
        ).alias("m4"),
    )
    skew = F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))
    kurt = F.col("m4") / (F.col("m2") * F.col("m2")) - 3
    return c.select(
        bi(F.col("n")).alias("n"),
        r6(skew).alias("skewness"),
        r6(kurt).alias("kurtosis_excess"),
        r6((F.col("n") / F.lit(6.0)) * (skew * skew + (kurt * kurt) / 4)).alias(
            "jb_stat"
        ),
    )


@query(
    "stats_cramers_v",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS r, o_orderstatus AS c,
             count(*) * 1.0 AS obs
      FROM orders GROUP BY 1, 2
    ), marg AS (
      SELECT r, c, obs,
             sum(obs) OVER (PARTITION BY r) AS row_tot,
             sum(obs) OVER (PARTITION BY c) AS col_tot,
             sum(obs) OVER () AS grand
      FROM cells
    ), agg AS (
      SELECT CAST(count(DISTINCT r) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT c) AS BIGINT) AS n_cols,
             max(grand) AS grand,
             sum(pow(obs - row_tot * col_tot / grand, 2)
                 / (row_tot * col_tot / grand)) AS chi2
      FROM marg
    )
    SELECT n_rows, n_cols,
           round(chi2, 6) AS chi2,
           round(sqrt(chi2 / (grand * least(n_rows - 1, n_cols - 1))), 6)
             AS cramers_v
    FROM agg
    """,
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0,1]-normalized strength of the χ² association
    between order priority and order status, the number that makes χ²
    comparable across table shapes and sample sizes (χ² alone grows with
    N even for a fixed weak association): V = sqrt(χ² / (N·min(r−1,
    c−1))). Same cells-then-marginal-windows shape as
    stats_chi2_independence (≤5×3 cells — metadata-sized, §R class-3
    types² frames).

    Scale: one hash aggregation to the contingency cells; everything
    after runs on ≤15 rows."""
    o = t(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("r"), F.col("o_orderstatus").alias("c")
    ).agg(F.count(F.lit(1)).cast("double").alias("obs"))
    wrow = Window.partitionBy("r")
    wcol = Window.partitionBy("c")
    wall = Window.partitionBy()
    marg = cells.select(
        "r",
        "c",
        "obs",
        F.sum("obs").over(wrow).alias("row_tot"),
        F.sum("obs").over(wcol).alias("col_tot"),
        F.sum("obs").over(wall).alias("grand"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("grand")
    agg = marg.agg(
        bi(F.countDistinct("r")).alias("n_rows"),
        bi(F.countDistinct("c")).alias("n_cols"),
        F.max("grand").alias("grand"),
        F.sum(F.pow(F.col("obs") - exp, 2) / exp).alias("chi2"),
    )
    return agg.select(
        "n_rows",
        "n_cols",
        r6(F.col("chi2")).alias("chi2"),
        r6(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("grand")
                    * F.least(F.col("n_rows") - 1, F.col("n_cols") - 1)
                )
            )
        ).alias("cramers_v"),
    )
