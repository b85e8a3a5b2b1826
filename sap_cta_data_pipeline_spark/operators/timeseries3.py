"""§2 round-8 batch DQ — forecasting depth: Holt-Winters additive
(level + trend + seasonality) and the Theil–Sen robust trend estimator.

Completes the exponential-smoothing ladder (ts_ewma_fold -> one state,
ts_holt_linear -> two states) with the THREE-component additive
Holt-Winters recurrence every seasonal-forecast user reaches for next,
and adds the robust (median-of-slopes) trend twin to the OLS lane
(ml_ols_two_feature): Theil–Sen tolerates ~29% outliers where least
squares breaks on one.

Engine-parity disciplines (SURVEY §5.3), both inherited from
ts_holt_linear: pre-fold monthly sums are EXACT INTEGER CENTS
(summation-order-proof — distributed partial aggregation and DuckDB's
sequential sum agree bit-for-bit on integers); the seasonal fold carries
its state as a LIST accumulator whose construction evaluates every
element against the PRE-step accumulator on both engines, with the new
level's expression textually duplicated inside the trend and seasonal
updates (list/struct fields cannot reference siblings mid-construction)
so both engines execute literally the same IEEE operation sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

#: Holt-Winters smoothing constants (level, trend, seasonal) and period.
_HW_A, _HW_B, _HW_G, _HW_M = 0.3, 0.1, 0.2, 12


@query(
    "ts_holt_winters_additive",
    oracle=f"""
    WITH m AS (
      SELECT o_orderpriority AS priority,
             date_trunc('month', o_orderdate) AS month,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                 AS rev_c
      FROM orders GROUP BY 1, 2
    ), s AS (
      SELECT priority,
             list(CAST(rev_c AS DOUBLE) / 100 ORDER BY month) AS vals
      FROM m GROUP BY priority HAVING count(*) >= {_HW_M} + 2
    ), ini AS (
      SELECT priority, vals, len(vals) AS n,
             list_reduce(vals[1:{_HW_M}], (a, x) -> a + x) / {_HW_M} AS l0
      FROM s
    ), ini2 AS (
      SELECT priority, vals, n,
             list_concat([l0, 0e0],
                         list_transform(vals[1:{_HW_M}], x -> x - l0)) AS st0
      FROM ini
    ), folded AS (
      SELECT priority, n,
             list_reduce(
               list_concat(
                 [st0],
                 list_transform(
                   vals[{_HW_M} + 1:n],
                   x -> [x, 0e0, 0e0, 0e0, 0e0, 0e0, 0e0,
                         0e0, 0e0, 0e0, 0e0, 0e0, 0e0, 0e0])),
               (acc, x) -> list_concat(list_concat(
                 [{_HW_A}e0 * (x[1] - acc[3])
                      + (1 - {_HW_A}e0) * (acc[1] + acc[2]),
                  {_HW_B}e0 * (({_HW_A}e0 * (x[1] - acc[3])
                      + (1 - {_HW_A}e0) * (acc[1] + acc[2])) - acc[1])
                      + (1 - {_HW_B}e0) * acc[2]],
                 acc[4:{_HW_M} + 2]),
                 [{_HW_G}e0 * (x[1] - ({_HW_A}e0 * (x[1] - acc[3])
                      + (1 - {_HW_A}e0) * (acc[1] + acc[2])))
                      + (1 - {_HW_G}e0) * acc[3]])) AS st
      FROM ini2
    )
    SELECT priority,
           CAST(n AS BIGINT)                  AS n_months,
           round(st[1], 6)                    AS level,
           round(st[2], 6)                    AS trend,
           round(st[3], 6)                    AS season_next,
           round(st[1] + st[2] + st[3], 6)    AS forecast_1
    FROM folded
    """,
)
def ts_holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters per order-priority monthly revenue series:
    l_t = α(y_t − s_{{t−m}}) + (1−α)(l_{{t−1}} + b_{{t−1}}),
    b_t = β(l_t − l_{{t−1}}) + (1−β)b_{{t−1}},
    s_t = γ(y_t − l_t) + (1−γ)s_{{t−m}}, m = 12, over the OBSERVED month
    sequence (missing months contract the sequence — documented
    semantics, deterministic on both engines). Init is the standard
    first-season scheme: l₀ = mean of the first m values, b₀ = 0,
    sᵢ = yᵢ − l₀; the fold runs from element m+1 with a 14-double list
    state [l, b, s₁..s₁₂] that ROTATES one seasonal slot per step.
    The one-step-ahead forecast l + b + s_next is the lane's point.

    Scale: the only corpus shuffle is the month aggregation; series
    fold is in-row with O(m) state regardless of length, and the
    per-series row count is months — driver-sized for a century."""
    o = t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", "o_orderdate").alias("month"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("rev_c")
    )
    arr = F.array_sort(F.collect_list(F.struct("month", "rev_c")))
    s = (
        m.groupBy("priority")
        .agg(
            F.transform(
                arr, lambda x: x["rev_c"].cast("double") / 100
            ).alias("vals")
        )
        .filter(F.size("vals") >= _HW_M + 2)
    )
    a, b, g, mm = F.lit(_HW_A), F.lit(_HW_B), F.lit(_HW_G), _HW_M
    one = F.lit(1)
    ini = s.withColumn(
        "l0",
        F.aggregate(
            F.slice("vals", 2, mm - 1),
            F.element_at("vals", 1),
            lambda acc, x: acc + x,
        )
        / F.lit(mm),
    ).withColumn(
        "st0",
        F.concat(
            F.array(F.col("l0"), F.lit(0.0)),
            F.transform(F.slice("vals", 1, mm), lambda x: x - F.col("l0")),
        ),
    )

    def _step(acc, y):
        # new level, textually duplicated below (sibling refs impossible
        # mid-construction — the §5.3 IEEE-sequence discipline)
        lv = a * (y - F.element_at(acc, 3)) + (one - a) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        lv_dup_b = a * (y - F.element_at(acc, 3)) + (one - a) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        lv_dup_s = a * (y - F.element_at(acc, 3)) + (one - a) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        tr = b * (lv_dup_b - F.element_at(acc, 1)) + (one - b) * F.element_at(acc, 2)
        se = g * (y - lv_dup_s) + (one - g) * F.element_at(acc, 3)
        return F.concat(F.array(lv, tr), F.slice(acc, 4, mm - 1), F.array(se))

    folded = ini.withColumn(
        "st",
        F.aggregate(
            F.slice("vals", mm + 1, F.size("vals") - mm), F.col("st0"), _step
        ),
    )
    return folded.select(
        "priority",
        bi(F.size("vals")).alias("n_months"),
        r6(F.element_at("st", 1)).alias("level"),
        r6(F.element_at("st", 2)).alias("trend"),
        r6(F.element_at("st", 3)).alias("season_next"),
        r6(
            F.element_at("st", 1) + F.element_at("st", 2) + F.element_at("st", 3)
        ).alias("forecast_1"),
    )


@query(
    "stats_theilsen_trend",
    oracle="""
    WITH m AS (
      SELECT c_nationkey AS nation,
             CAST(date_part('year', o_orderdate) * 12
                  + date_part('month', o_orderdate) AS BIGINT) AS t,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                 AS rev_c
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), slopes AS (
      SELECT a.nation,
             (CAST(b.rev_c AS DOUBLE) - CAST(a.rev_c AS DOUBLE))
                 / (b.t - a.t) / 100 AS slope
      FROM m a JOIN m b ON a.nation = b.nation AND a.t < b.t
    ), med AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS n_pairs,
             median(slope) AS slope_med
      FROM slopes GROUP BY nation
    ), icept AS (
      SELECT m.nation,
             median(CAST(m.rev_c AS DOUBLE) / 100 - med.slope_med * m.t)
                 AS icept_med
      FROM m JOIN med ON m.nation = med.nation
      GROUP BY m.nation
    )
    SELECT med.nation, med.n_pairs,
           round(med.slope_med, 6) AS slope,
           round(icept.icept_med, 6) AS intercept
    FROM med JOIN icept ON med.nation = icept.nation
    """,
)
def stats_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per customer-nation monthly revenue:
    slope = MEDIAN over all month pairs (t₁ < t₂) of
    (y₂ − y₁)/(t₂ − t₁), intercept = median(yᵢ − slope·tᵢ) — the
    estimator that shrugs off up to ~29% outlier months where the OLS
    lane's fit is dragged by one bad month. Slope operands are exact
    integer cents and month indices, so the pairwise divisions are
    engine-identical IEEE doubles; medians interpolate identically
    (Spark median == DuckDB quantile_cont 0.5).

    Scale: the pair closure is SELF-JOIN ON GROUP at MONTH grain — a
    deliberate bounded closure (n months per group; 1200 months of
    history → ~720k pairs/group, distributed fine), the same eval-scale
    class as the recall-eval lanes. Day-grain or per-user series must
    route to ml_ols_two_feature / ts_holt_linear instead; a median of
    O(n²) slopes has no sublinear exact form (Matoušek's randomized
    selection exists but is not worth the determinism loss here)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    m = (
        o.join(c.select("c_custkey", "c_nationkey"), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("t"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "rev_c"
            )
        )
    )
    a = m.alias("a")
    b = m.alias("b")
    slopes = a.join(
        b,
        (F.col("a.nation") == F.col("b.nation")) & (F.col("a.t") < F.col("b.t")),
    ).select(
        F.col("a.nation").alias("nation"),
        (
            (F.col("b.rev_c").cast("double") - F.col("a.rev_c").cast("double"))
            / (F.col("b.t") - F.col("a.t"))
            / 100
        ).alias("slope"),
    )
    med = slopes.groupBy("nation").agg(
        bi(F.count(F.lit(1))).alias("n_pairs"),
        F.median("slope").alias("slope_med"),
    )
    icept = (
        m.join(med.select("nation", "slope_med"), "nation")
        .groupBy("nation")
        .agg(
            F.median(
                F.col("rev_c").cast("double") / 100 - F.col("slope_med") * F.col("t")
            ).alias("icept_med")
        )
    )
    return med.join(icept, "nation").select(
        "nation",
        "n_pairs",
        r6(F.col("slope_med")).alias("slope"),
        r6(F.col("icept_med")).alias("intercept"),
    )
