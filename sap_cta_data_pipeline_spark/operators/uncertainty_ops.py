"""§2 round-8 batch DS — uncertainty quantification: multiple-testing
correction (Benjamini–Hochberg FDR), the local-level Kalman filter, and
a deterministic Poisson-bootstrap confidence interval.

Three lanes every metrics platform grows once it runs MANY hypothesis
tests / forecasts at once:

- ``stats_fdr_bh_adjust``: the Benjamini–Hochberg step-up procedure —
  rank p-values ascending, adj_i = min_{j>=i}(p_j * n / j) capped at 1,
  flag discoveries at q = 0.10. The p-value column is a DETERMINISTIC
  FIXTURE derived from group key sums (documented below); the operator
  under test is the adjustment machinery (dense windows), which is what
  a platform applies to p-values produced by the χ²/ANOVA/MW lanes.
- ``ts_kalman_local_level``: the local-level (random-walk-plus-noise)
  Kalman filter per order-priority monthly revenue — the recursive
  least-squares smoother under Holt's lane; gain k = p/(p+R),
  l' = l + k(y−l), p' = (1−k)p + Q. Pure rational arithmetic (no
  transcendentals), so the fold is bit-identical across engines.
- ``stats_bootstrap_ci_poisson``: Poisson(1) bootstrap of the mean —
  the bootstrap that WORKS distributed: instead of resampling n rows
  with replacement (needs global coordination), each row draws an
  i.i.d. Poisson(1) weight per replicate (Chamandy et al.'s "Estimating
  uncertainty for massive data streams", the production pattern).
  Weights come from an inverse-CDF lookup on a Knuth-hash uniform, so
  both engines draw the SAME resamples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_KNUTH = 2654435761  # Knuth multiplicative-hash constant (2^32 / φ)
_M32 = 4294967296

#: Kalman local-level noise parameters (observation R, process Q) and
#: the diffuse initial state variance.
_KF_R, _KF_Q, _KF_P0 = 1.0e8, 1.0e7, 1.0e12

#: Cumulative Poisson(1) CDF at k = 0..7 — double literals shared by
#: both engines; a uniform u maps to the smallest k with u < cdf[k]
#: (k = 8 beyond the last threshold; P(K > 8) ≈ 1e-5).
_POIS1_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.9999167588507119",
    "0.9999897508033253",
)

#: Bootstrap replicate count.
_B = 32


@query(
    "stats_fdr_bh_adjust",
    oracle=f"""
    WITH tests AS (
      SELECT c_nationkey AS nation, o_orderpriority AS priority,
             (((sum((o_orderkey * {_KNUTH}) % {_M32}) % 1000000)
               + 1000000) % 1000000) / 1000000.0 AS p
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT nation, priority, p,
             row_number() OVER (ORDER BY p, nation, priority) AS rk,
             count(*) OVER () AS n
      FROM tests
    ), stepped AS (
      SELECT nation, priority, p, rk, n,
             min(p * n / rk) OVER (ORDER BY rk DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS adj_raw
      FROM ranked
    )
    SELECT nation, priority, round(p, 6) AS p_value,
           CAST(rk AS BIGINT) AS rk,
           round(least(adj_raw, 1.0), 6) AS p_adjusted,
           least(adj_raw, 1.0) <= 0.10 AS discovery
    FROM stepped
    """,
)
def stats_fdr_bh_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR adjustment over a (nation × priority)
    battery of tests: rank p ascending (ties broken by the test key —
    deterministic), adjusted_i = min over j ≥ i of p_j·n/j capped at 1
    (the step-up running min, computed as a reversed-order cumulative
    min window), discovery = adjusted ≤ q = 0.10. The per-test p-value
    is a deterministic FIXTURE — the Knuth hash of each group's key sum
    scaled to [0,1) — so both engines adjust the same battery; in
    production the input is the p column of the χ²/ANOVA/MW lanes.

    Scale: one aggregation builds the battery (tests, not rows — 125
    groups here, thousands at most in practice); the BH windows run
    over the BATTERY, which is metadata-sized by construction. The
    global ORDER BY rk window is a deliberate single-partition stage
    over n_tests rows, the same bounded class as every battery-grain
    window (documented; the single-partition audit classifies it)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    tests = (
        o.join(c.select("c_custkey", "c_nationkey"), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            (
                F.pmod(
                    F.sum(F.pmod(F.col("o_orderkey") * _KNUTH, F.lit(_M32))),
                    F.lit(1000000),
                )
                / 1000000.0
            ).alias("p")
        )
    )
    wrank = Window.orderBy("p", "nation", "priority")
    wall = Window.partitionBy()
    ranked = tests.select(
        "nation",
        "priority",
        "p",
        F.row_number().over(wrank).alias("rk"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    wdesc = Window.orderBy(F.col("rk").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = ranked.select(
        "nation",
        "priority",
        "p",
        "rk",
        F.min(F.col("p") * F.col("n") / F.col("rk")).over(wdesc).alias("adj_raw"),
    )
    adj = F.least(F.col("adj_raw"), F.lit(1.0))
    return stepped.select(
        "nation",
        "priority",
        r6(F.col("p")).alias("p_value"),
        bi(F.col("rk")).alias("rk"),
        r6(adj).alias("p_adjusted"),
        (adj <= 0.10).alias("discovery"),
    )


@query(
    "ts_kalman_local_level",
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
      FROM m GROUP BY priority HAVING count(*) >= 2
    ), folded AS (
      SELECT priority, len(vals) AS n,
             list_reduce(
               list_concat(
                 [[vals[1], {_KF_P0}e0]],
                 list_transform(vals[2:len(vals)], x -> [x, 0e0])),
               (acc, x) -> [
                 acc[1] + (acc[2] / (acc[2] + {_KF_R}e0)) * (x[1] - acc[1]),
                 (1 - acc[2] / (acc[2] + {_KF_R}e0)) * acc[2] + {_KF_Q}e0
               ]) AS st
      FROM s
    )
    SELECT priority,
           CAST(n AS BIGINT)                              AS n_months,
           round(st[1], 6)                                AS level,
           round(st[2], 6)                                AS p_var,
           round(st[2] / (st[2] + {_KF_R}e0), 6)          AS gain_next
    FROM folded
    """,
)
def ts_kalman_local_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level Kalman filter per order-priority monthly revenue:
    y_t = l_t + ε (var R), l_t = l_{t−1} + η (var Q). Filter step:
    k = p/(p+R); l ← l + k(y−l); p ← (1−k)p + Q. Init l₀ = first
    observation, p₀ diffuse (1e12). Emits the filtered level, its
    posterior variance, and the next-step gain (which converges to the
    steady-state (√(Q²+4QR)−Q)/2R root — the test pins convergence).
    Pure rational arithmetic (one division per step, no
    transcendentals), state expressions reference only the PRE-step
    accumulator, so both engines run the identical IEEE sequence —
    the §5.3 fold discipline inherited from ts_holt_linear.

    Scale: the only corpus shuffle is the month aggregation (exact
    integer cents, order-proof); the filter is an in-row O(1)-state
    fold at any series length."""
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
            F.transform(arr, lambda x: x["rev_c"].cast("double") / 100).alias(
                "vals"
            )
        )
        .filter(F.size("vals") >= 2)
    )
    rr, qq = F.lit(_KF_R), F.lit(_KF_Q)

    def _step(acc, y):
        l, p = F.element_at(acc, 1), F.element_at(acc, 2)
        return F.array(
            l + (p / (p + rr)) * (y - l),
            (F.lit(1) - p / (p + rr)) * p + qq,
        )

    st0 = F.array(F.element_at("vals", 1), F.lit(_KF_P0))
    folded = s.withColumn(
        "st",
        F.aggregate(
            F.slice("vals", 2, F.size("vals") - 1), st0, _step
        ),
    )
    pvar = F.element_at("st", 2)
    return folded.select(
        "priority",
        bi(F.size("vals")).alias("n_months"),
        r6(F.element_at("st", 1)).alias("level"),
        r6(pvar).alias("p_var"),
        r6(pvar / (pvar + rr)).alias("gain_next"),
    )


def _pois_weight_sql(u: str) -> str:
    """Inverse-CDF CASE expression mapping uniform ``u`` to a Poisson(1)
    draw via the shared literal thresholds."""
    arms = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS1_CDF)
    )
    return f"CASE {arms} ELSE 8 END"


@query(
    "stats_bootstrap_ci_poisson",
    oracle=f"""
    WITH drawn AS (
      SELECT o_orderpriority AS priority, b.b AS b, o_totalprice AS y,
             {_pois_weight_sql(
                 f"((((o_orderkey + b.b * 1000003) * {_KNUTH}) % {_M32})"
                 f" + {_M32}) % {_M32} / {_M32}.0"
             )} AS w
      FROM orders, (SELECT unnest(range(0, {_B})) AS b) b
    ), reps AS (
      SELECT priority, b,
             sum(w * y) / sum(w) AS mean_b
      FROM drawn GROUP BY 1, 2 HAVING sum(w) > 0
    ), ranked AS (
      SELECT priority, mean_b,
             row_number() OVER (PARTITION BY priority
                                ORDER BY mean_b, b) AS rk,
             count(*) OVER (PARTITION BY priority) AS nb
      FROM reps
    ), base AS (
      SELECT o_orderpriority AS priority, avg(o_totalprice) AS obs_mean
      FROM orders GROUP BY 1
    )
    SELECT r.priority,
           round(b2.obs_mean, 6) AS obs_mean,
           round(avg(r.mean_b), 6) AS boot_mean,
           round(stddev_samp(r.mean_b), 6) AS boot_se,
           round(max(CASE WHEN r.rk = 2 THEN r.mean_b END), 6) AS ci_lo,
           round(max(CASE WHEN r.rk = r.nb - 1 THEN r.mean_b END), 6)
               AS ci_hi
    FROM ranked r JOIN base b2 ON r.priority = b2.priority
    GROUP BY r.priority, b2.obs_mean
    """,
)
def stats_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson(1) bootstrap CI for mean(o_totalprice) per order
    priority, B = 32 replicates: every (row, replicate) pair draws a
    Poisson(1) weight by inverse-CDF lookup on a Knuth-hash uniform of
    (o_orderkey, b) — deterministic, engine-portable, and i.i.d.-like
    across rows, which is exactly why the Poisson bootstrap replaces
    multinomial resampling at scale (no global n needed, every row
    decides its own weights locally). Reports the observed mean, the
    bootstrap mean/SE, and the order-statistic CI (2nd and 31st of the
    32 replicate means ≈ 94% coverage).

    Scale: the B× explode is MAP-SIDE only — partial aggregation
    collapses to (priority × B) partial sums before the one shuffle,
    so the exchange carries groups·B rows regardless of table size.
    Replicate ranking is per-priority over B rows (metadata-sized)."""
    o = t(spark, sf_dir, "orders")
    drawn = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
        F.col("o_totalprice").alias("y"),
        F.col("o_orderkey").alias("k"),
    )
    u = (
        F.pmod(
            (F.col("k") + F.col("b") * 1000003) * _KNUTH, F.lit(_M32)
        ).cast("double")
        / F.lit(float(_M32))
    )
    w = F.lit(8)
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < float(_POIS1_CDF[k]), k).otherwise(w)
    drawn = drawn.withColumn("w", w)
    reps = (
        drawn.groupBy("priority", "b")
        .agg(
            F.sum(F.col("w") * F.col("y")).alias("wy"),
            F.sum("w").alias("ws"),
        )
        .filter(F.col("ws") > 0)
        .select("priority", "b", (F.col("wy") / F.col("ws")).alias("mean_b"))
    )
    wrk = Window.partitionBy("priority").orderBy("mean_b", "b")
    wnb = Window.partitionBy("priority")
    ranked = reps.select(
        "priority",
        "mean_b",
        F.row_number().over(wrk).alias("rk"),
        F.count(F.lit(1)).over(wnb).alias("nb"),
    )
    base = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.avg("o_totalprice").alias("obs_mean")
    )
    return (
        ranked.join(base, "priority")
        .groupBy("priority", "obs_mean")
        .agg(
            r6(F.avg("mean_b")).alias("boot_mean"),
            r6(F.stddev_samp("mean_b")).alias("boot_se"),
            r6(
                F.max(F.when(F.col("rk") == 2, F.col("mean_b")))
            ).alias("ci_lo"),
            r6(
                F.max(
                    F.when(F.col("rk") == F.col("nb") - 1, F.col("mean_b"))
                )
            ).alias("ci_hi"),
        )
        .select(
            "priority",
            r6(F.col("obs_mean")).alias("obs_mean"),
            "boot_mean",
            "boot_se",
            "ci_lo",
            "ci_hi",
        )
    )
