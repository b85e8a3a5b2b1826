"""§2 round-8 batch EM — panel fixed effects + Haar wavelet energy.

- ``orders_panel_within_estimator``: the two-way fixed-effects (within)
  estimator — the workhorse of panel econometrics: on the
  (nation × month) revenue panel, regress ln(revenue) on ln(orders)
  after double-demeaning (ỹ = y − ȳᵢ − ȳₜ + ȳ), which wipes out nation
  AND month effects without estimating them. β is then a one-pass
  ratio Σỹx̃/Σx̃² — the estimator behind every "controlling for
  country and seasonality" claim. Extends events_did_estimator (2×2)
  to the full panel.
- ``ts_haar_wavelet_energy``: 3-level Haar decomposition of the daily
  revenue series — pairwise (avg, diff)/2 cascades — reported as the
  ENERGY SHARE per detail level + final approximation: which timescale
  (2-day, 4-day, 8-day) carries the variance. The multiresolution
  companion of the Fourier lane (localized vs global basis); pure
  rational arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query
from .timeseries2 import _DAILY_SQL, _daily_series

_LEVELS = 3


@query(
    "orders_panel_within_estimator",
    oracle="""
    WITH panel AS (
      SELECT c_nationkey AS nation,
             CAST(date_part('year', o_orderdate) * 12
                  + date_part('month', o_orderdate) AS BIGINT) AS month,
             ln(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0)
                 AS y,
             ln(count(*) * 1.0) AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    dm AS (
      SELECT y - avg(y) OVER (PARTITION BY nation)
               - avg(y) OVER (PARTITION BY month) + avg(y) OVER () AS yt,
             x - avg(x) OVER (PARTITION BY nation)
               - avg(x) OVER (PARTITION BY month) + avg(x) OVER () AS xt
      FROM panel
    )
    SELECT CAST(count(*) AS BIGINT) AS n_obs,
           round(sum(yt * xt) / sum(xt * xt), 6) AS beta_within,
           round(pow(sum(yt * xt), 2)
                 / (sum(xt * xt) * sum(yt * yt)), 6) AS r2_within
    FROM dm
    """,
)
def orders_panel_within_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way FE elasticity of monthly nation revenue with respect to
    order volume: build the (nation, month) panel with exact-cent
    revenue (then ln — the log-parity discipline), double-demean both
    variables (nation mean, month mean, plus grand mean back), and take
    β = Σỹx̃/Σx̃² with the within-R². Double demeaning is EXACTLY
    equivalent to estimating nation+month dummies (Frisch–Waugh–Lovell)
    at none of the cost; the planted pin certifies that adding a pure
    nation-level or month-level shift leaves β unchanged — the
    invariance the estimator exists for.

    Scale: one corpus aggregation to the panel (nations × months —
    metadata-sized), demeaning via three windows over the panel frame,
    one 1-row final. The two-way within estimator at 100 TB is this
    exact plan with a bigger first aggregation."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    panel = (
        o.join(c.select("c_custkey", "c_nationkey"), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("month"),
        )
        .agg(
            F.log(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                / 100.0
            ).alias("y"),
            F.log(F.count(F.lit(1)) * 1.0).alias("x"),
        )
    )
    wi = Window.partitionBy("nation")
    wt = Window.partitionBy("month")
    wall = Window.partitionBy()
    dm = panel.select(
        (
            F.col("y")
            - F.avg("y").over(wi)
            - F.avg("y").over(wt)
            + F.avg("y").over(wall)
        ).alias("yt"),
        (
            F.col("x")
            - F.avg("x").over(wi)
            - F.avg("x").over(wt)
            + F.avg("x").over(wall)
        ).alias("xt"),
    )
    sxy = F.sum(F.col("yt") * F.col("xt"))
    sxx = F.sum(F.col("xt") * F.col("xt"))
    syy = F.sum(F.col("yt") * F.col("yt"))
    return dm.agg(
        bi(F.count(F.lit(1))).alias("n_obs"),
        r6(sxy / sxx).alias("beta_within"),
        r6(F.pow(sxy, 2) / (sxx * syy)).alias("r2_within"),
    )


def _haar_oracle() -> str:
    ctes = [
        """idx AS (
      SELECT revenue AS a0,
             row_number() OVER (ORDER BY day) - 1 AS i,
             count(*) OVER () AS n
      FROM s
    ),
    trunc0 AS MATERIALIZED (
      SELECT a0 AS a, i FROM idx WHERE i < (n // 8) * 8
    )"""
    ]
    prev = "trunc0"
    for lv in range(1, _LEVELS + 1):
        ctes.append(
            f"""lvl{lv} AS MATERIALIZED (
      SELECT i // 2 AS i,
             (sum(CASE WHEN i % 2 = 0 THEN a ELSE 0 END)
              + sum(CASE WHEN i % 2 = 1 THEN a ELSE 0 END)) / 2 AS a,
             (sum(CASE WHEN i % 2 = 0 THEN a ELSE 0 END)
              - sum(CASE WHEN i % 2 = 1 THEN a ELSE 0 END)) / 2 AS d
      FROM {prev} GROUP BY i // 2
    )"""
        )
        prev = f"lvl{lv}"
    energies = " UNION ALL ".join(
        f"SELECT {lv} AS level, sum(d * d) AS e,"
        f" CAST(count(*) AS BIGINT) AS n_coeffs FROM lvl{lv}"
        for lv in range(1, _LEVELS + 1)
    )
    return (
        _DAILY_SQL
        + ", "
        + ",\n".join(ctes)
        + f""",
    es AS ({energies}
      UNION ALL
      SELECT 0 AS level, sum(a * a) AS e,
             CAST(count(*) AS BIGINT) AS n_coeffs FROM lvl{_LEVELS}),
    tot AS (SELECT sum(e) AS te FROM es)
    SELECT es.level, es.n_coeffs,
           round(es.e / tot.te, 6) AS energy_share
    FROM es CROSS JOIN tot
    """
    )


@query("ts_haar_wavelet_energy", oracle=_haar_oracle())
def ts_haar_wavelet_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-level Haar multiresolution energy of daily revenue: the series
    (truncated to a multiple of 8 days) cascades through pairwise
    (a, d) = ((y₁+y₂)/2, (y₁−y₂)/2); each detail level's Σd² over the
    total (details + final approximation) says which timescale — 2-day
    jitter, 4-day, weekly-ish 8-day, or the slow trend (level 0 =
    approximation) — carries the variance. Parseval-style energy
    accounting (shares sum to 1) and a planted alternating-series pin
    (all energy in level 1) certify the transform. Pure rational
    arithmetic — no transcendentals, unlike the Fourier twin.

    Scale: the series is day-grain after one corpus aggregation; each
    level HALVES the frame (i//2 groupBy) — the whole cascade is
    metadata-sized keyed aggs."""
    s = _daily_series(spark, sf_dir)
    widx = Window.orderBy("day")
    wall = Window.partitionBy()
    idx = s.select(
        F.col("revenue").alias("a"),
        (F.row_number().over(widx) - 1).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    cur = idx.filter(F.col("i") < (F.floor(F.col("n") / 8) * 8)).select("a", "i")
    levels = []
    for lv in range(1, _LEVELS + 1):
        even = F.sum(F.when(F.col("i") % 2 == 0, F.col("a")).otherwise(0.0))
        odd = F.sum(F.when(F.col("i") % 2 == 1, F.col("a")).otherwise(0.0))
        nxt = cur.groupBy(F.floor(F.col("i") / 2).alias("i")).agg(
            ((even + odd) / 2).alias("a"),
            ((even - odd) / 2).alias("d"),
        )
        levels.append(
            nxt.agg(
                F.lit(lv).alias("level"),
                F.sum(F.col("d") * F.col("d")).alias("e"),
                bi(F.count(F.lit(1))).alias("n_coeffs"),
            )
        )
        cur = nxt.select("i", "a")
    approx = cur.agg(
        F.lit(0).alias("level"),
        F.sum(F.col("a") * F.col("a")).alias("e"),
        bi(F.count(F.lit(1))).alias("n_coeffs"),
    )
    es = levels[0]
    for piece in levels[1:] + [approx]:
        es = es.unionByName(piece)
    tot = es.agg(F.sum("e").alias("te"))
    return es.crossJoin(F.broadcast(tot)).select(
        "level",
        "n_coeffs",
        r6(F.col("e") / F.col("te")).alias("energy_share"),
    )
