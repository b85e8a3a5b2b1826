"""§2 round-8 batch EH — Fourier seasonal fit + shuffle-balance
profiling.

- ``ts_fourier_seasonal_fit``: project the gap-filled daily revenue
  series onto the first three weekly harmonics (cos/sin at period 7) —
  the regression-on-Fourier-basis seasonality model (what Prophet's
  seasonal term is) as two scans: coefficient projections, then the
  reconstruction R². Complements STL (moving-average decomposition)
  with the parametric alternative.
- ``profile_shuffle_balance``: predict shuffle skew BEFORE paying for
  it — simulate the reducer assignment pmod(hash(key), P) for P = 32
  over the fact table's join key and report per-partition load and the
  max/avg imbalance factor. The number that tells you whether
  join_salted_skew's salting is worth it on YOUR keys, computed for
  the price of one aggregation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r4, r6
from ..registry import query
from .timeseries2 import _DAILY_SQL, _daily_series

_HARMONICS = 3
_TWO_PI = 2 * math.pi
_P = 32
_KNUTH = 2654435761
_M32 = 4294967296


@query(
    "ts_fourier_seasonal_fit",
    oracle=_DAILY_SQL
    + f""",
    idx AS (
      SELECT revenue AS y,
             row_number() OVER (ORDER BY day) - 1 AS i,
             count(*) OVER () AS n,
             avg(revenue) OVER () AS m
      FROM s
    ),
    coef AS (
      SELECT n, m,
             {", ".join(
                 f"2.0 / n * sum(y * cos({_TWO_PI} * {k} * i / 7.0)) AS a{k}, "
                 f"2.0 / n * sum(y * sin({_TWO_PI} * {k} * i / 7.0)) AS b{k}"
                 for k in range(1, _HARMONICS + 1)
             )}
      FROM idx GROUP BY n, m
    ),
    fit AS (
      SELECT idx.y, coef.m,
             coef.m + {" + ".join(
                 f"coef.a{k} * cos({_TWO_PI} * {k} * idx.i / 7.0)"
                 f" + coef.b{k} * sin({_TWO_PI} * {k} * idx.i / 7.0)"
                 for k in range(1, _HARMONICS + 1)
             )} AS yhat
      FROM idx CROSS JOIN coef
    ),
    r2 AS (
      SELECT 1 - sum((y - yhat) * (y - yhat)) / sum((y - m) * (y - m)) AS r2
      FROM fit
    )
    SELECT k,
           round(CASE {" ".join(f"WHEN k = {k} THEN a{k}" for k in range(1, _HARMONICS + 1))} END, 4) AS a,
           round(CASE {" ".join(f"WHEN k = {k} THEN b{k}" for k in range(1, _HARMONICS + 1))} END, 4) AS b,
           round(sqrt(pow(CASE {" ".join(f"WHEN k = {k} THEN a{k}" for k in range(1, _HARMONICS + 1))} END, 2)
                      + pow(CASE {" ".join(f"WHEN k = {k} THEN b{k}" for k in range(1, _HARMONICS + 1))} END, 2)), 4)
               AS amplitude,
           CAST(n AS BIGINT) AS n_days,
           round((SELECT r2 FROM r2), 6) AS r2
    FROM coef CROSS JOIN (SELECT unnest(range(1, {_HARMONICS + 1})) AS k)
    """,
)
def ts_fourier_seasonal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-harmonic Fourier projection of the daily revenue series:
    aₖ = (2/n)Σ y·cos(2πki/7), bₖ = (2/n)Σ y·sin(2πki/7) for k = 1..3,
    one output row per harmonic with its amplitude, plus the shared R²
    of the mean+3-harmonic reconstruction — the parametric seasonality
    model (Prophet's seasonal term is exactly this basis) next to STL's
    nonparametric one. Coefficients round at 4 dp (they are corpus-sum
    magnitudes; the summation-order bound at sf0.1 exceeds 1e-6), the
    dimensionless R² at 6.

    Scale: two passes over a DAY-grain frame (the corpus reduced to
    ~2400 rows by the calendar aggregation) + a 1-row coefficient
    broadcast — everything after the first aggregation is metadata."""
    s = _daily_series(spark, sf_dir)
    widx = Window.orderBy("day")
    wall = Window.partitionBy()
    idx = s.select(
        F.col("revenue").alias("y"),
        (F.row_number().over(widx) - 1).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.avg("revenue").over(wall).alias("m"),
    )
    aggs = []
    for k in range(1, _HARMONICS + 1):
        ang = F.lit(_TWO_PI * k) * F.col("i") / 7.0
        aggs.append(
            (2.0 / F.first("n") * F.sum(F.col("y") * F.cos(ang))).alias(f"a{k}")
        )
        aggs.append(
            (2.0 / F.first("n") * F.sum(F.col("y") * F.sin(ang))).alias(f"b{k}")
        )
    coef = idx.groupBy("n", "m").agg(*aggs)
    yhat = F.col("m")
    for k in range(1, _HARMONICS + 1):
        ang = F.lit(_TWO_PI * k) * F.col("i") / 7.0
        yhat = yhat + F.col(f"a{k}") * F.cos(ang) + F.col(f"b{k}") * F.sin(ang)
    fit = idx.drop("n", "m").crossJoin(F.broadcast(coef))
    r2 = fit.agg(
        (
            1
            - F.sum(F.pow(F.col("y") - yhat, 2))
            / F.sum(F.pow(F.col("y") - F.col("m"), 2))
        ).alias("r2")
    )
    harm = spark.range(1, _HARMONICS + 1).select(F.col("id").alias("k"))
    wide = coef.crossJoin(F.broadcast(r2)).crossJoin(F.broadcast(harm))
    a_case = F.lit(None).cast("double")
    b_case = F.lit(None).cast("double")
    for k in range(_HARMONICS, 0, -1):
        a_case = F.when(F.col("k") == k, F.col(f"a{k}")).otherwise(a_case)
        b_case = F.when(F.col("k") == k, F.col(f"b{k}")).otherwise(b_case)
    return wide.select(
        "k",
        r4(a_case).alias("a"),
        r4(b_case).alias("b"),
        r4(F.sqrt(F.pow(a_case, 2) + F.pow(b_case, 2))).alias("amplitude"),
        bi(F.col("n")).alias("n_days"),
        r6(F.col("r2")).alias("r2"),
    )


@query(
    "profile_shuffle_balance",
    oracle=f"""
    WITH assign AS (
      SELECT (((l_orderkey * {_KNUTH}) % {_M32} + {_M32}) % {_M32}) % {_P}
                 AS part
      FROM lineitem
    ), load AS (
      SELECT part, count(*) * 1.0 AS n FROM assign GROUP BY part
    ), tot AS (
      SELECT part, n,
             sum(n) OVER () / {_P} AS avg_n,
             max(n) OVER () AS max_n
      FROM load
    )
    SELECT CAST(part AS BIGINT) AS part,
           CAST(n AS BIGINT) AS n_rows,
           round(n / avg_n, 6) AS balance,
           round(max_n / avg_n, 6) AS max_skew
    FROM tot
    """,
)
def profile_shuffle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew forecast: simulate the reducer assignment
    pmod(hash(l_orderkey), 32) and report each partition's load, its
    balance vs the ideal 1/P share, and the table-wide max/avg skew
    factor — the diagnostic you run BEFORE a big join to decide between
    the plain shuffle, AQE skew splitting, and join_salted_skew's
    salting (max_skew ≈ 1 → don't salt; ≫ 1 → the straggler is real).
    Engine-portable Knuth hash so both engines simulate the same
    assignment (profile_join_key_skew profiles VALUE frequencies; this
    lane profiles the PARTITION layout those frequencies induce).

    Scale: one aggregation to P rows; windows run over the P-row frame.
    Cost is a single scan — the point is that predicting the skew is
    three orders cheaper than hitting it."""
    li = t(spark, sf_dir, "lineitem")
    assign = li.select(
        F.pmod(
            F.pmod(F.col("l_orderkey") * _KNUTH, F.lit(_M32)), F.lit(_P)
        ).alias("part")
    )
    load = assign.groupBy("part").agg((F.count(F.lit(1)) * 1.0).alias("n"))
    wall = Window.partitionBy()
    tot = load.select(
        "part",
        "n",
        (F.sum("n").over(wall) / _P).alias("avg_n"),
        F.max("n").over(wall).alias("max_n"),
    )
    return tot.select(
        bi(F.col("part")).alias("part"),
        bi(F.col("n")).alias("n_rows"),
        r6(F.col("n") / F.col("avg_n")).alias("balance"),
        r6(F.col("max_n") / F.col("avg_n")).alias("max_skew"),
    )
