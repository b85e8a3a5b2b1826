"""§2 round-9 batch EW — time-series diagnostics: the Ljung–Box
portmanteau test, local-extrema (peak/trough) detection, and the
turning-points randomness test.

Parity discipline (SURVEY §5.3): the daily series is an INTEGER count
series; every autocovariance is assembled from integer sufficient
statistics (Σx, Σx², Σ x_t·x_{t+k}, head/tail sums) via the algebraic
identity Σ(x_t−x̄)(x_{t+k}−x̄) = P_k − x̄(H_k+T_k) + (n−k)x̄², so both
engines divide bit-identical integers — no cross-row float summation
anywhere. Series alignment is by ROW INDEX over day order (the sequence
of daily totals), the convention Ljung–Box assumes; the lag pairing is
an explicit index self-join, identical in both engines.

Scale (SCALE.md batch EW): one fact-grain day rollup is the only corpus
shuffle; everything after runs at day grain (§R class-3 calendar
frames) — the 7-lag join is days×7 rows, the extrema window one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_MAX_LAG = 7


def _daily_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-count series with a dense row index in day order
    (day-grain frame — calendar-bounded)."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("day")
    return daily.select("day", "c", F.row_number().over(w).alias("i"))


_DAILY_SQL = """
      SELECT day, c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      FROM (SELECT CAST(ts AS DATE) AS day, count(*) AS c
            FROM events GROUP BY 1)
"""


@query(
    "ts_ljung_box",
    oracle=f"""
    WITH idx AS ({_DAILY_SQL}),
    tot AS (
      SELECT count(*) AS n, sum(c) AS s, sum(c * c) AS q FROM idx
    ),
    lags AS (SELECT k FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) t(k)),
    pair AS (
      SELECT lags.k,
             sum(a.c * b.c) AS p,
             sum(a.c) AS h,
             sum(b.c) AS tl
      FROM lags
      JOIN idx a ON true
      JOIN idx b ON b.i = a.i + lags.k
      GROUP BY lags.k
    ),
    acf AS (
      SELECT k,
             (CAST(p AS DOUBLE)
              - (CAST(s AS DOUBLE) / n) * (CAST(h AS DOUBLE) + CAST(tl AS DOUBLE))
              + (n - k) * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
             / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
               AS rho,
             n
      FROM pair, tot
    )
    SELECT CAST(k AS BIGINT) AS lag,
           round(rho, 6) AS acf,
           round(n * (n + 2.0)
                 * sum(rho * rho / (n - k)) OVER (ORDER BY k), 6) AS q_stat
    FROM acf
    """,
)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau test over the daily event-count series:
    per lag k ≤ 7 the sample ACF ρ̂_k (mean-subtracted, n-denominator)
    and the cumulative Q(k) = n(n+2)·Σ_{{j≤k}} ρ̂_j²/(n−j) — the standard
    'is there ANY autocorrelation in the first h lags' gate run before
    trusting an i.i.d. assumption (residual checks, bootstrap designs).
    ACF numerators come from the integer identity in the module
    docstring, so both engines' doubles are bit-identical.

    Scale: day rollup (one shuffle), then a days×7 index self-join and a
    7-row cumulative window — calendar-bounded work."""
    idx = _daily_idx(spark, sf_dir)
    tot = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    lags = spark.range(1, _MAX_LAG + 1).select(F.col("id").cast("int").alias("k"))
    a = idx.select(F.col("i").alias("ai"), F.col("c").alias("ac"))
    b = idx.select(F.col("i").alias("bi_"), F.col("c").alias("bc"))
    pair = (
        lags.crossJoin(a)
        .join(b, F.col("bi_") == F.col("ai") + F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.col("ac") * F.col("bc")).alias("p"),
            F.sum("ac").alias("h"),
            F.sum("bc").alias("tl"),
        )
    )
    nd = F.col("n")
    mean = F.col("s").cast("double") / nd
    rho = (
        F.col("p").cast("double")
        - mean * (F.col("h").cast("double") + F.col("tl").cast("double"))
        + (nd - F.col("k")) * mean * mean
    ) / (F.col("q").cast("double") - F.col("s").cast("double") * F.col("s").cast("double") / nd)
    acf = pair.crossJoin(F.broadcast(tot)).select(
        "k", rho.alias("rho"), "n"
    )
    wcum = Window.orderBy("k")
    return acf.select(
        bi(F.col("k")).alias("lag"),
        r6(F.col("rho")).alias("acf"),
        r6(
            nd
            * (nd + F.lit(2.0))
            * F.sum(F.col("rho") * F.col("rho") / (nd - F.col("k"))).over(wcum)
        ).alias("q_stat"),
    )


@query(
    "ts_local_extrema",
    oracle=f"""
    WITH idx AS ({_DAILY_SQL})
    SELECT CAST(day AS VARCHAR) AS day, CAST(c AS BIGINT) AS c,
           CASE WHEN c > lag(c) OVER w AND c > lead(c) OVER w THEN 'peak'
                ELSE 'trough' END AS kind
    FROM idx
    WINDOW w AS (ORDER BY i)
    QUALIFY (c > lag(c) OVER w AND c > lead(c) OVER w)
         OR (c < lag(c) OVER w AND c < lead(c) OVER w)
    """,
)
def ts_local_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local peak/trough detection on the daily series: a day is a peak
    (trough) when STRICTLY above (below) both neighbors — plateaus and
    series endpoints are deliberately not extrema (ties make 'peak'
    ill-defined; the strict form is deterministic in both engines). The
    primitive under promo-spike forensics and cycle analysis; the
    turning-points test below consumes its count.

    Scale: the one corpus shuffle is the day rollup; the neighbor
    window is one pass over the day-grain frame (§R class-3
    calendar)."""
    idx = _daily_idx(spark, sf_dir)
    w = Window.orderBy("i")
    flagged = idx.select(
        F.col("day").cast("string").alias("day"),
        F.col("c").cast("long").alias("c"),
        F.lag("c").over(w).alias("pv"),
        F.lead("c").over(w).alias("nx"),
    )
    peak = (F.col("c") > F.col("pv")) & (F.col("c") > F.col("nx"))
    trough = (F.col("c") < F.col("pv")) & (F.col("c") < F.col("nx"))
    return (
        flagged.filter(peak | trough)
        .select(
            "day",
            "c",
            F.when(peak, F.lit("peak")).otherwise(F.lit("trough")).alias("kind"),
        )
    )


@query(
    "ts_turning_points_test",
    oracle=f"""
    WITH idx AS ({_DAILY_SQL}),
    flags AS (
      SELECT CASE WHEN (c > lag(c) OVER w AND c > lead(c) OVER w)
                    OR (c < lag(c) OVER w AND c < lead(c) OVER w)
                  THEN 1 ELSE 0 END AS turn
      FROM idx WINDOW w AS (ORDER BY i)
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(turn) AS BIGINT) AS n_turning
      FROM flags
    )
    SELECT n, n_turning,
           round(2.0 * (n - 2) / 3, 6) AS expected,
           round((n_turning - 2.0 * (n - 2) / 3)
                 / sqrt((16.0 * n - 29) / 90), 6) AS z_score
    FROM s
    """,
)
def ts_turning_points_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points randomness test: under i.i.d. noise the number of
    strict local extrema in a length-n series is T ~ Normal(2(n−2)/3,
    (16n−29)/90); a large |z| means structure (trend or oscillation) —
    the nonparametric cousin of Ljung–Box that needs no lag choice.
    Integer T and n feed the closed-form moments, so both engines'
    doubles are identical.

    Scale: same envelope as ts_local_extrema plus a 1-row final."""
    idx = _daily_idx(spark, sf_dir)
    w = Window.orderBy("i")
    flags = idx.select(
        F.when(
            (
                (F.col("c") > F.lag("c").over(w))
                & (F.col("c") > F.lead("c").over(w))
            )
            | (
                (F.col("c") < F.lag("c").over(w))
                & (F.col("c") < F.lead("c").over(w))
            ),
            1,
        )
        .otherwise(0)
        .alias("turn")
    )
    s = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("turn").cast("long").alias("n_turning"),
    )
    nd = F.col("n")
    exp = F.lit(2.0) * (nd - 2) / 3
    return s.select(
        "n",
        "n_turning",
        r6(exp).alias("expected"),
        r6(
            (F.col("n_turning") - exp)
            / F.sqrt((F.lit(16.0) * nd - 29) / 90)
        ).alias("z_score"),
    )
