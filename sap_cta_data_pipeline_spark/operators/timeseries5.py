"""§2 round-9 batch FF — long-memory + decomposition forecasting on the
daily order-volume series.

``ts_theta_forecast``: the Theta method (Assimakopoulos & Nikolopoulos
2000; the M3-competition winner) with θ = {0, 2} and equal combination
weights — theta-line(0) is the OLS linear trend, theta-line(2) is
2·x_t − line0(t) (double-curvature residual), SES(α=0.5) smooths
line(2), and the h-step forecast averages the two extrapolations. The
OLS fit comes from INTEGER sufficient statistics (the series is a count
series), the SES recurrence folds sequentially in-row over the
day-ordered array (the ts_holt_linear discipline — both engines execute
the same IEEE sequence), and the final is a 7-row horizon frame.

``ts_hurst_rs``: rescaled-range (R/S) analysis — Hurst's long-memory
exponent over block sizes 8/16/32/64 days: per full block, R = range of
cumulative deviations from the block mean, S = population std (both
assembled from exact integer block sums), R/S averaged per size through
a DECIMAL(18,6) quantize-then-sum (order-proof — never a cross-row
float sum), and H = the closed-form 4-point log-log regression slope
(evenly ln2-spaced abscissae collapse the slope to a fixed linear
combination of the four ln(R/S) values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

#: shared day-grain order-count series with a dense 1-based row index
_IDX_SQL = """
      SELECT day, c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      FROM (SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                   count(*) AS c
            FROM orders GROUP BY 1)
"""


def _daily_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, count, index) — daily order volume in day order. The index
    window is day-grain (§R class-3 calendar)."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("day")
    return daily.select("day", "c", F.row_number().over(w).alias("i"))


_H = 7  # forecast horizon (days)


@query(
    "ts_theta_forecast",
    oracle=f"""
    WITH idx AS ({_IDX_SQL}),
    ols AS (
      SELECT count(*) AS n, sum(c) AS sx, sum(i) AS st,
             sum(i * i) AS st2, sum(i * c) AS stx
      FROM idx
    ),
    fit AS (
      SELECT n,
             (n * CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sx AS DOUBLE))
               / (n * CAST(st2 AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
               AS b,
             CAST(sx AS DOUBLE) / n
               - ((n * CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sx AS DOUBLE))
                  / (n * CAST(st2 AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)))
                 * (CAST(st AS DOUBLE) / n) AS a
      FROM ols
    ),
    z AS (
      SELECT idx.i,
             2 * CAST(idx.c AS DOUBLE) - (fit.a + fit.b * idx.i) AS zv
      FROM idx, fit
    ),
    folded AS (
      SELECT list_reduce(list(zv ORDER BY i),
                         (acc, x) -> 0.5e0 * x + 0.5e0 * acc) AS ses
      FROM z
    )
    SELECT CAST(u.h AS BIGINT) AS h,
           round(fit.a + fit.b * (fit.n + u.h), 6) AS lin_component,
           round(folded.ses, 6) AS ses_level,
           round(0.5e0 * (fit.a + fit.b * (fit.n + u.h))
                 + 0.5e0 * folded.ses, 6) AS forecast
    FROM fit, folded, unnest(generate_series(1, {_H})) AS u(h)
    ORDER BY h
    """,
)
def ts_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method 7-day forecast of daily order volume: OLS trend from
    integer sufficient statistics (n, Σx, Σt, Σt², Σtx — count series,
    exact in any aggregation order), theta-line(2) = 2x − trend per day,
    SES(α=0.5) folded sequentially in-row over the day-ordered array
    (seedless reduce: first element initializes, matching DuckDB's
    list_reduce), forecast_h = ½·trend(n+h) + ½·SES_n. Equal-weight
    θ={0,2} is the M3 configuration; it equals SES-with-drift b/2.
    Identity pin: a constant series forecasts the constant at every h.

    Scale: one day rollup is the only corpus shuffle; the index window,
    z frame, and the collected fold array are all day-grain (§R class-3
    calendar — the calendar bounds the array), and the final is a 7-row
    horizon explode."""
    idx = _daily_idx(spark, sf_dir)
    ols = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sx"),
        F.sum("i").alias("st"),
        F.sum(F.col("i") * F.col("i")).alias("st2"),
        F.sum(F.col("i") * F.col("c")).alias("stx"),
    )
    nd = F.col("n")
    stx_d = F.col("stx").cast("double")
    st_d = F.col("st").cast("double")
    sx_d = F.col("sx").cast("double")
    st2_d = F.col("st2").cast("double")
    b = (nd * stx_d - st_d * sx_d) / (nd * st2_d - st_d * st_d)
    fit = ols.select(
        "n",
        b.alias("b"),
        (sx_d / nd - b * (st_d / nd)).alias("a"),
    )
    z = idx.crossJoin(F.broadcast(fit)).select(
        "i",
        "n",
        "a",
        "b",
        (
            2 * F.col("c").cast("double")
            - (F.col("a") + F.col("b") * F.col("i"))
        ).alias("zv"),
    )
    folded = z.groupBy("n", "a", "b").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "zv"))),
            lambda s: s["zv"],
        ).alias("zs")
    )
    ses = folded.select(
        "n",
        "a",
        "b",
        F.aggregate(
            F.slice(F.col("zs"), 2, F.size("zs") - 1),
            F.element_at(F.col("zs"), 1),
            lambda acc, x: F.lit(0.5) * x + F.lit(0.5) * acc,
        ).alias("ses"),
    )
    lin = F.col("a") + F.col("b") * (F.col("n") + F.col("h"))
    return (
        ses.select(
            F.explode(F.sequence(F.lit(1), F.lit(_H))).alias("h"),
            "n",
            "a",
            "b",
            "ses",
        )
        .select(
            bi(F.col("h")).alias("h"),
            r6(lin).alias("lin_component"),
            r6(F.col("ses")).alias("ses_level"),
            r6(F.lit(0.5) * lin + F.lit(0.5) * F.col("ses")).alias(
                "forecast"
            ),
        )
        .orderBy("h")
    )


_SIZES = (8, 16, 32, 64)


@query(
    "ts_hurst_rs",
    oracle=f"""
    WITH idx AS ({_IDX_SQL}),
    sized AS (
      SELECT u.sz, idx.i, idx.c,
             (idx.i - 1) // u.sz AS blk,
             (idx.i - 1) % u.sz + 1 AS pos
      FROM idx, unnest([{", ".join(str(s) for s in _SIZES)}]) AS u(sz)
    ),
    walked AS (
      SELECT sz, blk, pos, c,
             sum(c) OVER (PARTITION BY sz, blk ORDER BY pos) AS cum,
             sum(c) OVER (PARTITION BY sz, blk) AS s_b,
             sum(c * c) OVER (PARTITION BY sz, blk) AS q_b,
             count(*) OVER (PARTITION BY sz, blk) AS cnt_b
      FROM sized
    ),
    devs AS (
      SELECT sz, blk,
             CAST(cum AS DOUBLE) - pos * (CAST(s_b AS DOUBLE) / sz) AS dev,
             s_b, q_b
      FROM walked WHERE cnt_b = sz
    ),
    blocks AS (
      SELECT sz, blk,
             max(dev) - min(dev) AS r,
             sqrt(CAST(any_value(q_b) AS DOUBLE) / sz
                  - (CAST(any_value(s_b) AS DOUBLE) / sz)
                    * (CAST(any_value(s_b) AS DOUBLE) / sz)) AS s
      FROM devs GROUP BY sz, blk
    ),
    persz AS (
      SELECT sz,
             CAST(sum(CAST(round(r / s, 6) AS DECIMAL(18,6))) AS DOUBLE)
               / count(*) AS avg_rs
      FROM blocks WHERE s > 0 GROUP BY sz
    ),
    piv AS (
      SELECT max(CASE WHEN sz = 8 THEN avg_rs END) AS rs_8,
             max(CASE WHEN sz = 16 THEN avg_rs END) AS rs_16,
             max(CASE WHEN sz = 32 THEN avg_rs END) AS rs_32,
             max(CASE WHEN sz = 64 THEN avg_rs END) AS rs_64
      FROM persz
    )
    SELECT CAST((SELECT count(*) FROM idx) AS BIGINT) AS n_days,
           round(rs_8, 6) AS rs_8, round(rs_16, 6) AS rs_16,
           round(rs_32, 6) AS rs_32, round(rs_64, 6) AS rs_64,
           round((-1.5e0 * ln(rs_8) - 0.5e0 * ln(rs_16)
                  + 0.5e0 * ln(rs_32) + 1.5e0 * ln(rs_64))
                 / (5 * ln(2.0)), 6) AS hurst
    FROM piv
    """,
)
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range Hurst exponent of daily order volume — the
    long-memory screen (H ≈ 0.5 random walk increments, > 0.5
    persistent, < 0.5 mean-reverting): for each block size n ∈
    {8,16,32,64} the full blocks yield R/S from exact integer block
    sums (cumulative deviations and the population std both derive from
    Σc, Σc², cum-Σc), per-size averages sum DECIMAL-quantized block
    values (order-proof), and H is the closed-form log-log slope — the
    evenly ln2-spaced sizes reduce the 4-point regression to
    (−1.5·ln rs₈ − 0.5·ln rs₁₆ + 0.5·ln rs₃₂ + 1.5·ln rs₆₄)/(5·ln 2).
    White-noise planted pin sits near 0.5-biased small-sample values;
    a linear ramp pins H near 1.

    Scale: one day rollup + a day-grain index window (§R class-3
    calendar); block windows partition by (size, block) — fully
    parallel; the final is a 4-row pivot."""
    idx = _daily_idx(spark, sf_dir)
    sizes = F.array(*[F.lit(s) for s in _SIZES])
    sized = idx.select(
        F.explode(sizes).alias("sz"),
        "i",
        "c",
    ).select(
        "sz",
        "i",
        "c",
        F.floor((F.col("i") - 1) / F.col("sz")).cast("long").alias("blk"),
        ((F.col("i") - 1) % F.col("sz") + 1).alias("pos"),
    )
    wblk = Window.partitionBy("sz", "blk")
    wcum = wblk.orderBy("pos")
    walked = sized.select(
        "sz",
        "blk",
        "pos",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wblk).alias("s_b"),
        F.sum(F.col("c") * F.col("c")).over(wblk).alias("q_b"),
        F.count(F.lit(1)).over(wblk).alias("cnt_b"),
    )
    devs = walked.filter(F.col("cnt_b") == F.col("sz")).select(
        "sz",
        "blk",
        (
            F.col("cum").cast("double")
            - F.col("pos") * (F.col("s_b").cast("double") / F.col("sz"))
        ).alias("dev"),
        "s_b",
        "q_b",
    )
    blocks = devs.groupBy("sz", "blk").agg(
        (F.max("dev") - F.min("dev")).alias("r"),
        F.sqrt(
            F.any_value(F.col("q_b")).cast("double") / F.col("sz")
            - (F.any_value(F.col("s_b")).cast("double") / F.col("sz"))
            * (F.any_value(F.col("s_b")).cast("double") / F.col("sz"))
        ).alias("s"),
    )
    persz = (
        blocks.filter(F.col("s") > 0)
        .groupBy("sz")
        .agg(
            (
                F.sum(
                    F.round(F.col("r") / F.col("s"), 6).cast("decimal(18,6)")
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_rs")
        )
    )
    piv = persz.agg(
        *[
            F.max(
                F.when(F.col("sz") == s, F.col("avg_rs"))
            ).alias(f"rs_{s}")
            for s in _SIZES
        ]
    )
    n_days = idx.agg(F.count(F.lit(1)).alias("n_days"))
    hurst = (
        F.lit(-1.5) * F.log("rs_8")
        - F.lit(0.5) * F.log("rs_16")
        + F.lit(0.5) * F.log("rs_32")
        + F.lit(1.5) * F.log("rs_64")
    ) / (5 * F.log(F.lit(2.0)))
    return piv.crossJoin(F.broadcast(n_days)).select(
        bi(F.col("n_days")).alias("n_days"),
        r6(F.col("rs_8")).alias("rs_8"),
        r6(F.col("rs_16")).alias("rs_16"),
        r6(F.col("rs_32")).alias("rs_32"),
        r6(F.col("rs_64")).alias("rs_64"),
        r6(hurst).alias("hurst"),
    )
