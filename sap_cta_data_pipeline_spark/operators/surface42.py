"""§2 round-9 batch FK — serial-correlation diagnostics + density-based
outliers.

``ts_durbin_watson``: the Durbin-Watson statistic of the daily
order-volume OLS-detrended residuals — the first-order serial-
correlation screen every regression report carries (DW ≈ 2 independent,
→0 positive, →4 negative autocorrelation). The residuals are NEVER
materialized as a float column: Δe_t = Δx_t − b, so
Σ(Δe)² = ΣΔx² − 2bΣΔx + (n−1)b², and Σe² expands over the OLS normal
equations — every Σ is an exact INTEGER aggregate (the count series),
and b enters once in a fixed-order final expression.

``ml_hbos_outlier_topk``: HBOS (Goldstein & Dengel 2012) — the
embarrassingly-parallel outlier score: per feature an independent
density estimate (10 equi-width bins over cent-exact price; categorical
frequency for priority), score = Σ_f −ln p_f(x), top-20 by (score,
orderkey). Bin indices are pure integer arithmetic
(⌊(v−min)·10/(max−min+1)⌋), so the histogram is deterministic at any
partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_IDX_SQL = """
      SELECT day, c, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      FROM (SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                   count(*) AS c
            FROM orders GROUP BY 1)
"""


def _daily_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("day")
    return daily.select("day", "c", F.row_number().over(w).alias("i"))


@query(
    "ts_durbin_watson",
    oracle=f"""
    WITH idx AS ({_IDX_SQL}),
    difs AS (
      SELECT c, i,
             c - lag(c) OVER (ORDER BY i) AS dx
      FROM idx
    ),
    s AS (
      SELECT count(*) AS n, sum(c) AS sx, sum(i) AS st,
             sum(i * i) AS st2, sum(i * c) AS stx,
             sum(c * c) AS sx2,
             sum(dx) AS sdx, sum(dx * dx) AS sdx2
      FROM difs
    ),
    fit AS (
      SELECT n, sx, sx2, st, st2, stx, sdx, sdx2,
             (n * CAST(stx AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sx AS DOUBLE))
               / (n * CAST(st2 AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
               AS b
      FROM s
    ),
    fin AS (
      SELECT n, b,
             CAST(sx AS DOUBLE) / n - b * (CAST(st AS DOUBLE) / n) AS a,
             CAST(sdx2 AS DOUBLE) - 2 * b * CAST(sdx AS DOUBLE)
               + (n - 1) * b * b AS num
      FROM fit
    ),
    fin2 AS (
      SELECT fin.n, fin.b, fin.num,
             CAST(s.sx2 AS DOUBLE) - 2 * fin.a * CAST(s.sx AS DOUBLE)
               - 2 * fin.b * CAST(s.stx AS DOUBLE)
               + fin.n * fin.a * fin.a
               + 2 * fin.a * fin.b * CAST(s.st AS DOUBLE)
               + fin.b * fin.b * CAST(s.st2 AS DOUBLE) AS den
      FROM fin, s
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(b, 6) AS slope,
           round(num / den, 6) AS dw
    FROM fin2
    """,
)
def ts_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson on OLS-detrended daily order volume: the slope b
    comes from the integer normal equations; the numerator Σ(Δe)² and
    denominator Σe² expand algebraically into the integer sums
    (Σx, Σx², Σt, Σt², Σtx, ΣΔx, ΣΔx², n) — residuals are never stored,
    so there is no cross-row float summation to break determinism. A
    python re-derivation pin checks the expansion on a planted series;
    an AR(+)-like two-block series pins DW < 1, an alternating series
    pins DW > 3.

    Scale: one day rollup + one day-grain lag (§R class-3 calendar) +
    a 1-row algebraic final."""
    idx = _daily_idx(spark, sf_dir)
    wlag = Window.orderBy("i")
    difs = idx.select(
        "c", "i", (F.col("c") - F.lag("c").over(wlag)).alias("dx")
    )
    s = difs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sx"),
        F.sum("i").alias("st"),
        F.sum(F.col("i") * F.col("i")).alias("st2"),
        F.sum(F.col("i") * F.col("c")).alias("stx"),
        F.sum(F.col("c") * F.col("c")).alias("sx2"),
        F.sum("dx").alias("sdx"),
        F.sum(F.col("dx") * F.col("dx")).alias("sdx2"),
    )
    nd = F.col("n")
    std, sxd = F.col("st").cast("double"), F.col("sx").cast("double")
    st2d, stxd = F.col("st2").cast("double"), F.col("stx").cast("double")
    b = (nd * stxd - std * sxd) / (nd * st2d - std * std)
    fit = s.select("n", "sx", "sx2", "st", "st2", "stx", "sdx", "sdx2", b.alias("b"))
    a = sxd / nd - F.col("b") * (std / nd)
    num = (
        F.col("sdx2").cast("double")
        - 2 * F.col("b") * F.col("sdx").cast("double")
        + (nd - 1) * F.col("b") * F.col("b")
    )
    fin = fit.select("n", "b", "sx", "sx2", "st", "st2", "stx", a.alias("a"), num.alias("num"))
    den = (
        F.col("sx2").cast("double")
        - 2 * F.col("a") * F.col("sx").cast("double")
        - 2 * F.col("b") * F.col("stx").cast("double")
        + F.col("n") * F.col("a") * F.col("a")
        + 2 * F.col("a") * F.col("b") * F.col("st").cast("double")
        + F.col("b") * F.col("b") * F.col("st2").cast("double")
    )
    return fin.select(
        bi(F.col("n")).alias("n_days"),
        r6(F.col("b")).alias("slope"),
        r6(F.col("num") / den).alias("dw"),
    )


_BINS = 10
_TOPK = 20


@query(
    "ml_hbos_outlier_topk",
    oracle=f"""
    WITH x AS (
      SELECT o_orderkey AS k, o_orderpriority AS pri,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
      FROM orders
    ),
    rng AS (SELECT min(v) AS lo, max(v) AS hi, count(*) AS n FROM x),
    binned AS (
      SELECT x.k, x.pri,
             (x.v - rng.lo) * {_BINS} // (rng.hi - rng.lo + 1) AS bin,
             rng.n
      FROM x, rng
    ),
    bfreq AS (SELECT bin, count(*) AS cb FROM binned GROUP BY bin),
    pfreq AS (SELECT pri, count(*) AS cp FROM binned GROUP BY pri),
    scored AS (
      SELECT b.k,
             -ln(CAST(bf.cb AS DOUBLE) / b.n)
               - ln(CAST(pf.cp AS DOUBLE) / b.n) AS score
      FROM binned b JOIN bfreq bf USING (bin) JOIN pfreq pf USING (pri)
    )
    SELECT k AS o_orderkey, round(score, 6) AS hbos_score
    FROM scored
    ORDER BY score DESC, k
    LIMIT {_TOPK}
    """,
)
def ml_hbos_outlier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBOS top-20 outlier orders: two INDEPENDENT per-feature density
    estimates — 10 equi-width bins over cent-exact totalprice (integer
    bin index ⌊(v−lo)·10/(hi−lo+1)⌋, max clamps into the last bin by
    the +1) and categorical priority frequency — summed as −ln p, the
    naive-Bayes-of-densities that makes HBOS O(n) and fully parallel
    where kNN/LOF outlier scores are O(n²). Deterministic top-k via the
    (score DESC, orderkey) tie-break. Planted pin: a lone extreme-price
    order in a rare priority takes rank 1 with score
    −ln(1/n)−ln(1/n).

    Scale: two histogram aggs (10-row, |priorities|-row) broadcast back
    onto the scan, one global top-k (range-partitioned TakeOrdered — no
    full sort materializes); the textbook 100-TB outlier sweep."""
    o = t(spark, sf_dir, "orders")
    x = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
    )
    rng = x.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count(F.lit(1)).alias("n")
    )
    binned = x.crossJoin(F.broadcast(rng)).select(
        "k",
        "pri",
        F.floor(
            (F.col("v") - F.col("lo"))
            * _BINS
            / (F.col("hi") - F.col("lo") + 1)
        )
        .cast("long")
        .alias("bin"),
        "n",
    )
    bfreq = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cb"))
    pfreq = binned.groupBy("pri").agg(F.count(F.lit(1)).alias("cp"))
    scored = (
        binned.join(F.broadcast(bfreq), "bin")
        .join(F.broadcast(pfreq), "pri")
        .select(
            "k",
            (
                -F.log(F.col("cb").cast("double") / F.col("n"))
                - F.log(F.col("cp").cast("double") / F.col("n"))
            ).alias("score"),
        )
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("k"))
        .limit(_TOPK)
        .select(
            F.col("k").alias("o_orderkey"), r6(F.col("score")).alias("hbos_score")
        )
    )
