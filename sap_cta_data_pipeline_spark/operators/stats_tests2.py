"""§2 round-8 batch DV — evaluation depth: uplift (Qini) curves,
isotonic calibration via the exact minimax form, and the Mann–Kendall
trend test.

- ``events_uplift_qini``: the uplift-model evaluation staple — rank
  users by model score, and per cumulative decile compare treated vs
  control conversion: qini(k) = conv_t(k) − conv_c(k)·N_t(k)/N_c(k).
  Treatment assignment and score are deterministic Knuth-hash fixtures
  (in production: the experiment flag and the model's score).
- ``ml_isotonic_calibration``: PAV's fixed point without iteration —
  at score-bin grain the isotonic regression has the EXACT minimax
  closed form fit(t) = max_{i≤t} min_{j≥t} avg(y, bins i..j)
  (Barlow et al. 1972), which both engines can evaluate as a bounded
  triple closure over 20 bins. Monotonicity is pinned; this is the
  calibration map production scorers apply before thresholding.
- ``stats_mann_kendall``: the non-parametric trend test paired with
  Theil–Sen: S = Σ_{i<j} sign(y_j − y_i) over the month series,
  tie-corrected variance, continuity-corrected z. Month-grain bounded
  closure (same class as stats_theilsen_trend).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_KNUTH = 2654435761
_M32 = 4294967296
_BINS = 20


@query(
    "events_uplift_qini",
    oracle=f"""
    WITH users AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS treated,
             (((user_id * {_KNUTH}) % {_M32}) + {_M32}) % {_M32} AS score,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS converted
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY score DESC, user_id) AS rn,
             count(*) OVER () AS n
      FROM users
    ), decd AS (
      SELECT *, CAST(((rn - 1) * 10) // n AS INT) + 1 AS decile FROM ranked
    ), cum AS (
      SELECT decile,
             sum(sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END))
                 OVER w AS nt,
             sum(sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END))
                 OVER w AS nc,
             sum(sum(CASE WHEN treated = 1 THEN converted ELSE 0 END))
                 OVER w AS ct,
             sum(sum(CASE WHEN treated = 0 THEN converted ELSE 0 END))
                 OVER w AS cc
      FROM decd GROUP BY decile
      WINDOW w AS (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT decile,
           CAST(nt AS BIGINT) AS n_treated,
           CAST(nc AS BIGINT) AS n_control,
           round(ct * 1.0 / nt, 6) AS conv_treated,
           round(cc * 1.0 / nc, 6) AS conv_control,
           round(ct * 1.0 / nt - (cc * 1.0 / nc) , 6) AS uplift,
           round(ct - cc * (nt * 1.0 / nc), 6) AS qini
    FROM cum
    """,
)
def events_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini curve by score decile: users ranked by (fixture) model
    score descending, cumulated per decile; uplift = treated − control
    conversion rate, qini = cumulative incremental conversions
    ct − cc·(nt/nc). Deciles are row_number-based ((rn−1)·10/n — the
    engine-portable ntile), cumulation is a decile-grain running
    window. Treatment = user_id parity, score = Knuth hash — the
    deterministic stand-ins for the experiment flag + model score.

    Scale: one user-grain aggregation (the only corpus shuffle), one
    global rank over USERS (at true scale: pre-bin scores to make the
    rank a bin-grain window — same route as ml_auc_roc), then
    decile-grain windows over 10 rows."""
    e = t(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        "user_id",
        (F.col("user_id") % 2).cast("int").alias("treated"),
        F.pmod(F.col("user_id") * _KNUTH, F.lit(_M32)).alias("score"),
        "converted",
    )
    wrank = Window.orderBy(F.col("score").desc(), "user_id")
    wall = Window.partitionBy()
    ranked = users.select(
        "*",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    decd = ranked.withColumn(
        "decile", ((F.col("rn") - 1) * 10 / F.col("n")).cast("int") + 1
    )
    tre = F.col("treated") == 1
    agg = decd.groupBy("decile").agg(
        F.sum(F.when(tre, 1).otherwise(0)).alias("d_nt"),
        F.sum(F.when(~tre, 1).otherwise(0)).alias("d_nc"),
        F.sum(F.when(tre, F.col("converted")).otherwise(0)).alias("d_ct"),
        F.sum(F.when(~tre, F.col("converted")).otherwise(0)).alias("d_cc"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = agg.select(
        "decile",
        F.sum("d_nt").over(wcum).alias("nt"),
        F.sum("d_nc").over(wcum).alias("nc"),
        F.sum("d_ct").over(wcum).alias("ct"),
        F.sum("d_cc").over(wcum).alias("cc"),
    )
    return cum.select(
        "decile",
        bi(F.col("nt")).alias("n_treated"),
        bi(F.col("nc")).alias("n_control"),
        r6(F.col("ct") / F.col("nt")).alias("conv_treated"),
        r6(F.col("cc") / F.col("nc")).alias("conv_control"),
        r6(F.col("ct") / F.col("nt") - F.col("cc") / F.col("nc")).alias(
            "uplift"
        ),
        r6(
            F.col("ct") - F.col("cc") * (F.col("nt") / F.col("nc"))
        ).alias("qini"),
    )


@query(
    "ml_isotonic_calibration",
    oracle=f"""
    WITH scored AS (
      SELECT CAST((((((o_orderkey * {_KNUTH}) % {_M32}) + {_M32}) % {_M32})
                  * {_BINS}) // {_M32} AS INT) AS bin,
             CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
      FROM orders
    ), bins AS (
      SELECT bin, count(*) AS n, sum(y) AS s FROM scored GROUP BY bin
    ), cums AS (
      SELECT bin,
             sum(n) OVER w AS cn, sum(s) OVER w AS cs,
             n, s
      FROM bins WINDOW w AS (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), pairs AS (
      SELECT a.bin AS i, b.bin AS j,
             (b.cs - (a.cs - a.s)) / (b.cn - (a.cn - a.n)) AS seg_avg
      FROM cums a JOIN cums b ON a.bin <= b.bin
    ), inner_min AS (
      SELECT p.i, c.bin AS t, min(p.seg_avg) AS m
      FROM pairs p JOIN cums c ON p.i <= c.bin AND c.bin <= p.j
      GROUP BY p.i, c.bin
    ), fit AS (
      SELECT t AS bin, max(m) AS iso FROM inner_min GROUP BY t
    )
    SELECT b.bin,
           CAST(b.n AS BIGINT) AS n,
           round(b.s / b.n, 6) AS raw_rate,
           round(f.iso, 6) AS iso_rate
    FROM bins b JOIN fit f ON b.bin = f.bin
    """,
)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration at score-bin grain via the EXACT minimax
    characterization fit(t) = max_{i≤t} min_{j≥t} avg(y over bins
    i..j) — the closed form whose output equals PAV's fixed point, so
    no iteration and no engine-specific pooling order. Scores are a
    Knuth-hash fixture binned into 20; labels are o_orderstatus = 'F'.
    Segment averages come from cumulative (n, s) prefix sums; the
    i ≤ t ≤ j closure is 20³ = 8000 driver-trivial combinations.
    Monotonicity (iso non-decreasing in bin) and the pool-adjacent
    property are pinned in tests.

    Scale: ONE corpus aggregation reduces everything to 20 bin rows;
    the minimax closure is metadata-sized at any table size. Finer
    calibration grids grow the closure cubically — 1000 bins = 1e9
    combos — so at that grain route to the applyInPandas PAV instead
    (documented trade; 20–50 bins is the production norm)."""
    o = t(spark, sf_dir, "orders")
    scored = o.select(
        (
            F.pmod(F.col("o_orderkey") * _KNUTH, F.lit(_M32))
            * _BINS
            / F.lit(_M32)
        )
        .cast("int")
        .alias("bin"),
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
    )
    bins = scored.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cums = bins.select(
        "bin",
        F.sum("n").over(wcum).alias("cn"),
        F.sum("s").over(wcum).alias("cs"),
        "n",
        "s",
    )
    a, b = cums.alias("a"), cums.alias("b")
    pairs = a.join(b, F.col("a.bin") <= F.col("b.bin")).select(
        F.col("a.bin").alias("i"),
        F.col("b.bin").alias("j"),
        (
            (F.col("b.cs") - (F.col("a.cs") - F.col("a.s")))
            / (F.col("b.cn") - (F.col("a.cn") - F.col("a.n")))
        ).alias("seg_avg"),
    )
    c = cums.select(F.col("bin").alias("t"))
    inner = (
        pairs.join(
            c, (F.col("i") <= F.col("t")) & (F.col("t") <= F.col("j"))
        )
        .groupBy("i", "t")
        .agg(F.min("seg_avg").alias("m"))
    )
    fit = inner.groupBy("t").agg(F.max("m").alias("iso"))
    return bins.join(fit, bins.bin == fit.t).select(
        "bin",
        bi(F.col("n")).alias("n"),
        r6(F.col("s") / F.col("n")).alias("raw_rate"),
        r6(F.col("iso")).alias("iso_rate"),
    )


@query(
    "stats_mann_kendall",
    oracle="""
    WITH m AS (
      SELECT c_nationkey AS nation,
             CAST(date_part('year', o_orderdate) * 12
                  + date_part('month', o_orderdate) AS BIGINT) AS t,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                 AS rev_c
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), s_stat AS (
      SELECT a.nation,
             CAST(sum(sign(b.rev_c - a.rev_c)) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM m a JOIN m b ON a.nation = b.nation AND a.t < b.t
      GROUP BY a.nation
    ), nn AS (
      SELECT nation, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY nation
    ), ties AS (
      SELECT nation,
             sum(tk * (tk - 1) * (2 * tk + 5)) AS tie_term
      FROM (SELECT nation, rev_c, CAST(count(*) AS BIGINT) AS tk
            FROM m GROUP BY nation, rev_c) GROUP BY nation
    )
    SELECT s_stat.nation, nn.n, s_stat.s,
           round((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                  - COALESCE(ties.tie_term, 0)) / 18.0, 6) AS var_s,
           round((s_stat.s - sign(s_stat.s))
                 / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5)
                         - COALESCE(ties.tie_term, 0)) / 18.0), 6) AS z
    FROM s_stat JOIN nn ON s_stat.nation = nn.nation
    JOIN ties ON s_stat.nation = ties.nation
    """,
)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per customer-nation monthly revenue —
    the hypothesis-test companion to stats_theilsen_trend's estimator:
    S = Σ_{i<j} sign(y_j − y_i), tie-corrected variance
    [n(n−1)(2n+5) − Σ tₖ(tₖ−1)(2tₖ+5)]/18, continuity-corrected
    z = (S − sign(S))/√Var. Integer-cent operands make the pair signs
    engine-identical; sqrt is IEEE-exact on both.

    Scale: the pair closure is the SAME month-grain bounded closure as
    Theil–Sen (deliberate, documented there); all other stages are
    nation-grain metadata."""
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
    a, b = m.alias("a"), m.alias("b")
    s_stat = (
        a.join(
            b,
            (F.col("a.nation") == F.col("b.nation"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(F.col("a.nation").alias("nation"))
        .agg(
            bi(F.sum(F.signum(F.col("b.rev_c") - F.col("a.rev_c")))).alias("s"),
            bi(F.count(F.lit(1))).alias("n_pairs"),
        )
    )
    nn = m.groupBy("nation").agg(bi(F.count(F.lit(1))).alias("n"))
    ties = (
        m.groupBy("nation", "rev_c")
        .agg(F.count(F.lit(1)).cast("long").alias("tk"))
        .groupBy("nation")
        .agg(
            F.sum(
                F.col("tk") * (F.col("tk") - 1) * (2 * F.col("tk") + 5)
            ).alias("tie_term")
        )
    )
    var_expr = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.coalesce(F.col("tie_term"), F.lit(0))
    ) / 18.0
    return (
        s_stat.join(nn, "nation")
        .join(ties, "nation")
        .select(
            "nation",
            "n",
            "s",
            r6(var_expr).alias("var_s"),
            r6(
                (F.col("s") - F.signum(F.col("s"))) / F.sqrt(var_expr)
            ).alias("z"),
        )
    )
