"""§2 round-9 batch FE — the paired/ordered testing trio.

``stats_wilcoxon_signed_rank``: the paired cousin of batch DY's
Mann-Whitney — per-customer spend difference between the two halves of
the order history (cent-exact integer sums, never a double mean), zero
differences dropped per Wilcoxon, |d| midranked at the VALUE grain
(doubled-integer midranks from cumulative value-grain counts — the
ml_auc_roc discipline), W+ as an exact decimal rank sum, and the
normal-approximation z with the standard tie correction Σ(t³−t)/48.

``stats_mcnemar``: the paired-binary test ("did the same customer's
URGENT-usage flip between periods?") — discordant counts b/c from one
per-customer agg, χ² = (b−c)²/(b+c) plus the Edwards
continuity-corrected variant.

``stats_cochran_armitage``: trend-in-proportions across ORDERED groups
(order years as integer dose scores; response = big-ticket order) —
the dose-response screen a plain χ² independence test wastes power on.
Z assembled from k-row integer sufficient statistics
(Σw·r, Σw·n, Σw²·n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_CUTOFF = "1995-01-01"


@query(
    "stats_wilcoxon_signed_rank",
    oracle="""
    WITH cents AS (
      SELECT o_custkey,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c,
             (o_orderdate >= TIMESTAMP '1995-01-01') AS aft
      FROM orders
    ), per AS (
      SELECT o_custkey,
             sum(CASE WHEN aft THEN c ELSE 0 END)
               - sum(CASE WHEN NOT aft THEN c ELSE 0 END) AS d
      FROM cents GROUP BY o_custkey
    ), nz AS (
      SELECT abs(d) AS av, (d > 0) AS pos FROM per WHERE d <> 0
    ), cells AS (
      SELECT av, pos, count(*) AS cnt FROM nz GROUP BY av, pos
    ), vals AS (
      SELECT av, sum(cnt) AS tt FROM cells GROUP BY av
    ), cum AS (
      SELECT av, tt,
             coalesce(sum(tt) OVER (ORDER BY av
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM vals
    ), ranked AS (
      SELECT cells.pos, cells.cnt, 2 * cum.below + cum.tt + 1 AS m2
      FROM cells JOIN cum USING (av)
    ), stats AS (
      SELECT sum(CASE WHEN pos THEN m2 * cnt ELSE 0 END) AS w2_plus,
             sum(cnt) AS n
      FROM ranked
    ), ties AS (
      SELECT sum(tt * tt * tt - tt) AS tie_sum FROM vals
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           round(CAST(w2_plus AS DOUBLE) / 2, 6) AS w_plus,
           round((CAST(w2_plus AS DOUBLE) / 2
                    - CAST(n AS DOUBLE) * (n + 1) / 4)
                 / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
                        - CAST(tie_sum AS DOUBLE) / 48), 6) AS z_stat
    FROM stats, ties
    """,
)
def stats_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank z for the paired per-customer spend shift
    between the pre-/post-1995 halves: differences are CENT-EXACT
    integer sums (never a double mean — summation-order-proof), zeros
    drop, |d| midranks come doubled from cumulative value-grain counts,
    W+ is an exact decimal sum of doubled midranks halved once at the
    end, and the z denominator carries the Σ(t³−t)/48 tie correction.
    Planted closed-form pin (all-positive distinct diffs ⇒ W+ =
    n(n+1)/2) in tests.

    Scale: one per-customer hash agg, one (|d|, sign) cell agg, a
    value-grain cumulative window (§R class-3 value-grain family — the
    cent grain is the documented pre-binning; re-bin coarser at higher
    SF for a tighter grain), and a 1-row final."""
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    o = t(spark, sf_dir, "orders")
    cents = o.select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        (F.col("o_orderdate") >= cutoff).alias("aft"),
    )
    per = cents.groupBy("o_custkey").agg(
        (
            F.sum(F.when(F.col("aft"), F.col("c")).otherwise(F.lit(0)))
            - F.sum(F.when(~F.col("aft"), F.col("c")).otherwise(F.lit(0)))
        ).alias("d")
    )
    nz = per.filter(F.col("d") != 0).select(
        F.abs(F.col("d")).alias("av"), (F.col("d") > 0).alias("pos")
    )
    cells = nz.groupBy("av", "pos").agg(F.count(F.lit(1)).alias("cnt"))
    vals = cells.groupBy("av").agg(F.sum("cnt").alias("tt"))
    wcum = Window.orderBy("av").rowsBetween(Window.unboundedPreceding, -1)
    cum = vals.select(
        "av", "tt", F.coalesce(F.sum("tt").over(wcum), F.lit(0)).alias("below")
    )
    ranked = cells.join(cum, "av").select(
        "pos", "cnt", (2 * F.col("below") + F.col("tt") + 1).alias("m2")
    )
    stats = ranked.agg(
        F.sum(
            F.when(F.col("pos"), F.col("m2") * F.col("cnt"))
            .otherwise(F.lit(0))
            .cast("decimal(38,0)")
        ).alias("w2_plus"),
        F.sum("cnt").alias("n"),
    )
    ties = vals.agg(
        F.sum(
            (F.col("tt") * F.col("tt") * F.col("tt") - F.col("tt")).cast(
                "decimal(38,0)"
            )
        ).alias("tie_sum")
    )
    nd = F.col("n").cast("double")
    w2d = F.col("w2_plus").cast("double")
    return stats.crossJoin(F.broadcast(ties)).select(
        bi(F.col("n")).alias("n_pairs"),
        r6(w2d / 2).alias("w_plus"),
        r6(
            (w2d / 2 - nd * (F.col("n") + 1) / 4)
            / F.sqrt(
                nd * (F.col("n") + 1) * (2 * F.col("n") + 1) / 24
                - F.col("tie_sum").cast("double") / 48
            )
        ).alias("z_stat"),
    )


@query(
    "stats_mcnemar",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             max(CASE WHEN o_orderpriority = '1-URGENT'
                       AND o_orderdate < TIMESTAMP '1995-01-01'
                      THEN 1 ELSE 0 END) AS p1,
             max(CASE WHEN o_orderpriority = '1-URGENT'
                       AND o_orderdate >= TIMESTAMP '1995-01-01'
                      THEN 1 ELSE 0 END) AS p2
      FROM orders GROUP BY o_custkey
    ), s AS (
      SELECT count(*) AS n,
             sum(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END) AS b,
             sum(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END) AS c
      FROM per
    )
    SELECT CAST(n AS BIGINT) AS n_subjects,
           CAST(b AS BIGINT) AS b_disc,
           CAST(c AS BIGINT) AS c_disc,
           round(CASE WHEN b + c > 0 THEN
                   CAST((b - c) * (b - c) AS DOUBLE) / (b + c) END, 6)
             AS chi2,
           round(CASE WHEN b + c > 0 THEN
                   CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                     / (b + c) END, 6) AS chi2_cc
    FROM s
    """,
)
def stats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on the paired binary "customer placed an URGENT
    order" indicator, pre- vs post-1995: only the DISCORDANT pairs
    (b = yes→no, c = no→yes) carry information; χ² = (b−c)²/(b+c) and
    the Edwards continuity-corrected (|b−c|−1)²/(b+c) both emit, NULL
    when b+c = 0. Planted 2×2 pin (b=3, c=1 ⇒ χ² = 1, cc = 0.25) in
    tests.

    Scale: one per-customer hash agg (map-side combinable max flags) +
    a 1-row total — the same envelope as events_churn_flags."""
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    o = t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    per = o.groupBy("o_custkey").agg(
        F.max(
            F.when(urgent & (F.col("o_orderdate") < cutoff), 1).otherwise(0)
        ).alias("p1"),
        F.max(
            F.when(urgent & (F.col("o_orderdate") >= cutoff), 1).otherwise(0)
        ).alias("p2"),
    )
    s = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when((F.col("p1") == 1) & (F.col("p2") == 0), 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("p1") == 0) & (F.col("p2") == 1), 1).otherwise(0)
        ).alias("c"),
    )
    b, c = F.col("b"), F.col("c")
    disc = b + c
    return s.select(
        bi(F.col("n")).alias("n_subjects"),
        bi(b).alias("b_disc"),
        bi(c).alias("c_disc"),
        r6(
            F.when(disc > 0, ((b - c) * (b - c)).cast("double") / disc)
        ).alias("chi2"),
        r6(
            F.when(
                disc > 0,
                ((F.abs(b - c) - 1) * (F.abs(b - c) - 1)).cast("double")
                / disc,
            )
        ).alias("chi2_cc"),
    )


@query(
    "stats_cochran_armitage",
    oracle="""
    WITH g AS (
      SELECT CAST(year(o_orderdate) - 1991 AS BIGINT) AS w,
             CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS resp
      FROM orders
    ), grp AS (
      SELECT w, count(*) AS n_i, sum(resp) AS r_i FROM g GROUP BY w
    ), s AS (
      SELECT count(*) AS k, sum(n_i) AS n, sum(r_i) AS r,
             sum(w * r_i) AS swr, sum(w * n_i) AS swn,
             sum(w * w * n_i) AS sw2n
      FROM grp
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n_total,
           round(CAST(r AS DOUBLE) / n, 6) AS pbar,
           round((CAST(swr AS DOUBLE)
                    - (CAST(r AS DOUBLE) / n) * CAST(swn AS DOUBLE))
                 / sqrt((CAST(r AS DOUBLE) / n)
                        * (1 - CAST(r AS DOUBLE) / n)
                        * (CAST(sw2n AS DOUBLE)
                           - CAST(swn AS DOUBLE) / n * CAST(swn AS DOUBLE))),
                 6) AS z_stat
    FROM s
    """,
)
def stats_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: is the big-ticket-order proportion
    trending across the ORDERED order years (integer dose scores
    w = year−1991)? Z = (Σw·r − p̄·Σw·n) / √(p̄(1−p̄)(Σw²n − (Σwn)²/N))
    from exact integer sufficient statistics; the ordered-alternative
    power a plain χ² independence table throws away. Planted
    perfect-trend pin in tests.

    Scale: one year-grain hash agg + a k-row reduction — nothing
    beyond the orders_growth_mom_yoy envelope; doubles enter only in
    the final k-row expression, structured identically to the oracle
    for bit parity."""
    o = t(spark, sf_dir, "orders")
    g = o.select(
        (F.year("o_orderdate") - 1991).cast("long").alias("w"),
        F.when(F.col("o_totalprice") > 150000, 1).otherwise(0).alias("resp"),
    )
    grp = g.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_i"), F.sum("resp").alias("r_i")
    )
    s = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_i").alias("n"),
        F.sum("r_i").alias("r"),
        F.sum(F.col("w") * F.col("r_i")).alias("swr"),
        F.sum(F.col("w") * F.col("n_i")).alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("n_i")).alias("sw2n"),
    )
    nd = F.col("n").cast("double")
    pbar = F.col("r").cast("double") / F.col("n")
    swnd = F.col("swn").cast("double")
    return s.select(
        bi(F.col("k")).alias("k"),
        bi(F.col("n")).alias("n_total"),
        r6(pbar).alias("pbar"),
        r6(
            (F.col("swr").cast("double") - pbar * swnd)
            / F.sqrt(
                pbar
                * (1 - pbar)
                * (F.col("sw2n").cast("double") - swnd / F.col("n") * swnd)
            )
        ).alias("z_stat"),
    )
