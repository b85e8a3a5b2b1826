"""§2 round-7 batch CI — statistical-test lane.

Analytics engines ship hypothesis tests as first-class aggregations (the
reference's test suite covers a t-test and SRM chi-square — rounds 2/4;
SURVEY §0.1). This batch completes the statistics surface a data-science
user actually reaches for, every one expressible as scan → projection →
tiny keyed aggregation (no UDFs, no iteration):

- rank correlation (Spearman with proper tie-averaged ranks; Kendall's
  tau-a on a bounded aggregate grain),
- independence / goodness (chi-square over a contingency table built in
  ONE pass),
- one-way ANOVA (F statistic from per-group moments — group sums, never
  row materialization),
- classifier agreement metrics beyond accuracy (Matthews correlation,
  Cohen's kappa, Brier score with the Murphy reliability/resolution/
  uncertainty decomposition).

Scale notes: every key here reduces to hash aggregations whose reduce
side is O(groups), so 100 TB costs one scan + one tiny shuffle. The two
exceptions are declared: Spearman needs per-partition rank windows (the
lane partitions by l_returnflag so no global sort exists; a truly global
Spearman at 100 TB would switch to binned/approximate ranks — the same
trade agg_percentile_bands documents), and Kendall enumerates pairs only
AFTER aggregating to a ≤25-row grain (tau on raw rows is O(n²) by
definition — the bounded-grain form is the distributed answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

#: same score/label convention as ml_eval.py (value/500 clipped, purchase)
_SCORE_DIV = 500.0


@query(
    "stats_spearman_rank",
    oracle="""
    WITH r AS (
      SELECT l_returnflag,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0
               AS rq,
             rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + (count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0
               AS rp
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(corr(rq, rp), 6) AS spearman_rho
    FROM r GROUP BY 1
    """,
)
def stats_spearman_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs extended price per return
    flag, with PROPER tie handling: each tie group gets the average rank
    min_rank + (ties−1)/2 (rank() is the min rank of the tie group; a
    dense_rank or row_number shortcut changes ρ on tied data). ρ is then
    Pearson corr of the two rank columns. Partitioning by l_returnflag
    keeps every window a keyed window — no global sort stage exists; the
    global-Spearman variant at 100 TB would bin ranks (the
    agg_percentile_bands trade) rather than sort the world."""
    li = t(spark, sf_dir, "lineitem")
    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    tq = Window.partitionBy("l_returnflag", "l_quantity")
    tp = Window.partitionBy("l_returnflag", "l_extendedprice")
    r = li.select(
        "l_returnflag",
        (
            F.rank().over(wq) + (F.count(F.lit(1)).over(tq) - 1) / 2.0
        ).alias("rq"),
        (
            F.rank().over(wp) + (F.count(F.lit(1)).over(tp) - 1) / 2.0
        ).alias("rp"),
    )
    return r.groupBy("l_returnflag").agg(
        bi(F.count(F.lit(1))).alias("n"),
        r6(F.corr("rq", "rp")).alias("spearman_rho"),
    )


@query(
    "stats_kendall_tau",
    oracle="""
    WITH g AS (
      SELECT s_nationkey AS k,
             avg(l_extendedprice) AS price,
             avg(l_quantity) AS qty
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1
    ),
    p AS (
      SELECT sign((a.price - b.price) * (a.qty - b.qty)) AS s
      FROM g a JOIN g b ON a.k < b.k
    )
    SELECT CAST((SELECT count(*) FROM g) AS BIGINT) AS n,
           CAST(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
           CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
           round(sum(s) / (count(*) * 1.0), 6) AS kendall_tau
    FROM p
    """,
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-a between mean price and mean quantity across
    supplier nations. Tau is O(pairs) BY DEFINITION, so the distributed
    form aggregates to a bounded grain FIRST (25 nations → 300 pairs —
    a driver-free self-join of a tiny frame) and only then enumerates
    concordant/discordant pairs; the raw-row tau a stats library
    computes in memory is exactly what cannot ship at 100 TB. The big
    join is keyed (broadcast supplier dim); sign() on the product avoids
    the four-way CASE."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_quantity"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    g = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(
            F.avg("l_extendedprice").alias("price"),
            F.avg("l_quantity").alias("qty"),
        )
    )
    a, b = g.alias("a"), g.alias("b")
    pairs = a.join(b, F.col("a.k") < F.col("b.k")).select(
        F.signum(
            (F.col("a.price") - F.col("b.price"))
            * (F.col("a.qty") - F.col("b.qty"))
        ).alias("s")
    )
    n = g.count()
    return pairs.agg(
        F.lit(n).cast("bigint").alias("n"),
        bi(F.sum(F.when(F.col("s") > 0, 1).otherwise(0))).alias("concordant"),
        bi(F.sum(F.when(F.col("s") < 0, 1).otherwise(0))).alias("discordant"),
        r6(F.sum("s") / F.count(F.lit(1))).alias("kendall_tau"),
    )


@query(
    "stats_chi2_independence",
    oracle="""
    WITH o AS (
      SELECT event_type, dayofweek(ts) AS dow, count(*) * 1.0 AS obs
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT o.*,
             sum(obs) OVER (PARTITION BY event_type) AS row_tot,
             sum(obs) OVER (PARTITION BY dow) AS col_tot,
             sum(obs) OVER () AS grand
      FROM o
    )
    SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT dow) AS BIGINT) AS n_cols,
           CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
           round(sum(pow(obs - row_tot * col_tot / grand, 2)
                     / (row_tot * col_tot / grand)), 6) AS chi2
    FROM tot
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event_type × day-of-week: the
    contingency table is ONE hash aggregation (cells, not rows), the
    marginals are windows OVER THE CELLS (≤ types×7 rows — metadata-
    sized), and χ² = Σ(O−E)²/E with E from the marginal products. This
    is the canonical 'is traffic mix shifting by weekday' test at 100 TB
    for the price of one scan. Spark dayofweek() is 1-based
    (Sunday=1) vs DuckDB's 0-based — the lane subtracts 1 for the
    shared contract."""
    e = t(spark, sf_dir, "events")
    o = (
        e.groupBy(
            "event_type", (F.dayofweek("ts") - 1).alias("dow")
        ).agg(F.count(F.lit(1)).cast("double").alias("obs"))
    )
    wrow = Window.partitionBy("event_type")
    wcol = Window.partitionBy("dow")
    wall = Window.partitionBy()
    cells = o.select(
        "event_type",
        "dow",
        "obs",
        F.sum("obs").over(wrow).alias("row_tot"),
        F.sum("obs").over(wcol).alias("col_tot"),
        F.sum("obs").over(wall).alias("grand"),
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("grand")
    return cells.agg(
        bi(F.countDistinct("event_type")).alias("n_rows"),
        bi(F.countDistinct("dow")).alias("n_cols"),
        bi(
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        ).alias("dof"),
        r6(F.sum(F.pow(F.col("obs") - exp, 2) / exp)).alias("chi2"),
    )


@query(
    "stats_anova_oneway",
    oracle="""
    WITH g AS (
      SELECT event_type, count(*) * 1.0 AS n, avg(value) AS mean_v,
             sum(value * value) AS ss
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT sum(n) AS n_total, count(*) AS k,
             sum(n * mean_v) / sum(n) AS grand_mean
      FROM g
    )
    SELECT CAST(tot.k AS BIGINT) AS k,
           CAST(tot.n_total AS BIGINT) AS n_total,
           round(sum(g.n * pow(g.mean_v - tot.grand_mean, 2)) / (tot.k - 1), 6)
             AS ms_between,
           round(sum(g.ss - g.n * g.mean_v * g.mean_v) / (tot.n_total - tot.k), 6)
             AS ms_within,
           round((sum(g.n * pow(g.mean_v - tot.grand_mean, 2)) / (tot.k - 1))
                 / (sum(g.ss - g.n * g.mean_v * g.mean_v) / (tot.n_total - tot.k)), 6)
             AS f_stat
    FROM g, tot
    GROUP BY tot.k, tot.n_total
    """,
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types: F =
    (SSB/(k−1)) / (SSW/(N−k)), assembled entirely from per-group
    sufficient statistics (n, mean, Σv²) — one hash aggregation over the
    corpus, then k-row arithmetic. SSW uses Σv² − n·mean² per group
    (no second pass over rows); the grand mean is the n-weighted group
    mean. The 100 TB plan is identical: group moments are the map-side
    combine, the F statistic is driver-sized arithmetic."""
    e = t(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("mean_v"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    tot = g.agg(
        F.sum("n").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("k"),
        (F.sum(F.col("n") * F.col("mean_v")) / F.sum("n")).alias("grand_mean"),
    )
    j = g.crossJoin(F.broadcast(tot))
    ssb = F.sum(F.col("n") * F.pow(F.col("mean_v") - F.col("grand_mean"), 2))
    ssw = F.sum(F.col("ss") - F.col("n") * F.col("mean_v") * F.col("mean_v"))
    return j.groupBy("k", "n_total").agg(
        r6(ssb / (F.col("k") - 1)).alias("ms_between"),
        r6(ssw / (F.col("n_total") - F.col("k"))).alias("ms_within"),
        r6(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n_total") - F.col("k")))
        ).alias("f_stat"),
    ).select(
        bi(F.col("k")).alias("k"),
        bi(F.col("n_total")).alias("n_total"),
        "ms_between",
        "ms_within",
        "f_stat",
    )


@query(
    "ml_mcc",
    oracle=f"""
    WITH s AS (
      SELECT CASE WHEN least(value / {_SCORE_DIV}, 0.999999) >= 0.5
                  THEN 1 ELSE 0 END AS pred,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events
    ),
    c AS (
      SELECT sum(CASE WHEN pred = 1 AND label = 1 THEN 1 ELSE 0 END) * 1.0 AS tp,
             sum(CASE WHEN pred = 1 AND label = 0 THEN 1 ELSE 0 END) * 1.0 AS fp,
             sum(CASE WHEN pred = 0 AND label = 0 THEN 1 ELSE 0 END) * 1.0 AS tn,
             sum(CASE WHEN pred = 0 AND label = 1 THEN 1 ELSE 0 END) * 1.0 AS fn
      FROM s
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
           round((tp * tn - fp * fn)
                 / sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)), 6) AS mcc
    FROM c
    """,
)
def ml_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient at the 0.5 operating point — the
    single-number confusion summary that stays honest under class
    imbalance (accuracy and F1 both saturate when negatives dominate,
    the usual shape of purchase labels). One scan → four conditional
    sums; the four products are computed in DOUBLE (counts at corpus
    scale overflow int64 under the 4-way product)."""
    e = t(spark, sf_dir, "events")
    score = F.least(F.col("value") / _SCORE_DIV, F.lit(0.999999))
    pred = F.when(score >= 0.5, 1).otherwise(0)
    label = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    c = e.select(pred.alias("pred"), label.alias("label")).agg(
        F.sum(F.when((F.col("pred") == 1) & (F.col("label") == 1), 1).otherwise(0))
        .cast("double")
        .alias("tp"),
        F.sum(F.when((F.col("pred") == 1) & (F.col("label") == 0), 1).otherwise(0))
        .cast("double")
        .alias("fp"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("label") == 0), 1).otherwise(0))
        .cast("double")
        .alias("tn"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("label") == 1), 1).otherwise(0))
        .cast("double")
        .alias("fn"),
    )
    mcc = (F.col("tp") * F.col("tn") - F.col("fp") * F.col("fn")) / F.sqrt(
        (F.col("tp") + F.col("fp"))
        * (F.col("tp") + F.col("fn"))
        * (F.col("tn") + F.col("fp"))
        * (F.col("tn") + F.col("fn"))
    )
    return c.select(
        bi(F.col("tp")).alias("tp"),
        bi(F.col("fp")).alias("fp"),
        bi(F.col("tn")).alias("tn"),
        bi(F.col("fn")).alias("fn"),
        r6(mcc).alias("mcc"),
    )


@query(
    "ml_brier_decomposition",
    oracle=f"""
    WITH s AS (
      SELECT least(value / {_SCORE_DIV}, 0.999999) AS score,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS label
      FROM events
    ),
    b AS (
      SELECT CAST(floor(score * 10) AS BIGINT) AS bin,
             count(*) * 1.0 AS n, avg(score) AS f, avg(label) AS o
      FROM s GROUP BY 1
    ),
    tot AS (
      SELECT sum(n) AS n_total, sum(n * o) / sum(n) AS obar FROM b
    )
    SELECT round((SELECT avg(pow(score - label, 2)) FROM s), 6) AS brier,
           round(sum(b.n * pow(b.f - b.o, 2)) / tot.n_total, 6) AS reliability,
           round(sum(b.n * pow(b.o - tot.obar, 2)) / tot.n_total, 6) AS resolution,
           round(tot.obar * (1 - tot.obar), 6) AS uncertainty
    FROM b, tot
    GROUP BY tot.n_total, tot.obar
    """,
)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with the Murphy decomposition over the same 10 fixed
    score bins as ml_calibration_bins: brier measured directly
    (mean (score−label)²) plus reliability Σn_b(f_b−o_b)²/N (calibration
    error — lower is better), resolution Σn_b(o_b−ō)²/N (how much the
    bins separate outcomes — higher is better), uncertainty ō(1−ō).
    With fixed-width bins the identity brier = REL − RES + UNC holds
    only up to within-bin score variance, so all four are emitted
    measured, not derived. Two hash aggregations (rows → 10 bins → 1)."""
    e = t(spark, sf_dir, "events")
    score = F.least(F.col("value") / _SCORE_DIV, F.lit(0.999999))
    label = F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
    s = e.select(score.alias("score"), label.alias("label"))
    brier = s.agg(
        F.avg(F.pow(F.col("score") - F.col("label"), 2)).alias("brier")
    )
    b = s.groupBy(F.floor(F.col("score") * 10).alias("bin")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("score").alias("f"),
        F.avg("label").alias("o"),
    )
    tot = b.agg(
        F.sum("n").alias("n_total"),
        (F.sum(F.col("n") * F.col("o")) / F.sum("n")).alias("obar"),
    )
    j = b.crossJoin(F.broadcast(tot))
    agg = j.groupBy("n_total", "obar").agg(
        r6(
            F.sum(F.col("n") * F.pow(F.col("f") - F.col("o"), 2))
            / F.col("n_total")
        ).alias("reliability"),
        r6(
            F.sum(F.col("n") * F.pow(F.col("o") - F.col("obar"), 2))
            / F.col("n_total")
        ).alias("resolution"),
        r6(F.col("obar") * (1 - F.col("obar"))).alias("uncertainty"),
    )
    return agg.crossJoin(F.broadcast(brier)).select(
        r6(F.col("brier")).alias("brier"),
        "reliability",
        "resolution",
        "uncertainty",
    )


@query(
    "ml_cohens_kappa",
    oracle=f"""
    WITH s AS (
      SELECT CASE WHEN least(value / {_SCORE_DIV}, 0.999999) >= 0.3
                  THEN 1 ELSE 0 END AS pred,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events
    ),
    c AS (
      SELECT count(*) * 1.0 AS n,
             sum(CASE WHEN pred = label THEN 1 ELSE 0 END) * 1.0 AS agree,
             sum(pred) * 1.0 AS p1, sum(label) * 1.0 AS l1
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n,
           round(agree / n, 6) AS po,
           round((p1 * l1 + (n - p1) * (n - l1)) / (n * n), 6) AS pe,
           round((agree / n - (p1 * l1 + (n - p1) * (n - l1)) / (n * n))
                 / (1 - (p1 * l1 + (n - p1) * (n - l1)) / (n * n)), 6) AS kappa
    FROM c
    """,
)
def ml_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the thresholded score (≥0.3) and the true
    label: observed agreement corrected by chance agreement from the
    marginals — the metric for 'is this cheap classifier better than its
    base rates'. Everything derives from four global sums in one scan;
    marginal products run in double for the same overflow reason as
    ml_mcc."""
    e = t(spark, sf_dir, "events")
    score = F.least(F.col("value") / _SCORE_DIV, F.lit(0.999999))
    pred = F.when(score >= 0.3, 1).otherwise(0)
    label = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    c = e.select(pred.alias("pred"), label.alias("label")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("pred") == F.col("label"), 1).otherwise(0))
        .cast("double")
        .alias("agree"),
        F.sum("pred").cast("double").alias("p1"),
        F.sum("label").cast("double").alias("l1"),
    )
    po = F.col("agree") / F.col("n")
    pe = (
        F.col("p1") * F.col("l1")
        + (F.col("n") - F.col("p1")) * (F.col("n") - F.col("l1"))
    ) / (F.col("n") * F.col("n"))
    return c.select(
        bi(F.col("n")).alias("n"),
        r6(po).alias("po"),
        r6(pe).alias("pe"),
        r6((po - pe) / (1 - pe)).alias("kappa"),
    )


@query(
    "orders_price_elasticity",
    oracle="""
    WITH j AS (
      SELECT p.p_brand,
             ln(l.l_quantity) AS lq,
             ln(l.l_extendedprice / l.l_quantity) AS lp
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           round((count(*) * sum(lp * lq) - sum(lp) * sum(lq))
                 / (count(*) * sum(lp * lp) - sum(lp) * sum(lp)), 6)
             AS elasticity,
           round(corr(lp, lq) * corr(lp, lq), 6) AS r2
    FROM j GROUP BY 1
    """,
)
def orders_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per brand: the OLS slope of
    ln(quantity) on ln(unit price) — the number every pricing analysis
    opens with (−1 = unit elastic; the textbook demand-curve readout).
    Assembled from the five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    in ONE hash aggregation after a broadcast part-dim join — the same
    normal-equations discipline as ml_ols_two_feature, at brand grain,
    plus the fit quality r² = corr². No row ever leaves its partition
    except into the brand-keyed combine."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand",
        F.log(F.col("l_quantity")).alias("lq"),
        F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("lp"),
    )
    n = F.count(F.lit(1)).cast("double")
    slope = (n * F.sum(F.col("lp") * F.col("lq")) - F.sum("lp") * F.sum("lq")) / (
        n * F.sum(F.col("lp") * F.col("lp")) - F.sum("lp") * F.sum("lp")
    )
    return j.groupBy("p_brand").agg(
        bi(F.count(F.lit(1))).alias("n"),
        r6(slope).alias("elasticity"),
        r6(F.corr("lp", "lq") * F.corr("lp", "lq")).alias("r2"),
    )
