"""§2 round-9 batch FC (part 2) — Kruskal–Wallis at the value grain.

``stats_kruskal_wallis``: the rank-based one-way ANOVA (unpaired cousin
of batch FA's Friedman): H = [12/(N(N+1))·Σ_j R_j²/n_j − 3(N+1)],
tie-corrected by C = 1 − Σ(t³−t)/(N³−N). The corpus never gets
row-ranked: values are quantized to cents (the documented pre-binning —
this IS the ml_auc_roc value-grain route), collapsed to (value, group)
counts, and midranks come from cumulative counts over the VALUE grain.
Everything stays exact: midranks are computed DOUBLED (2·cum + cnt + 1 —
an integer), per-group rank sums are integer sums (DECIMAL(38,0)
Spark-side / HUGEINT DuckDB-side where int64 could overflow), and the
final H is double arithmetic on bit-identical operands.

Scale (SCALE.md batch FC): one hash agg to (value, group) cells, one to
the value grain, a value-grain cumulative window (§R class-3
value-grain+route — the cent quantization bounds the grain), and a
k-row final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "stats_kruskal_wallis",
    oracle="""
    WITH x AS (
      SELECT event_type AS grp,
             CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ), cells AS (
      SELECT grp, v, count(*) AS c FROM x GROUP BY grp, v
    ), vals AS (
      SELECT v, sum(c) AS t FROM cells GROUP BY v
    ), cum AS (
      SELECT v, t,
             coalesce(sum(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM vals
    ), ranked AS (
      SELECT cells.grp, cells.c,
             2 * cum.below + cum.t + 1 AS m2
      FROM cells JOIN cum USING (v)
    ), pergrp AS (
      SELECT grp, sum(c) AS n_j, sum(m2 * c) AS r2_j
      FROM ranked GROUP BY grp
    ), ties AS (
      SELECT sum(t * t * t - t) AS tie_sum, sum(t) AS n FROM vals
    ), fin AS (
      SELECT count(*) AS k, any_value(ties.n) AS n,
             sum((CAST(r2_j AS DOUBLE) / 2) * (CAST(r2_j AS DOUBLE) / 2) / n_j)
               AS sum_rj2_nj,
             any_value(CAST(ties.tie_sum AS DOUBLE)) AS tie_sum
      FROM pergrp, ties
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n_total,
           round((12.0 / (CAST(n AS DOUBLE) * (n + 1)) * sum_rj2_nj
                  - 3.0 * (n + 1))
                 / (1 - tie_sum / (CAST(n AS DOUBLE) * n * n - n)), 6)
             AS h_stat
    FROM fin
    """,
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H test of event VALUE distributions across event
    types — 'do the groups come from the same distribution' without
    ANOVA's normality assumption. Values pre-quantize to cents (the
    documented value-grain pre-binning route), midranks are doubled
    integers from cumulative value-grain counts, rank sums are exact
    (decimal/hugeint), and the tie-corrected H is assembled from those
    integers — the stats_anova_oneway companion a skewed metric needs.
    Planted closed-form pin (distinct values, no ties) in tests.

    Scale: two hash aggs (cells, value grain) + one value-grain
    cumulative window + a k-row final; the corpus is never row-ranked
    (the ml_auc_roc discipline — ranking collapses to counting)."""
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = e.select(
        F.col("event_type").alias("grp"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    )
    cells = x.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("c"))
    vals = cells.groupBy("v").agg(F.sum("c").alias("t"))
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vals.select(
        "v", "t", F.coalesce(F.sum("t").over(wcum), F.lit(0)).alias("below")
    )
    ranked = cells.join(cum, "v").select(
        "grp", "c", (2 * F.col("below") + F.col("t") + 1).alias("m2")
    )
    pergrp = ranked.groupBy("grp").agg(
        F.sum("c").alias("n_j"),
        F.sum((F.col("m2") * F.col("c")).cast("decimal(38,0)"))
        .cast("double")
        .alias("r2_j_d"),
    )
    ties = vals.agg(
        F.sum(
            (F.col("t") * F.col("t") * F.col("t") - F.col("t")).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("tie_sum"),
        F.sum("t").alias("n"),
    )
    fin = pergrp.crossJoin(F.broadcast(ties)).agg(
        F.count(F.lit(1)).alias("k"),
        F.any_value(F.col("n")).alias("n"),
        F.sum(
            (F.col("r2_j_d") / 2) * (F.col("r2_j_d") / 2) / F.col("n_j")
        ).alias("sum_rj2_nj"),
        F.any_value(F.col("tie_sum")).alias("tie_sum"),
    )
    nd = F.col("n").cast("double")
    return fin.select(
        bi(F.col("k")).alias("k"),
        bi(F.col("n")).alias("n_total"),
        r6(
            (
                F.lit(12.0) / (nd * (F.col("n") + 1)) * F.col("sum_rj2_nj")
                - F.lit(3.0) * (F.col("n") + 1)
            )
            / (1 - F.col("tie_sum") / (nd * F.col("n") * F.col("n") - F.col("n")))
        ).alias("h_stat"),
    )
