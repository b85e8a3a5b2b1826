"""§2 batch AF (round 3) — model-evaluation lane.

A training pipeline doesn't stop at features: it scores models and the
scoring itself must be distributed. Two canonical evaluation shapes over
the events stream (score = value/500 clipped to [0,1), label =
purchase — a deterministic stand-in wired exactly like a real model
score column):

- `ml_calibration_bins` — reliability diagram: fixed-width score bins,
  mean predicted score vs observed event rate per bin (+ counts). Fixed
  bins, NOT quantile bins, deliberately: quantile binning needs a global
  sort or quantile pass, fixed-width binning is a projection — the same
  swap agg_percentile_bands documents, here applied to model eval.
- `ml_confusion_threshold` — threshold sweep: confusion matrix +
  precision/recall/F1 at 9 operating points in ONE scan — thresholds are
  a broadcast grid cross-joined in (same shape as pipe_param_sweep), so
  adding operating points costs zero extra scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

#: score normalization: events.value ∈ [0, ~500) → [0, 1); the clip
#: bound and bin count are part of the eval contract.
_SCORE_DIV = 500.0
_N_BINS = 10


@query(
    "ml_calibration_bins",
    oracle=f"""
    WITH s AS (
      SELECT least(value / {_SCORE_DIV}, 0.999999) AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events
    )
    SELECT CAST(floor(score * {_N_BINS}) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(score), 6) AS mean_score,
           round(avg(label), 6) AS event_rate
    FROM s
    GROUP BY 1
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins: decile-width score bins, per-bin mean
    predicted score vs observed positive rate — calibration drift is
    |mean_score − event_rate|. Binning is a PROJECTION (floor of a
    scaled score), so the whole eval is scan → project → 10-key hash
    agg: one shuffle whose reduce side is _N_BINS rows however large the
    scored corpus. The quantile-binned variant would need a global
    quantile pass first — fixed bins are the at-scale default
    (SCALE.md: agg_percentile_bands names the same trade)."""
    e = t(spark, sf_dir, "events")
    score = F.least(F.col("value") / _SCORE_DIV, F.lit(0.999999))
    label = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    return (
        e.select(score.alias("score"), label.alias("label"))
        .groupBy(bi(F.floor(F.col("score") * _N_BINS)).alias("bin"))
        .agg(
            bi(F.count(F.lit(1))).alias("n"),
            r6(F.avg("score")).alias("mean_score"),
            r6(F.avg("label")).alias("event_rate"),
        )
    )


@query(
    "ml_confusion_threshold",
    oracle=f"""
    WITH s AS (
      SELECT least(value / {_SCORE_DIV}, 0.999999) AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events
    ),
    g AS (SELECT k / 10.0 AS threshold FROM range(1, 10) t(k)),
    m AS (
      SELECT g.threshold,
             sum(CASE WHEN s.score >= g.threshold AND s.label = 1 THEN 1 ELSE 0 END) AS tp,
             sum(CASE WHEN s.score >= g.threshold AND s.label = 0 THEN 1 ELSE 0 END) AS fp,
             sum(CASE WHEN s.score <  g.threshold AND s.label = 1 THEN 1 ELSE 0 END) AS fn,
             sum(CASE WHEN s.score <  g.threshold AND s.label = 0 THEN 1 ELSE 0 END) AS tn
      FROM s CROSS JOIN g
      GROUP BY g.threshold
    )
    SELECT round(threshold, 6) AS threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CASE WHEN tp + fp > 0 THEN round(tp / (tp + fp), 6) END AS precision,
           CASE WHEN tp + fn > 0 THEN round(tp / (tp + fn), 6) END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN round(2.0 * tp / (2 * tp + fp + fn), 6) END AS f1
    FROM m
    """,
)
def ml_confusion_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep: confusion matrix and precision/recall/F1 at
    thresholds 0.1…0.9, computed in ONE scan — the 9-row threshold grid
    is broadcast cross-joined onto the scored stream (pipe_param_sweep's
    shape) and everything reduces in a 9-key hash agg. The naive
    formulation re-scans the corpus per threshold; this one's cost is
    constant in the number of operating points, which is what makes
    dense PR curves affordable at 100 TB. F1 uses the 2tp/(2tp+fp+fn)
    form — defined even when precision or recall individually is not."""
    e = t(spark, sf_dir, "events")
    score = F.least(F.col("value") / _SCORE_DIV, F.lit(0.999999))
    label = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    s = e.select(score.alias("score"), label.alias("label"))
    grid = spark.range(1, 10).select((F.col("id") / 10.0).alias("threshold"))
    pred = (F.col("score") >= F.col("threshold")).cast("int")
    m = (
        s.crossJoin(F.broadcast(grid))
        .groupBy("threshold")
        .agg(
            F.sum(pred * F.col("label")).alias("tp"),
            F.sum(pred * (1 - F.col("label"))).alias("fp"),
            F.sum((1 - pred) * F.col("label")).alias("fn"),
            F.sum((1 - pred) * (1 - F.col("label"))).alias("tn"),
        )
    )
    tp, fp, fn, tn = (F.col(c) for c in ("tp", "fp", "fn", "tn"))
    return m.select(
        r6(F.col("threshold")).alias("threshold"),
        bi(tp).alias("tp"),
        bi(fp).alias("fp"),
        bi(fn).alias("fn"),
        bi(tn).alias("tn"),
        F.when(tp + fp > 0, r6(tp / (tp + fp))).alias("precision"),
        F.when(tp + fn > 0, r6(tp / (tp + fn))).alias("recall"),
        F.when(2 * tp + fp + fn > 0, r6(2.0 * tp / (2 * tp + fp + fn))).alias("f1"),
    )
