"""§2 round-7 batch CP — multi-touch attribution & threshold choice.

Completes the marketing-attribution surface (events_attribution_lasttouch,
quality.py) with the three multi-touch models an analyst compares before
trusting any of them, plus the operating-point chooser for the ml_eval
lane:

- LINEAR (every touch in the window splits the conversion evenly),
- POSITION-based / U-shaped (40% first touch, 40% last, 20% split
  across the middle; degenerate cases: 1 touch → 100%, 2 → 50/50),
- TIME-DECAY (exponential half-life of 1 day, normalized per
  conversion),
- the optimal-threshold scan: max-F1 and max-Youden-J operating points
  from ONE pass over the score axis.

All three attribution models share one skeleton: purchases joined to
their user's strictly-prior non-purchase touches within 7 days (a keyed
join with a residual time predicate — the join key is user_id, so the
shuffle is user-keyed and the window functions after it reuse the same
partitioning), then per-purchase rank/count windows, then a channel-
grain rollup. Credits are deterministic arithmetic on epoch-microsecond
BIGINTs; only the final channel sums are floats (r6-rounded).

Scale: touches-per-purchase is bounded by user activity in a 7-day
window (the same bound events_attribution_lasttouch relies on); the
channel rollup is O(channels). The threshold scan is the ml_auc_roc
shape: score-grain cumulative windows, O(distinct scores) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_WEEK_US = 7 * 24 * 3600 * 1_000_000

#: shared SQL skeleton: (purchase_id, user_id, channel, rank_asc,
#: rank_desc, n_touches, gap_us) for every qualifying touch
_TOUCH_CTE = f"""
    ev AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events
    ),
    tp AS (
      SELECT p.event_id AS purchase_id, p.user_id,
             e.event_type AS channel, e.t AS touch_t, p.t AS conv_t
      FROM ev p JOIN ev e
        ON p.user_id = e.user_id
       AND e.event_type <> 'purchase'
       AND (e.t < p.t OR (e.t = p.t AND e.event_id < p.event_id))
       AND p.t - e.t <= {_WEEK_US}
      WHERE p.event_type = 'purchase'
    ),
    rk AS (
      SELECT *,
             row_number() OVER (PARTITION BY purchase_id
                                ORDER BY touch_t, channel) AS rank_asc,
             row_number() OVER (PARTITION BY purchase_id
                                ORDER BY touch_t DESC, channel DESC) AS rank_desc,
             count(*) OVER (PARTITION BY purchase_id) AS n_touches,
             conv_t - touch_t AS gap_us
      FROM tp
    )
"""


def _touches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared touchpoint frame under all three models."""
    e = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("t").alias("conv_t"),
    )
    tch = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
        F.col("t").alias("touch_t"),
    )
    tp = p.join(
        tch,
        (p.pu == tch.user_id)
        & (
            (tch.touch_t < p.conv_t)
            | ((tch.touch_t == p.conv_t) & (tch.touch_id < p.purchase_id))
        )
        & (p.conv_t - tch.touch_t <= _WEEK_US),
    ).select("purchase_id", "user_id", "channel", "touch_t", "conv_t")
    wp = Window.partitionBy("purchase_id")
    return tp.select(
        "purchase_id",
        "user_id",
        "channel",
        F.row_number()
        .over(wp.orderBy("touch_t", "channel"))
        .alias("rank_asc"),
        F.row_number()
        .over(wp.orderBy(F.col("touch_t").desc(), F.col("channel").desc()))
        .alias("rank_desc"),
        F.count(F.lit(1)).over(wp).alias("n_touches"),
        (F.col("conv_t") - F.col("touch_t")).alias("gap_us"),
    )


def _rollup(credited: DataFrame) -> DataFrame:
    return credited.groupBy("channel").agg(
        r6(F.sum("credit")).alias("total_credit"),
        bi(F.count(F.lit(1))).alias("n_touches"),
        bi(F.countDistinct("purchase_id")).alias("n_conversions_touched"),
    )


_ROLLUP_SQL = """
    SELECT channel,
           round(sum(credit), 6) AS total_credit,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_conversions_touched
    FROM credited GROUP BY 1
"""


@query(
    "events_attribution_linear",
    oracle=f"""
    WITH {_TOUCH_CTE},
    credited AS (
      SELECT purchase_id, channel, 1.0 / n_touches AS credit FROM rk
    )
    {_ROLLUP_SQL}
    """,
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch: each of a conversion's touches gets 1/n of
    the credit. The baseline every other model is compared against —
    per-channel totals answer 'what share of conversions does each
    channel participate in, participation-weighted'."""
    tp = _touches(spark, sf_dir)
    credited = tp.select(
        "purchase_id", "channel", (F.lit(1.0) / F.col("n_touches")).alias("credit")
    )
    return _rollup(credited)


@query(
    "events_attribution_position",
    oracle=f"""
    WITH {_TOUCH_CTE},
    credited AS (
      SELECT purchase_id, channel,
             CASE WHEN n_touches = 1 THEN 1.0
                  WHEN n_touches = 2 THEN 0.5
                  WHEN rank_asc = 1 OR rank_desc = 1 THEN 0.4
                  ELSE 0.2 / (n_touches - 2) END AS credit
      FROM rk
    )
    {_ROLLUP_SQL}
    """,
)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) attribution: 40% to the first touch,
    40% to the last, 20% split across the middle — the model that prices
    discovery and closing above nurturing. Degenerate windows follow the
    standard convention (one touch → 100%, two → 50/50). Ranks come from
    the shared (touch_t, channel) tie-broken row_number, so credit is
    deterministic under timestamp ties."""
    tp = _touches(spark, sf_dir)
    credit = (
        F.when(F.col("n_touches") == 1, 1.0)
        .when(F.col("n_touches") == 2, 0.5)
        .when((F.col("rank_asc") == 1) | (F.col("rank_desc") == 1), 0.4)
        .otherwise(0.2 / (F.col("n_touches") - 2))
    )
    credited = tp.select("purchase_id", "channel", credit.alias("credit"))
    return _rollup(credited)


@query(
    "events_attribution_timedecay",
    oracle=f"""
    WITH {_TOUCH_CTE},
    wgt AS (
      SELECT purchase_id, channel,
             pow(0.5, gap_us / 86400000000.0) AS w
      FROM rk
    ),
    credited AS (
      SELECT purchase_id, channel,
             w / sum(w) OVER (PARTITION BY purchase_id) AS credit
      FROM wgt
    )
    {_ROLLUP_SQL}
    """,
)
def events_attribution_timedecay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution with a 1-day half-life: touch weight
    2^(−gap_days), normalized per conversion — recency-priced credit.
    The per-purchase normalizer is a purchase-keyed window over the
    touch frame (same partitioning as the rank windows: no extra
    shuffle)."""
    tp = _touches(spark, sf_dir)
    w = F.pow(F.lit(0.5), F.col("gap_us") / F.lit(86_400_000_000.0))
    wgt = tp.select("purchase_id", "channel", w.alias("w"))
    norm = Window.partitionBy("purchase_id")
    credited = wgt.select(
        "purchase_id",
        "channel",
        (F.col("w") / F.sum("w").over(norm)).alias("credit"),
    )
    return _rollup(credited)


@query(
    "ml_threshold_optimal",
    oracle="""
    WITH s AS (
      SELECT least(value / 500.0, 0.999999) AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events
    ),
    g AS (
      SELECT score, count(*) * 1.0 AS n, sum(label) * 1.0 AS pos
      FROM s GROUP BY score
    ),
    c AS (
      SELECT score,
             sum(pos) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             sum(n - pos) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
             (SELECT sum(pos) FROM g) AS all_pos,
             (SELECT sum(n - pos) FROM g) AS all_neg
      FROM g
    ),
    m AS (
      SELECT score AS threshold,
             2 * tp / (2 * tp + fp + (all_pos - tp)) AS f1,
             tp / all_pos + (all_neg - fp) / all_neg - 1 AS youden_j
      FROM c
    )
    SELECT * FROM (
      SELECT 'max_f1' AS criterion,
             round(threshold, 6) AS threshold, round(f1, 6) AS metric
      FROM m ORDER BY f1 DESC, threshold DESC LIMIT 1
    )
    UNION ALL
    SELECT * FROM (
      SELECT 'max_youden_j', round(threshold, 6), round(youden_j, 6)
      FROM m ORDER BY youden_j DESC, threshold DESC LIMIT 1
    )
    """,
)
def ml_threshold_optimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal operating points in one pass: aggregate to the score
    grain, cumulative TP/FP windows down the sorted score axis (the
    ml_auc_roc machinery), then argmax F1 and argmax Youden's J
    (sensitivity + specificity − 1) with a deterministic
    highest-threshold tiebreak. 'Which threshold should we ship' is THE
    question after every ml_confusion_threshold sweep — this answers it
    without a 9-point grid, exactly, at O(distinct scores)."""
    e = t(spark, sf_dir, "events")
    score = F.least(F.col("value") / 500.0, F.lit(0.999999))
    label = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    g = (
        e.select(score.alias("score"), label.alias("label"))
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("label").cast("double").alias("pos"),
        )
    )
    wcum = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = g.agg(
        F.sum("pos").alias("all_pos"),
        F.sum(F.col("n") - F.col("pos")).alias("all_neg"),
    )
    c = g.select(
        "score",
        F.sum("pos").over(wcum).alias("tp"),
        F.sum(F.col("n") - F.col("pos")).over(wcum).alias("fp"),
    ).crossJoin(F.broadcast(tot))
    m = c.select(
        F.col("score").alias("threshold"),
        (
            2 * F.col("tp")
            / (2 * F.col("tp") + F.col("fp") + (F.col("all_pos") - F.col("tp")))
        ).alias("f1"),
        (
            F.col("tp") / F.col("all_pos")
            + (F.col("all_neg") - F.col("fp")) / F.col("all_neg")
            - 1
        ).alias("youden_j"),
    )
    best_f1 = (
        m.orderBy(F.col("f1").desc(), F.col("threshold").desc())
        .limit(1)
        .select(
            F.lit("max_f1").alias("criterion"),
            r6(F.col("threshold")).alias("threshold"),
            r6(F.col("f1")).alias("metric"),
        )
    )
    best_j = (
        m.orderBy(F.col("youden_j").desc(), F.col("threshold").desc())
        .limit(1)
        .select(
            F.lit("max_youden_j").alias("criterion"),
            r6(F.col("threshold")).alias("threshold"),
            r6(F.col("youden_j")).alias("metric"),
        )
    )
    return best_f1.unionByName(best_j)
