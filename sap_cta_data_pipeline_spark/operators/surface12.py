"""§2 round-6 batch BY — held-out perplexity filtering, causal DiD,
forecast backtesting (plus multimodal_bmp_codec in multimodal_ops.py).

- ``text_perplexity_filter``: the CCNet-style quality gate — train an
  add-k bigram LM on the EVEN half of each language, score the ODD half,
  flag the worst decile. Distinct from text_lm_bigram_score (self-scored
  MLE): held-out scoring with smoothing is what production filters run,
  because self-scoring rewards repetition.
- ``events_did_estimator``: difference-in-differences over the event
  stream (treatment = user parity, pre/post = timeline midpoint):
  the four cell means, the DiD point estimate, and its pooled SE — the
  experiment-analysis lane beyond a plain t-test.
- ``events_forecast_snaive``: seasonal-naive (lag-7) backtest per event
  type over the final 28 days — MAE / MAPE / bias. The baseline every
  forecasting system must beat; calendar-joined so date gaps never
  misalign the lag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_ADD_K = 0.1


@query(
    "text_perplexity_filter",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, doc_id % 2 AS split,
             list_filter(string_split(text, ' '), x -> x != '') AS ws
      FROM documents
    ),
    zipped AS (
      SELECT doc_id, lang, split,
             unnest(list_zip(list_slice(ws, 1, len(ws) - 1),
                             list_slice(ws, 2, len(ws)))) AS g
      FROM tok WHERE len(ws) >= 2
    ),
    grams AS (
      SELECT doc_id, lang, split, g[1] AS w1, g[2] AS w2
      FROM zipped
    ),
    c2 AS (
      SELECT lang, w1, w2, count(*) AS c2
      FROM grams WHERE split = 0 GROUP BY 1, 2, 3
    ),
    c1 AS (
      SELECT lang, w1, count(*) AS c1
      FROM grams WHERE split = 0 GROUP BY 1, 2
    ),
    vocab AS (
      SELECT lang, count(DISTINCT w2) AS v
      FROM grams WHERE split = 0 GROUP BY 1
    ),
    scored AS (
      SELECT g.doc_id, g.lang,
             ln((coalesce(c2.c2, 0) + {_ADD_K})
                / (coalesce(c1.c1, 0) + {_ADD_K} * v.v)) AS logp
      FROM grams g
      LEFT JOIN c2 ON c2.lang = g.lang AND c2.w1 = g.w1 AND c2.w2 = g.w2
      LEFT JOIN c1 ON c1.lang = g.lang AND c1.w1 = g.w1
      JOIN vocab v ON v.lang = g.lang
      WHERE g.split = 1
    ),
    per_doc AS (
      SELECT doc_id, lang, count(*) AS n_bigrams,
             exp(-avg(logp)) AS ppl
      FROM scored GROUP BY 1, 2
    ),
    ranked AS (
      SELECT doc_id, lang, n_bigrams, ppl,
             percent_rank() OVER (PARTITION BY lang ORDER BY ppl, doc_id) AS pr
      FROM per_doc
    )
    SELECT doc_id, lang, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           round(ppl, 6) AS perplexity,
           pr >= 0.9 AS flag_worst_decile
    FROM ranked
    """,
)
def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out perplexity quality filter: an add-k (k=0.1) bigram LM
    trained per language on EVEN doc_ids scores ODD doc_ids; docs in the
    worst decile per language are flagged. Unseen bigrams back off to
    k/(c1 + k·V); unseen contexts to 1/V — the smoothing that makes a
    held-out filter possible at all (MLE would emit −∞). Shapes: in-row
    bigram construction (no token self-join), two train-count tables
    joined back on (lang, w1[, w2]) — broadcast when vocab-sized — and
    one per-lang percent_rank window at doc grain."""
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    grams_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    grams = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % 2).alias("split"),
        F.explode(grams_arr).alias("g"),
    ).select("doc_id", "lang", "split", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    train = grams.where(F.col("split") == 0)
    c2 = train.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = train.groupBy("lang", "w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = train.groupBy("lang").agg(F.countDistinct("w2").alias("v"))
    test = grams.where(F.col("split") == 1)
    scored = (
        test.join(c2, ["lang", "w1", "w2"], "left")
        .join(c1, ["lang", "w1"], "left")
        .join(F.broadcast(vocab), "lang")
        .select(
            "doc_id",
            "lang",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + _ADD_K)
                / (F.coalesce(F.col("c1"), F.lit(0)) + _ADD_K * F.col("v"))
            ).alias("logp"),
        )
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.exp(-F.avg("logp")).alias("ppl"),
    )
    w = Window.partitionBy("lang").orderBy("ppl", "doc_id")
    return per_doc.withColumn("pr", F.percent_rank().over(w)).select(
        "doc_id",
        "lang",
        bi(F.col("n_bigrams")).alias("n_bigrams"),
        r6(F.col("ppl")).alias("perplexity"),
        (F.col("pr") >= 0.9).alias("flag_worst_decile"),
    )


@query(
    "events_did_estimator",
    oracle="""
    WITH mid AS (
      SELECT CAST(min(epoch_us(ts)) AS DOUBLE)
             + (CAST(max(epoch_us(ts)) AS DOUBLE)
                - CAST(min(epoch_us(ts)) AS DOUBLE)) / 2 AS m
      FROM events
    ),
    cells AS (
      SELECT user_id % 2 = 1 AS treated,
             CAST(epoch_us(ts) AS DOUBLE) >= (SELECT m FROM mid) AS post,
             count(*) AS n,
             avg(value) AS mean_v,
             var_samp(value) AS var_v
      FROM events GROUP BY 1, 2
    )
    SELECT
      CAST(sum(n) AS BIGINT) AS n_events,
      round(max(CASE WHEN treated AND post THEN mean_v END), 6)          AS treat_post,
      round(max(CASE WHEN treated AND NOT post THEN mean_v END), 6)      AS treat_pre,
      round(max(CASE WHEN NOT treated AND post THEN mean_v END), 6)      AS ctrl_post,
      round(max(CASE WHEN NOT treated AND NOT post THEN mean_v END), 6)  AS ctrl_pre,
      round(
        (max(CASE WHEN treated AND post THEN mean_v END)
         - max(CASE WHEN treated AND NOT post THEN mean_v END))
        - (max(CASE WHEN NOT treated AND post THEN mean_v END)
           - max(CASE WHEN NOT treated AND NOT post THEN mean_v END)), 6) AS did,
      round(sqrt(sum(var_v / n)), 6) AS se_did
    FROM cells
    """,
)
def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on the event stream: treatment = user
    parity, pre/post = the timeline midpoint; emits the four cell means,
    DiD = (T_post − T_pre) − (C_post − C_pre), and the independent-cells
    SE √(Σ s²ᵢ/nᵢ) — the estimator layout every experiment readout
    shows. One keyed agg to 4 cells + a 1-row fold; the midpoint is a
    scalar broadcast, never a second corpus pass."""
    from ..functions.parity import um

    e = t(spark, sf_dir, "events")
    mid = e.agg(
        (
            um(F.min("ts")).cast("double")
            + (um(F.max("ts")).cast("double") - um(F.min("ts")).cast("double")) / 2
        ).alias("m")
    )
    cells = (
        e.crossJoin(F.broadcast(mid))
        .select(
            (F.col("user_id") % 2 == 1).alias("treated"),
            (um("ts").cast("double") >= F.col("m")).alias("post"),
            "value",
        )
        .groupBy("treated", "post")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("mean_v"),
            F.var_samp("value").alias("var_v"),
        )
    )
    pick = lambda tr, po: F.max(
        F.when((F.col("treated") == tr) & (F.col("post") == po), F.col("mean_v"))
    )
    return cells.agg(
        F.sum("n").cast("bigint").alias("n_events"),
        r6(pick(True, True)).alias("treat_post"),
        r6(pick(True, False)).alias("treat_pre"),
        r6(pick(False, True)).alias("ctrl_post"),
        r6(pick(False, False)).alias("ctrl_pre"),
        r6(
            (pick(True, True) - pick(True, False))
            - (pick(False, True) - pick(False, False))
        ).alias("did"),
        r6(F.sqrt(F.sum(F.col("var_v") / F.col("n")))).alias("se_did"),
    )


@query(
    "events_forecast_snaive",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ),
    horizon AS (SELECT max(day) AS last_day FROM daily),
    test AS (
      SELECT d.event_type, d.day, d.c, p.c AS pred
      FROM daily d
      JOIN horizon h ON d.day > h.last_day - 28
      LEFT JOIN daily p ON p.event_type = d.event_type
                       AND p.day = d.day - 7
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(abs(c - pred)), 6) AS mae,
           round(avg(abs(c - pred) / c), 6) AS mape,
           round(avg(pred - c), 6) AS bias
    FROM test WHERE pred IS NOT NULL
    GROUP BY 1
    """,
)
def events_forecast_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest: predict each of the last 28 days' counts
    with the count 7 days earlier, per event type; report MAE / MAPE /
    bias. The baseline any forecasting system must beat before it ships
    — and the same calendar-join discipline as ts_autocorr_lag (a date
    gap yields a NULL prediction, excluded, never a shifted one). Day
    rollup + broadcast horizon + one self-join on (type, day−7)."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    horizon = daily.agg(F.max("day").alias("last_day"))
    pred = daily.select(
        F.col("event_type").alias("et_p"),
        F.col("day").alias("day_p"),
        F.col("c").alias("pred"),
    )
    test = (
        daily.crossJoin(F.broadcast(horizon))
        .where(F.col("day") > F.date_sub("last_day", 28))
        .join(
            pred,
            (F.col("et_p") == F.col("event_type"))
            & (F.col("day_p") == F.date_sub("day", 7)),
            "left",
        )
        .where(F.col("pred").isNotNull())
    )
    return test.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        r6(F.avg(F.abs(F.col("c") - F.col("pred")))).alias("mae"),
        r6(F.avg(F.abs(F.col("c") - F.col("pred")) / F.col("c"))).alias("mape"),
        r6(F.avg(F.col("pred") - F.col("c"))).alias("bias"),
    )
