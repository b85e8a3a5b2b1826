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


# ------------------------------------------------------- round-6 batch BZ


@query(
    "orders_duplicate_invoice_detect",
    oracle="""
    SELECT a.o_orderkey AS orderkey_a,
           b.o_orderkey AS orderkey_b,
           a.o_custkey AS custkey,
           round(a.o_totalprice, 2) AS price_a,
           round(b.o_totalprice, 2) AS price_b,
           CAST(date_diff('day', a.o_orderdate, b.o_orderdate) AS BIGINT) AS day_gap
    FROM orders a
    JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND date_diff('day', a.o_orderdate, b.o_orderdate) BETWEEN 0 AND 30
     AND abs(a.o_totalprice - b.o_totalprice)
         / greatest(a.o_totalprice, b.o_totalprice) < 0.02
    """,
)
def orders_duplicate_invoice_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-invoice screening — the finance-audit dedup: order pairs
    from the SAME customer within 30 days whose totals differ by < 2%
    (double-billing / replay / correction candidates). The self-join is
    keyed on custkey alone — ONE co-partitioning shuffle — with the
    date window and amount tolerance as residual predicates; the per-key
    pair blowup is bounded by orders-per-customer-per-month, not corpus
    size, so the output stays audit-sized at 100 TB. Hot customers are
    exactly the join_salted_skew scenario; the salting twin applies
    unchanged."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    a = o.select(
        F.col("o_orderkey").alias("orderkey_a"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("price_a"),
        F.col("o_orderdate").alias("date_a"),
    )
    b = o.select(
        F.col("o_orderkey").alias("orderkey_b"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("price_b"),
        F.col("o_orderdate").alias("date_b"),
    )
    return (
        a.join(b, ["custkey"])
        .where(
            (F.col("orderkey_a") < F.col("orderkey_b"))
            & (F.datediff("date_b", "date_a") >= 0)
            & (F.datediff("date_b", "date_a") <= 30)
            & (
                F.abs(F.col("price_a") - F.col("price_b"))
                / F.greatest("price_a", "price_b")
                < 0.02
            )
        )
        .select(
            "orderkey_a",
            "orderkey_b",
            "custkey",
            F.round("price_a", 2).alias("price_a"),
            F.round("price_b", 2).alias("price_b"),
            F.datediff("date_b", "date_a").cast("bigint").alias("day_gap"),
        )
    )


@query(
    "dq_outlier_iqr",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY 1
    )
    SELECT e.event_type AS event_type,
           round(max(q.q1), 6) AS q1,
           round(max(q.q3), 6) AS q3,
           round(max(q.q3 - q.q1), 6) AS iqr,
           CAST(sum(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(sum(CASE WHEN e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events e JOIN q ON q.event_type = e.event_type
    GROUP BY 1
    """,
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per event type: exact interpolated
    quartiles (Spark `percentile` ≡ DuckDB `quantile_cont`, linear
    interpolation — the r6 hash certifies the two engines' quantile
    DEFINITIONS agree, not just the counts), then counts outside
    [q1−1.5·IQR, q3+1.5·IQR]. Two passes by construction — fences need
    the quartiles first — with the ≤|types|-row quartile frame broadcast
    back; the quantile itself is Spark's exact percentile aggregate,
    the documented swap being agg_quantile_approx/mergeable when ±ε
    suffices at corpus scale."""
    e = t(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    j = e.join(F.broadcast(q), "event_type")
    iqr = F.col("q3") - F.col("q1")
    return j.groupBy("event_type").agg(
        r6(F.max("q1")).alias("q1"),
        r6(F.max("q3")).alias("q3"),
        r6(F.max(iqr)).alias("iqr"),
        F.sum(
            F.when(F.col("value") < F.col("q1") - 1.5 * iqr, 1).otherwise(0)
        ).cast("bigint").alias("n_low"),
        F.sum(
            F.when(F.col("value") > F.col("q3") + 1.5 * iqr, 1).otherwise(0)
        ).cast("bigint").alias("n_high"),
    )




def _lpa(ud: DataFrame, rounds: int = 4) -> DataFrame:
    """Synchronous label-propagation loop over a symmetric edge list
    (u, v): returns (node, label). Module-level so tests can drive it
    with planted graphs."""
    ud = ud.localCheckpoint(eager=True)
    labels = ud.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(rounds):
        votes = (
            ud.join(labels, ud.v == labels.node)
            .groupBy(F.col("u"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.groupBy("u")
            .agg(F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("m"))
            .select(F.col("u").alias("node"), (-F.col("m.nl")).alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


@query("graph_label_propagation")  # rows-only: iterative fixpoint heuristic
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (4 rounds) over the co-purchase
    graph — the near-linear community-detection baseline: every node
    adopts the most frequent label among its neighbors each round
    (deterministic tiebreak: smaller label wins), labels init to node
    ids. Per round: ONE edge-keyed shuffle (labels ⋈ edges) + one
    (node, label) count agg + an in-group argmax — the LPA schedule that
    scales to web graphs because state is one label per node, never
    neighborhoods. Emits (community, n_members, min/max node) at the
    community grain. Rows-only (iterative heuristic); determinism and
    planted two-clique separation pinned in tests."""
    from .graph_ops import _edges

    e = _edges(spark, sf_dir)
    ud = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = _lpa(ud, rounds=4)
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("node").cast("bigint").alias("min_node"),
        F.max("node").cast("bigint").alias("max_node"),
    ).select(F.col("label").cast("bigint").alias("community"), "n_members", "min_node", "max_node")
