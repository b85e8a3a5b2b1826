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


@query(
    "ml_auc_roc",
    oracle="""
    WITH s AS (
      SELECT value AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events
    ), v AS (
      SELECT score,
             CAST(sum(label) AS BIGINT)     AS n_pos,
             CAST(count(*) - sum(label) AS BIGINT) AS n_neg
      FROM s GROUP BY score
    ), c AS (
      SELECT score, n_pos, n_neg,
             coalesce(sum(n_pos + n_neg) OVER (
               ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM v
    ), agg AS (
      SELECT sum(n_pos * (cum_before + (n_pos + n_neg + 1) / 2.0)) AS rank_sum,
             sum(n_pos) AS p, sum(n_neg) AS n
      FROM c
    )
    SELECT CAST(p AS BIGINT) AS n_pos,
           CAST(n AS BIGINT) AS n_neg,
           round((rank_sum - p * (p + 1) / 2.0) / (p * n), 6) AS auc
    FROM agg
    """,
)
def ml_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney rank-sum with midrank tie
    handling — the eval a ranking model ships with, computed WITHOUT
    materializing per-row ranks: the corpus collapses to the DISTINCT-
    score grain first (per value: positive/negative counts — one keyed
    hash agg), and average ranks fall out of a running count over that
    value-grain table. AUC = (Σ_pos midrank − P(P+1)/2) / (P·N); ranks
    are integers/half-integers so the arithmetic is exact on both
    engines. The value-grain running window is single-partition by
    construction (§R class 3: post-agg, bounded by distinct-score
    cardinality, never row count); at 100 TB with unbounded-cardinality
    scores the documented swap is fixed-resolution score binning
    (ml_calibration_bins' projection shape) which bounds the grain and
    gives AUC to bin precision."""
    e = t(spark, sf_dir, "events")
    s = e.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    v = s.groupBy("score").agg(
        bi(F.sum("label")).alias("n_pos"),
        bi(F.count(F.lit(1)) - F.sum("label")).alias("n_neg"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    c = v.select(
        "n_pos",
        "n_neg",
        F.coalesce(F.sum(F.col("n_pos") + F.col("n_neg")).over(w), F.lit(0)).alias(
            "cum_before"
        ),
    )
    agg = c.agg(
        F.sum(
            F.col("n_pos")
            * (F.col("cum_before") + (F.col("n_pos") + F.col("n_neg") + 1) / 2.0)
        ).alias("rank_sum"),
        F.sum("n_pos").alias("p"),
        F.sum("n_neg").alias("n"),
    )
    return agg.select(
        bi(F.col("p")).alias("n_pos"),
        bi(F.col("n")).alias("n_neg"),
        r6(
            (F.col("rank_sum") - F.col("p") * (F.col("p") + 1) / 2.0)
            / (F.col("p") * F.col("n"))
        ).alias("auc"),
    )


@query(
    "ml_ks_test",
    oracle="""
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS in_a,
             CASE WHEN event_type = 'view'  THEN 1 ELSE 0 END AS in_b
      FROM events
      WHERE event_type IN ('click', 'view')
    ), v AS (
      SELECT value,
             CAST(sum(in_a) AS BIGINT) AS na,
             CAST(sum(in_b) AS BIGINT) AS nb
      FROM s GROUP BY value
    ), c AS (
      SELECT value,
             sum(na) OVER (ORDER BY value) AS cum_a,
             sum(nb) OVER (ORDER BY value) AS cum_b,
             (SELECT sum(na) FROM v) AS tot_a,
             (SELECT sum(nb) FROM v) AS tot_b
      FROM v
    ), d AS (
      SELECT value,
             abs(CAST(cum_a AS DOUBLE) / tot_a
                 - CAST(cum_b AS DOUBLE) / tot_b) AS diff,
             tot_a, tot_b
      FROM c
    )
    SELECT CAST(max(tot_a) AS BIGINT) AS n_a,
           CAST(max(tot_b) AS BIGINT) AS n_b,
           round(max(diff), 6) AS ks_stat,
           round(min(CASE WHEN diff = (SELECT max(diff) FROM d)
                          THEN value END), 6) AS ks_at_value
    FROM d
    """,
)
def ml_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic (click-vs-view value
    distributions): D = max over the merged support of |F_A − F_B|, plus
    the location where the max is attained (smallest such value — the
    deterministic tiebreak). Distribution-drift detection in one value-
    grain pass: corpus → distinct-value counts (keyed agg), running
    CDFs over the value grain, max-reduce. Every CDF step is an integer
    count divided by an integer total — both engines compute identical
    doubles, so the argmax equality predicate carries no float hazard.
    Same §R class-3 value-grain window + at-scale binning swap as
    ml_auc_roc."""
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    s = e.select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("in_a"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("in_b"),
    )
    v = s.groupBy("value").agg(
        bi(F.sum("in_a")).alias("na"), bi(F.sum("in_b")).alias("nb")
    )
    from pyspark.sql import Window

    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    totals = v.agg(
        F.sum("na").alias("tot_a"), F.sum("nb").alias("tot_b")
    )
    c = (
        v.select(
            "value",
            F.sum("na").over(w).alias("cum_a"),
            F.sum("nb").over(w).alias("cum_b"),
        )
        .crossJoin(F.broadcast(totals))
    )
    d = c.select(
        "value",
        F.abs(
            F.col("cum_a").cast("double") / F.col("tot_a")
            - F.col("cum_b").cast("double") / F.col("tot_b")
        ).alias("diff"),
        "tot_a",
        "tot_b",
    )
    # min value among the exact-double argmax: lexicographic struct max
    # on (diff, -value) — both engines computed identical diff doubles
    best = F.max(F.struct(F.col("diff"), (-F.col("value")).alias("nv")))
    return d.agg(
        bi(F.max("tot_a")).alias("n_a"),
        bi(F.max("tot_b")).alias("n_b"),
        r6(best["diff"]).alias("ks_stat"),
        r6(-best["nv"]).alias("ks_at_value"),
    )


_PSI_BINS = 10
_PSI_BIN_W = 50.0  # value ∈ [0, ~500)


@query(
    "ml_psi_drift",
    oracle=f"""
    WITH s AS (
      SELECT least(CAST(floor(value / {_PSI_BIN_W}) AS BIGINT), {_PSI_BINS - 1}) AS bin,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS in_a,
             CASE WHEN event_type = 'view'  THEN 1 ELSE 0 END AS in_b
      FROM events
      WHERE event_type IN ('click', 'view')
    ), b AS (
      SELECT g.bin,
             CAST(coalesce(sum(in_a), 0) AS BIGINT) AS n_a,
             CAST(coalesce(sum(in_b), 0) AS BIGINT) AS n_b
      FROM (SELECT range AS bin FROM range({_PSI_BINS})) g
      LEFT JOIN s ON s.bin = g.bin
      GROUP BY g.bin
    ), p AS (
      SELECT bin, n_a, n_b,
             (n_a + 0.5) / ((SELECT sum(n_a) FROM b) + 0.5 * {_PSI_BINS}) AS pa,
             (n_b + 0.5) / ((SELECT sum(n_b) FROM b) + 0.5 * {_PSI_BINS}) AS pb
      FROM b
    )
    SELECT bin, n_a, n_b,
           round(pa, 6) AS p_expected,
           round(pb, 6) AS p_actual,
           round((pb - pa) * ln(pb / pa), 6) AS psi_term
    FROM p
    """,
)
def ml_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two score distributions
    (click = expected/reference, view = actual/production) over 10
    fixed-width value bins — the standard model-monitoring drift gauge
    next to ml_ks_test's KS (PSI weights the tails by log-ratio, KS
    takes the sup; monitoring stacks report both). Laplace smoothing
    (+0.5 per bin) keeps empty bins finite DETERMINISTICALLY on both
    engines — no epsilon hack. Per-bin terms emitted (total PSI =
    Σ psi_term; the per-bin decomposition is what tells you WHERE the
    drift lives); fixed-width binning is a projection, so the whole op
    is one scan + 10-key agg + 1-row totals broadcast — the
    ml_calibration_bins scale shape."""
    e = t(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "view"))
    s = e.select(
        F.least(
            F.floor(F.col("value") / _PSI_BIN_W).cast("long"), F.lit(_PSI_BINS - 1)
        ).alias("bin"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("in_a"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("in_b"),
    )
    grid = spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
    b = (
        F.broadcast(grid)
        .join(s, "bin", "left")
        .groupBy("bin")
        .agg(
            bi(F.coalesce(F.sum("in_a"), F.lit(0))).alias("n_a"),
            bi(F.coalesce(F.sum("in_b"), F.lit(0))).alias("n_b"),
        )
    )
    totals = b.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    pa = (F.col("n_a") + 0.5) / (F.col("ta") + 0.5 * _PSI_BINS)
    pb = (F.col("n_b") + 0.5) / (F.col("tb") + 0.5 * _PSI_BINS)
    return (
        b.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n_a",
            "n_b",
            r6(pa).alias("p_expected"),
            r6(pb).alias("p_actual"),
            r6((pb - pa) * F.log(pb / pa)).alias("psi_term"),
        )
    )


@query(
    "ml_lift_gains_table",
    oracle="""
    WITH s AS (
      SELECT value AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
             event_id
      FROM events
    ), ranked AS (
      SELECT label,
             row_number() OVER (ORDER BY score DESC, event_id) AS rn,
             count(*) OVER () AS total
      FROM s
    ), deciled AS (
      SELECT ((rn - 1) * 10) // total AS decile, label FROM ranked
    ), agg AS (
      SELECT decile,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(label) AS BIGINT) AS n_pos
      FROM deciled GROUP BY decile
    ), cum AS (
      SELECT decile, n, n_pos,
             sum(n) OVER (ORDER BY decile)     AS cum_n,
             sum(n_pos) OVER (ORDER BY decile) AS cum_pos,
             (SELECT sum(n) FROM agg)          AS tot,
             (SELECT sum(n_pos) FROM agg)      AS tot_pos
      FROM agg
    )
    SELECT decile, n, n_pos,
           round(CAST(cum_pos AS DOUBLE) / tot_pos, 6) AS gain,
           round((CAST(cum_pos AS DOUBLE) / cum_n)
                 / (CAST(tot_pos AS DOUBLE) / tot), 6) AS lift
    FROM cum
    """,
)
def ml_lift_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift by population decile — the campaign-
    targeting readout (top decile captures gain·100% of positives at
    lift× the base rate) that completes the eval family (calibration,
    confusion sweep, AUC, KS, PSI). Deciles need a GLOBAL rank of the
    scored population; the rank comes from functions/ranks.py's
    range-partitioned two-phase layout (local row_numbers + broadcast
    partition offsets — no single-partition sort of the scored corpus,
    the text_wordcount discipline), the decile id is integer arithmetic
    on (rank, total), and everything after is a 10-row agg + 10-row
    cumulative window. Tiebreak (score desc, event_id) is a total
    order, so both engines rank identically."""
    from ..functions.ranks import with_global_row_number

    e = t(spark, sf_dir, "events")
    s = e.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        "event_id",
    )
    ranked = with_global_row_number(
        s,
        [F.col("score").desc(), F.col("event_id").asc()],
        "rn",
        total_col="total",
    )
    # exact INTEGER division on both engines (float division + cast has
    # rounding hazards exactly at decile boundaries)
    deciled = ranked.select(
        F.expr("((rn - 1) * 10) div total").alias("decile"),
        "label",
    )
    agg = deciled.groupBy("decile").agg(
        bi(F.count(F.lit(1))).alias("n"), bi(F.sum("label")).alias("n_pos")
    )
    from pyspark.sql import Window

    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    totals = agg.agg(F.sum("n").alias("tot"), F.sum("n_pos").alias("tot_pos"))
    cum = agg.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("n_pos").over(w).alias("cum_pos"),
    ).crossJoin(F.broadcast(totals))
    return cum.select(
        "decile",
        "n",
        "n_pos",
        r6(F.col("cum_pos").cast("double") / F.col("tot_pos")).alias("gain"),
        r6(
            (F.col("cum_pos").cast("double") / F.col("cum_n"))
            / (F.col("tot_pos").cast("double") / F.col("tot"))
        ).alias("lift"),
    )


@query(
    "ml_kfold_assign",
    oracle="""
    WITH folds AS (
      SELECT ((o_orderkey * 40503) % 65536) % 5 AS fold,
             o_totalprice, o_custkey
      FROM orders
    ),
    per_fold AS (
      SELECT fold, count(*) AS n_test,
             sum(o_totalprice) AS sum_test,
             count(DISTINCT o_custkey) AS n_cust_test
      FROM folds GROUP BY fold
    ),
    tot AS (
      SELECT sum(n_test) AS n_all, sum(sum_test) AS sum_all FROM per_fold
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           n_test,
           CAST(n_all - n_test AS BIGINT) AS n_train,
           round(sum_test / n_test, 6) AS avg_test_price,
           round((sum_all - sum_test) / (n_all - n_test), 6) AS avg_train_price,
           n_cust_test
    FROM per_fold CROSS JOIN tot
    """,
)
def ml_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment (k=5) over
    orders — the split primitive every distributed CV loop needs, with
    the leakage-free properties that matter: (a) assignment is a PURE
    function of the key (a Knuth-style multiplicative mix, engine-
    portable integer arithmetic — no RNG, so re-runs, late-arriving
    data, and both engines agree row-for-row), (b) folds partition the
    table exactly (pinned in tests), and (c) per-fold TRAIN stats come
    from the complement identity (train = total − fold) computed off the
    per-fold aggregates — ONE scan for all k train/test pairs, not k
    scans of 80% of the corpus each, which is the difference between CV
    costing 1× and 5× a 100 TB epoch. avg_train_price's float parity
    holds because both engines compute it from the same per-fold sums,
    not from independent re-summations (§5.3 discipline)."""
    o = t(spark, sf_dir, "orders")
    fold = ((F.col("o_orderkey") * 40503) % 65536) % 5
    per_fold = (
        o.select(fold.alias("fold"), "o_totalprice", "o_custkey")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum("o_totalprice").alias("sum_test"),
            F.countDistinct("o_custkey").alias("n_cust_test"),
        )
    )
    tot = per_fold.agg(
        F.sum("n_test").alias("n_all"), F.sum("sum_test").alias("sum_all")
    )
    return per_fold.crossJoin(F.broadcast(tot)).select(
        bi(F.col("fold")).alias("fold"),
        "n_test",
        bi(F.col("n_all") - F.col("n_test")).alias("n_train"),
        r6(F.col("sum_test") / F.col("n_test")).alias("avg_test_price"),
        r6(
            (F.col("sum_all") - F.col("sum_test"))
            / (F.col("n_all") - F.col("n_test"))
        ).alias("avg_train_price"),
        "n_cust_test",
    )


@query(
    "ml_pr_auc",
    oracle="""
    WITH s AS (
      SELECT value AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events
    ), v AS (
      SELECT score, sum(label) AS n_pos, count(*) - sum(label) AS n_neg
      FROM s GROUP BY score
    ), c AS (
      SELECT score,
             sum(n_pos) OVER (ORDER BY score DESC) AS tp,
             sum(n_neg) OVER (ORDER BY score DESC) AS fp
      FROM v
    ), tot AS (
      SELECT CAST(sum(n_pos) AS DOUBLE) AS p, CAST(sum(n_neg) AS DOUBLE) AS n
      FROM v
    ), step AS (
      SELECT tp / p AS recall,
             CAST(tp AS DOUBLE) / (tp + fp) AS prec,
             tp / p - coalesce(lag(tp / p) OVER (ORDER BY score DESC), 0.0)
               AS d_recall
      FROM c CROSS JOIN tot
    )
    SELECT CAST(t.p AS BIGINT) AS n_pos, CAST(t.n AS BIGINT) AS n_neg,
           round(t.p / (t.p + t.n), 6) AS baseline_ap,
           round((SELECT sum(d_recall * prec) FROM step), 6) AS pr_auc
    FROM tot t
    """,
)
def ml_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve, the
    step-wise threshold definition: AP = Σ Δrecall·precision over
    distinct-score thresholds descending) — the ranking eval that stays
    informative under class imbalance where ROC-AUC saturates
    (baseline_ap = prevalence is the random-ranker reference; ROC's is
    always 0.5). Same value-grain discipline as ml_auc_roc: the corpus
    collapses to per-distinct-score (n_pos, n_neg) counts in one keyed
    hash agg; TP/FP are a running window over that bounded grain, never
    per-row ranks (§R class 3). The threshold-grain definition also
    removes the within-tie ordering ambiguity every per-row AP
    formulation has — ties share one threshold, so both engines compute
    identical arithmetic. Same swap at unbounded score cardinality:
    fixed-resolution score binning bounds the grain."""
    e = t(spark, sf_dir, "events")
    s = e.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    v = s.groupBy("score").agg(
        F.sum("label").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("label")).alias("n_neg"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = v.select(
        "score",
        F.sum("n_pos").over(w).alias("tp"),
        F.sum("n_neg").over(w).alias("fp"),
    )
    tot = v.agg(
        F.sum("n_pos").cast("double").alias("p"),
        F.sum("n_neg").cast("double").alias("n"),
    )
    wlag = Window.orderBy(F.col("score").desc())
    step = c.crossJoin(F.broadcast(tot)).select(
        (F.col("tp") / F.col("p")).alias("recall"),
        (F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))).alias("prec"),
        (
            F.col("tp") / F.col("p")
            - F.coalesce(F.lag(F.col("tp") / F.col("p")).over(wlag), F.lit(0.0))
        ).alias("d_recall"),
    )
    ap = step.agg(F.sum(F.col("d_recall") * F.col("prec")).alias("ap"))
    return (
        tot.crossJoin(F.broadcast(ap))
        .select(
            bi(F.col("p")).alias("n_pos"),
            bi(F.col("n")).alias("n_neg"),
            r6(F.col("p") / (F.col("p") + F.col("n"))).alias("baseline_ap"),
            r6(F.col("ap")).alias("pr_auc"),
        )
    )
