"""§2 round-8 batch EQ — DeLong AUC inference + term burstiness.

- ``ml_auc_delong_se``: the AUC is a statistic, so it needs a standard
  error — DeLong et al. (1988): per positive, V₁₀ = fraction of
  negatives ranked below it (midrank ties); per negative, V₀₁
  symmetric; SE² = S₁₀/P + S₀₁/N. Computed at the DISTINCT-SCORE grain
  (every positive at a score shares one V₁₀ value — a weighted
  variance over the value frame), the same no-per-row-ranks discipline
  as ml_auc_roc, whose AUC this lane re-derives as a built-in
  cross-check.
- ``text_term_burstiness``: Church & Gale burstiness — a term's
  variance-to-mean ratio of per-document counts (zeros included).
  Function words arrive ~Poisson (VMR ≈ 1); content words are BURSTY
  (VMR ≫ 1: absent mostly, repeated when present) — the signal
  keyword extractors and stop-list builders read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_MIN_TERM_COUNT = 20


@query(
    "ml_auc_delong_se",
    oracle="""
    WITH s AS (
      SELECT value AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
      FROM events
    ), v AS (
      SELECT score,
             sum(label) * 1.0            AS np,
             (count(*) - sum(label)) * 1.0 AS nn
      FROM s GROUP BY score
    ), c AS (
      SELECT score, np, nn,
             coalesce(sum(nn) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS neg_below,
             coalesce(sum(np) OVER (ORDER BY score
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
                 AS pos_above
      FROM v
    ), tot AS (
      SELECT sum(np) AS p, sum(nn) AS n FROM c
    ), comp AS (
      SELECT c.np, c.nn,
             (c.neg_below + 0.5 * c.nn) / tot.n AS v10,
             (c.pos_above + 0.5 * c.np) / tot.p AS v01,
             tot.p, tot.n
      FROM c CROSS JOIN tot
    ), agg AS (
      SELECT max(p) AS p, max(n) AS n,
             sum(np * v10) AS s10_1, sum(np * v10 * v10) AS s10_2,
             sum(nn * v01) AS s01_1, sum(nn * v01 * v01) AS s01_2
      FROM comp
    )
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
           round(s10_1 / p, 6) AS auc,
           round(sqrt(((s10_2 - s10_1 * s10_1 / p) / (p - 1)) / p
                      + ((s01_2 - s01_1 * s01_1 / n) / (n - 1)) / n), 6)
               AS se_delong,
           round((s10_1 / p - 0.5)
                 / sqrt(((s10_2 - s10_1 * s10_1 / p) / (p - 1)) / p
                        + ((s01_2 - s01_1 * s01_1 / n) / (n - 1)) / n), 6)
               AS z_vs_chance
    FROM agg
    """,
)
def ml_auc_delong_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong standard error for the ROC-AUC: V₁₀ per positive =
    (negatives strictly below + half the ties)/N, V₀₁ symmetric; the
    structural-component variances give SE² = S₁₀/P + S₀₁/N and the
    z statistic against chance. Everything runs at the distinct-score
    grain — positives sharing a score share their V₁₀, so the variance
    is a WEIGHTED one over the value frame (sufficient-statistics
    form), never per-row ranks. mean(V₁₀) = AUC falls out as a free
    cross-check against ml_auc_roc (pinned equal in tests, along with
    a python replay of the whole estimator).

    Scale: identical envelope to ml_auc_roc — one hash agg to the
    value grain, two running windows over it, a 1-row final."""
    e = t(spark, sf_dir, "events")
    s = e.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    v = s.groupBy("score").agg(
        (F.sum("label") * 1.0).alias("np"),
        ((F.count(F.lit(1)) - F.sum("label")) * 1.0).alias("nn"),
    )
    wb = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    wa = Window.orderBy("score").rowsBetween(1, Window.unboundedFollowing)
    c = v.select(
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(wb), F.lit(0.0)).alias("neg_below"),
        F.coalesce(F.sum("np").over(wa), F.lit(0.0)).alias("pos_above"),
    )
    tot = c.agg(F.sum("np").alias("p"), F.sum("nn").alias("n"))
    comp = c.crossJoin(F.broadcast(tot)).select(
        "np",
        "nn",
        "p",
        "n",
        ((F.col("neg_below") + 0.5 * F.col("nn")) / F.col("n")).alias("v10"),
        ((F.col("pos_above") + 0.5 * F.col("np")) / F.col("p")).alias("v01"),
    )
    agg = comp.agg(
        F.max("p").alias("p"),
        F.max("n").alias("n"),
        F.sum(F.col("np") * F.col("v10")).alias("s10_1"),
        F.sum(F.col("np") * F.col("v10") * F.col("v10")).alias("s10_2"),
        F.sum(F.col("nn") * F.col("v01")).alias("s01_1"),
        F.sum(F.col("nn") * F.col("v01") * F.col("v01")).alias("s01_2"),
    )
    var10 = (F.col("s10_2") - F.col("s10_1") * F.col("s10_1") / F.col("p")) / (
        F.col("p") - 1
    )
    var01 = (F.col("s01_2") - F.col("s01_1") * F.col("s01_1") / F.col("n")) / (
        F.col("n") - 1
    )
    se = F.sqrt(var10 / F.col("p") + var01 / F.col("n"))
    return agg.select(
        bi(F.col("p")).alias("n_pos"),
        bi(F.col("n")).alias("n_neg"),
        r6(F.col("s10_1") / F.col("p")).alias("auc"),
        r6(se).alias("se_delong"),
        r6((F.col("s10_1") / F.col("p") - 0.5) / se).alias("z_vs_chance"),
    )


@query(
    "text_term_burstiness",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS w
      FROM documents
    ),
    per_doc AS (
      SELECT w, doc_id, count(*) * 1.0 AS cnt FROM toks GROUP BY w, doc_id
    ),
    d AS (SELECT count(DISTINCT doc_id) * 1.0 AS n_docs FROM documents),
    terms AS (
      SELECT w,
             sum(cnt)       AS total,
             sum(cnt * cnt) AS sq,
             count(*) * 1.0 AS n_docs_with
      FROM per_doc GROUP BY w HAVING sum(cnt) >= {_MIN_TERM_COUNT}
    )
    SELECT w AS term,
           CAST(total AS BIGINT) AS total,
           CAST(n_docs_with AS BIGINT) AS n_docs_with,
           round((sq / d.n_docs - pow(total / d.n_docs, 2))
                 / (total / d.n_docs), 6) AS vmr,
           (sq / d.n_docs - pow(total / d.n_docs, 2))
                 / (total / d.n_docs) > 1.5 AS bursty
    FROM terms CROSS JOIN d
    """,
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness over the corpus: VMR = Var(count per doc,
    ZEROS INCLUDED)/mean — computed from sufficient statistics (Σc,
    Σc² over docs containing the term; the zero docs contribute nothing
    to either sum, so population variance = Σc²/D − (Σc/D)²). Terms at
    VMR ≈ 1 arrive Poisson (function words); VMR > 1.5 flags bursty
    content terms. A planted corpus (one word everywhere once vs one
    word concentrated) pins both ends.

    Scale: one (term, doc) aggregation then a term-grain reduce — the
    text_wordcount envelope; the zeros-included variance trick avoids
    materializing the full docs × vocab matrix."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("w"),
    )
    per_doc = toks.groupBy("w", "doc_id").agg(
        (F.count(F.lit(1)) * 1.0).alias("cnt")
    )
    n_docs = docs.select("doc_id").distinct().count() * 1.0  # 1-row scalar
    terms = per_doc.groupBy("w").agg(
        F.sum("cnt").alias("total"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sq"),
        (F.count(F.lit(1)) * 1.0).alias("n_docs_with"),
    ).filter(F.col("total") >= _MIN_TERM_COUNT)
    mean = F.col("total") / n_docs
    vmr = (F.col("sq") / n_docs - mean * mean) / mean
    return terms.select(
        F.col("w").alias("term"),
        bi(F.col("total")).alias("total"),
        bi(F.col("n_docs_with")).alias("n_docs_with"),
        r6(vmr).alias("vmr"),
        (vmr > 1.5).alias("bursty"),
    )
