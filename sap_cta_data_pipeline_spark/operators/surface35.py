"""§2 round-8 batch EO — empirical-Bayes rate shrinkage.

``events_eb_rate_shrinkage``: the "shrunken ratings" estimator — raw
per-user conversion rates are noisy exactly when n is small, so fit a
Beta prior to the population by method of moments (m, v over user
rates → α = m(m(1−m)/v − 1), β = (1−m)(m(1−m)/v − 1)) and report each
user's posterior mean (c+α)/(n+α+β). The jobs-to-be-done list is long:
product ratings, seller scores, CTR priors, fraud rates — anywhere a
3-for-3 newcomer must not outrank a 950-for-1000 veteran.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query


@query(
    "events_eb_rate_shrinkage",
    oracle="""
    WITH users AS (
      SELECT user_id,
             count(*) * 1.0 AS n,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 1.0
                 AS c
      FROM events GROUP BY user_id
    ),
    prior AS (
      SELECT avg(c / n) AS m, var_samp(c / n) AS v FROM users
    ),
    ab AS (
      SELECT m, v,
             m * (m * (1 - m) / v - 1) AS alpha,
             (1 - m) * (m * (1 - m) / v - 1) AS beta
      FROM prior
    )
    SELECT u.user_id,
           CAST(u.n AS BIGINT) AS n_events,
           CAST(u.c AS BIGINT) AS n_purchases,
           round(u.c / u.n, 6) AS raw_rate,
           round((u.c + ab.alpha) / (u.n + ab.alpha + ab.beta), 6)
               AS shrunk_rate
    FROM users u CROSS JOIN ab
    """,
)
def events_eb_rate_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-user purchase rates: the Beta
    prior comes from the population itself (method of moments on the
    user-rate mean and variance), and every user's estimate is the
    posterior mean (c+α)/(n+α+β) — newcomers pull hard toward the
    prior, veterans barely move. Pins certify the estimator's defining
    properties: shrinkage strength decreases in n, every shrunk rate
    lies between the raw rate and the prior mean, and α, β are
    positive on this population.

    Scale: one user-grain aggregation (the only corpus shuffle), a
    1-row moment fit, a scalar broadcast back over users — the same
    envelope as a plain rate computation; the entire Bayesian machinery
    is two windowless aggregates."""
    e = t(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        (F.count(F.lit(1)) * 1.0).alias("n"),
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            * 1.0
        ).alias("c"),
    )
    r = F.col("c") / F.col("n")
    prior = users.agg(F.avg(r).alias("m"), F.var_samp(r).alias("v"))
    k = F.col("m") * (1 - F.col("m")) / F.col("v") - 1
    ab = prior.select(
        "m",
        "v",
        (F.col("m") * k).alias("alpha"),
        ((1 - F.col("m")) * k).alias("beta"),
    )
    return users.crossJoin(F.broadcast(ab)).select(
        "user_id",
        bi(F.col("n")).alias("n_events"),
        bi(F.col("c")).alias("n_purchases"),
        r6(F.col("c") / F.col("n")).alias("raw_rate"),
        r6(
            (F.col("c") + F.col("alpha"))
            / (F.col("n") + F.col("alpha") + F.col("beta"))
        ).alias("shrunk_rate"),
    )
