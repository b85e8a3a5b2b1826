"""§2 round-8 batch EA — Shapley-value attribution + onion dedup.

- ``events_attribution_shapley``: game-theoretic channel attribution —
  the ladder's top rung after last-touch / linear / position / time-decay
  / Markov-removal: each channel's credit is its Shapley value over the
  coalition game v(S) = conversion rate of users who touched exactly S.
  With 3 channels the 2³ = 8 coalition values come from ONE user-grain
  aggregation and the Shapley sum is literal arithmetic (weights
  |S|!(n−|S|−1)!/n! = 1/3, 1/6, 1/3); the efficiency axiom
  Σφ = v(N) − v(∅) is pinned.
- ``text_dedup_onion_ratio``: onion-style duplicate-content scoring for
  training corpora (the cross-document companion of the in-document
  span lanes): a document's score is the fraction of its distinct
  5-grams that also occur in ANOTHER document; docs above threshold are
  flagged for removal. One tokenize pass, gram-keyed doc-count window,
  doc-keyed ratio — the corpus_ngram_novelty shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

#: Shapley coalition weights for n=3: index by |S| (coalition WITHOUT i)
_W = ("1.0/3.0", "1.0/6.0", "1.0/3.0")


def _phi_sql(bit: int) -> str:
    """Σ over S ∌ channel of w(|S|)·(v(S∪{i}) − v(S)); v<code> columns."""
    others = [b for b in (1, 2, 4) if b != bit]
    terms = []
    for s in (0, others[0], others[1], others[0] | others[1]):
        size = bin(s).count("1")
        terms.append(f"{_W[size]} * (v{s | bit} - v{s})")
    return " + ".join(terms)


@query(
    "events_attribution_shapley",
    oracle=f"""
    WITH users AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'click'  THEN 1 ELSE 0 END) AS c,
             max(CASE WHEN event_type = 'view'   THEN 2 ELSE 0 END) AS v,
             max(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END) AS s,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS converted
      FROM events GROUP BY user_id
    ), coal AS (
      SELECT c + v + s AS code,
             avg(converted * 1.0) AS rate,
             count(*) AS n
      FROM users GROUP BY 1
    ), piv AS (
      SELECT
        {", ".join(f"coalesce(max(CASE WHEN code = {k} THEN rate END), 0.0) AS v{k}" for k in range(8))},
        CAST(sum(n) AS BIGINT) AS n_users
      FROM coal
    )
    SELECT round({_phi_sql(1)}, 6) AS phi_click,
           round({_phi_sql(2)}, 6) AS phi_view,
           round({_phi_sql(4)}, 6) AS phi_signup,
           round(v7, 6) AS v_grand,
           round(v0, 6) AS v_empty,
           n_users
    FROM piv
    """,
)
def events_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley attribution over the (click, view, signup) channel game:
    v(S) = conversion-to-purchase rate among users whose touched set is
    EXACTLY S (absent coalitions contribute v = 0, documented), and
    φᵢ = Σ over S∌i of |S|!(n−|S|−1)!/n! · (v(S∪i) − v(S)) with the n = 3
    literal weights 1/3, 1/6, 1/3. Unlike position/time-decay rules,
    Shapley is the unique credit split satisfying efficiency/symmetry/
    dummy/additivity — and efficiency (Σφ = v(N) − v(∅)) is pinned.

    Scale: ONE user-grain aggregation (the only corpus shuffle) reduces
    everything to ≤ 2ⁿ coalition rows; the Shapley sum is literal
    arithmetic on a 1-row pivot. n stays small by design — at 10+
    channels the 2ⁿ table explodes and you sample permutations
    (documented boundary; the marketing norm is n ≤ 8)."""
    e = t(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        F.max(F.when(F.col("event_type") == "view", 2).otherwise(0)).alias("v"),
        F.max(F.when(F.col("event_type") == "signup", 4).otherwise(0)).alias("s"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    coal = users.groupBy(
        (F.col("c") + F.col("v") + F.col("s")).alias("code")
    ).agg(
        F.avg(F.col("converted") * 1.0).alias("rate"),
        F.count(F.lit(1)).alias("n"),
    )
    piv = coal.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("code") == k, F.col("rate"))), F.lit(0.0)
            ).alias(f"v{k}")
            for k in range(8)
        ],
        bi(F.sum("n")).alias("n_users"),
    )

    def _phi(bit: int):
        others = [b for b in (1, 2, 4) if b != bit]
        w = (1.0 / 3.0, 1.0 / 6.0, 1.0 / 3.0)
        expr = F.lit(0.0)
        for s in (0, others[0], others[1], others[0] | others[1]):
            size = bin(s).count("1")
            expr = expr + F.lit(w[size]) * (
                F.col(f"v{s | bit}") - F.col(f"v{s}")
            )
        return expr

    return piv.select(
        r6(_phi(1)).alias("phi_click"),
        r6(_phi(2)).alias("phi_view"),
        r6(_phi(4)).alias("phi_signup"),
        r6(F.col("v7")).alias("v_grand"),
        r6(F.col("v0")).alias("v_empty"),
        "n_users",
    )


_ONION_N = 5
_ONION_THRESHOLD = 0.5


@query(
    "text_dedup_onion_ratio",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    ng AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, len(tk) - {_ONION_N - 2}),
               i -> list_aggregate(list_slice(tk, i, i + {_ONION_N - 1}),
                                   'string_agg', ' '))) AS gram
      FROM toks WHERE len(tk) >= {_ONION_N}
    ),
    d AS (SELECT DISTINCT doc_id, gram FROM ng),
    shared AS (
      SELECT doc_id, gram,
             count(*) OVER (PARTITION BY gram) AS n_docs
      FROM d
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           round(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END)
                 / (count(*) * 1.0), 6) AS dup_ratio,
           sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END)
                 / (count(*) * 1.0) <= {_ONION_THRESHOLD} AS keep
    FROM shared GROUP BY doc_id
    """,
)
def text_dedup_onion_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Onion dedup scoring: a document's duplicate-content ratio is the
    fraction of its DISTINCT 5-grams that occur in at least one
    OTHER document; docs above the 0.5 threshold are dropped. This is
    the cross-document filter training pipelines run after in-document
    span dedup (text_span_dedup) and before near-dup clustering: it
    catches boilerplate and partial mirrors that whole-doc fingerprints
    miss without the cost of pairwise alignment.

    Scale: the corpus tokenizes ONCE; the shared-gram count is a
    gram-partitioned window over the distinct (doc, gram) frame (one
    keyed shuffle — the same grain the minhash lane shuffles), the
    ratio a doc-keyed aggregation. No pairwise stage anywhere — cost is
    linear in total distinct grams at any corpus size."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("tk"),
    ).filter(F.size("tk") >= _ONION_N)
    ng = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - (_ONION_N - 1)),
                lambda i: F.array_join(
                    F.slice("tk", i, _ONION_N), " "
                ),
            )
        ).alias("gram"),
    )
    d = ng.distinct()
    shared = d.select(
        "doc_id",
        "gram",
        F.count(F.lit(1)).over(Window.partitionBy("gram")).alias("n_docs"),
    )
    dup = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
    cnt = F.count(F.lit(1))
    return shared.groupBy("doc_id").agg(
        bi(cnt).alias("n_grams"),
        bi(dup).alias("n_shared"),
        r6(dup / (cnt * 1.0)).alias("dup_ratio"),
        (dup / (cnt * 1.0) <= _ONION_THRESHOLD).alias("keep"),
    )
