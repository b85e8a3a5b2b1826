"""§2 batch AD (round 3): frequency-mining / retrieval-prep lane.

Five fully-oracled operators a training-data pipeline runs between raw
corpus and tokenizer/model work:

- `agg_heavy_hitters` — the streaming-classic frequent-items shape done
  distributed-right: per-partition Misra–Gries summaries (bounded memory,
  one pass) → candidate union → ONE broadcast recount pass → exact counts
  of every token with frequency > N/k. Because MG guarantees a candidate
  superset, the final output is EXACT and oracle-able even though the
  first pass is approximate — the same two-phase shape that finds hot
  keys / hot URLs / hot n-grams at 100 TB without a full-vocabulary
  shuffle.
- `text_bpe_pair_counts` — the inner loop of BPE vocabulary learning:
  adjacent symbol-pair counts within tokens (the statistic a merge round
  maximizes), global top 30 under a deterministic total order.
- `ml_feature_hashing` — the hashing trick: tokens → portable polynomial
  hash → fixed 64-bucket feature space, per-document sparse counts. No
  vocabulary build, no global state — the shape that featurizes unbounded
  vocabularies at scale.
- `join_asof_nearest` — third as-of semantics after backward
  (joins.py:join_asof) and forward (join_asof_forward): nearest click in
  EITHER direction, ties to the earlier event. Same union-tag + window
  machinery, one shuffle, zero join amplification.
- `orders_association_rules` — support/confidence/lift over co-purchase
  pairs (a-priori-pruned, as orders_copurchase_pairs): the market-basket
  output analysts actually consume, with the support table broadcast into
  the rule join.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6, um
from ..registry import query

#: heavy-hitter threshold parameter: report tokens with freq > N/_HH_K.
#: Also the per-partition Misra–Gries capacity — capacity k bounds the
#: per-partition undercount below N_p/(k+1), so every token with
#: partition frequency > N_p/k survives its partition summary, and a
#: pigeonhole over partitions shows every GLOBAL heavy hitter is a
#: partition heavy hitter somewhere. Union of summaries ⊇ true answer.
_HH_K = 30

#: feature-hashing space: polynomial char hash mod _FH_M, folded into
#: _FH_BUCKETS buckets. Both constants are part of the feature contract —
#: changing them re-keys every persisted feature vector.
_FH_M = 1_000_000_007
_FH_BUCKETS = 64

_TOKENS = "list_filter(string_split(text, ' '), x -> x != '')"


def _mg_summaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Weighted Misra–Gries over one partition: per Arrow batch, collapse
    to (token, weight) via value_counts, then the classic update — add
    weight if tracked, insert if room, else subtract the minimum counter
    from everyone and evict zeros. Memory is O(_HH_K) regardless of
    partition size; emits only the surviving candidate tokens."""
    counters: dict[str, int] = {}
    for pdf in batches:
        for tok, w in pdf["token"].value_counts().items():
            if tok in counters:
                counters[tok] += int(w)
            elif len(counters) < _HH_K:
                counters[tok] = int(w)
            else:
                m = min(min(counters.values()), int(w))
                counters = {k: c - m for k, c in counters.items() if c - m > 0}
                if int(w) - m > 0:
                    counters[tok] = int(w) - m
    yield pd.DataFrame({"token": pd.Series(list(counters), dtype="object")})


@query(
    "agg_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOKENS}) AS token FROM documents
    ),
    tot AS (SELECT count(*) AS n_total FROM tok)
    SELECT token,
           count(*) AS n_occurrences,
           (SELECT n_total FROM tot) AS n_total
    FROM tok
    GROUP BY token
    HAVING count(*) * {_HH_K} > (SELECT n_total FROM tot)
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent tokens (freq > N/{k}) via the two-phase
    summary-then-recount shape: (1) one mapInPandas pass produces a
    bounded Misra–Gries candidate set per partition — O(k) state, no
    shuffle; (2) the distinct candidate union (≤ k × partitions rows) is
    BROADCAST back over one more token scan for exact counts. The
    full-vocabulary groupBy never happens — at 100 TB the vocabulary is
    billions of keys but the recount join touches ≤ k·P of them. The MG
    superset guarantee (see _HH_K) makes phase-2 output exact, so this
    carries a full value oracle despite the approximate first pass."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("token")
    )
    candidates = (
        toks.mapInPandas(_mg_summaries, schema="token string").distinct()
    )
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        toks.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n_occurrences") * _HH_K > F.col("n_total"))
        .select("token", bi(F.col("n_occurrences")).alias("n_occurrences"),
                bi(F.col("n_total")).alias("n_total"))
    )


@query(
    "text_bpe_pair_counts",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOKENS}) AS tok FROM documents
    ),
    pr AS (
      SELECT unnest(list_transform(range(1, length(tok)),
                                   i -> substr(tok, CAST(i AS INT), 2))) AS pair
      FROM tok
    )
    SELECT pair, count(*) AS n_pairs
    FROM pr GROUP BY pair
    ORDER BY n_pairs DESC, pair
    LIMIT 30
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-learning statistics round: adjacent character-pair counts
    within whitespace tokens (pairs never span tokens — the
    pretokenization boundary), top 30 under the deterministic
    (count desc, pair asc) order. In-row pair generation via
    sequence+substring HOFs (no Python), partial-agg combine on the
    ~26² pair key space, TakeOrderedAndProject final — the per-round cost
    a distributed BPE trainer pays is exactly one such pass over the
    corpus per merge. sequence(1, n) is end-INCLUSIVE (DuckDB range is
    end-exclusive) and descends when n < 1, hence the length >= 2 guard."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("tok")
    )
    pairs_expr = F.when(
        F.length("tok") >= 2,
        F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"),
    ).otherwise(F.array().cast("array<string>"))
    return (
        toks.select(F.explode(pairs_expr).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), F.asc("pair"))
        .limit(30)
        .select("pair", bi(F.col("n_pairs")).alias("n_pairs"))
    )


@query(
    "ml_feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS}) AS tok FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, length(tok) + 1),
                                i -> CAST(ascii(substr(tok, CAST(i AS INT), 1)) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % {_FH_M}) % {_FH_BUCKETS} AS bucket
      FROM tok
    )
    SELECT doc_id, bucket, count(*) AS n_tok
    FROM h GROUP BY doc_id, bucket
    """,
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer: each token folds to a portable polynomial
    char hash (acc·31 + ascii, mod {M}) and lands in one of 64 buckets;
    output is the (doc_id, bucket, count) sparse feature triple. Entirely
    in-row HOFs — no vocabulary table, no fit step, no shuffle beyond the
    final (doc_id, bucket) partial agg, which is why the hashing trick is
    the unbounded-vocabulary featurizer at 100 TB: feature space is fixed
    at write time and any two runs agree without coordination. The hash is
    engine-portable by construction (same fold both sides), unlike
    xxhash64/murmur which are Spark-specific."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("tok"),
    )
    hashed = toks.select(
        "doc_id",
        (
            F.expr(
                f"aggregate(transform(sequence(1, length(tok)), "
                f"i -> cast(ascii(substring(tok, i, 1)) as bigint)), "
                f"cast(0 as bigint), (acc, x) -> (acc * 31 + x) % {_FH_M})"
            )
            % _FH_BUCKETS
        ).alias("bucket"),
    )
    return hashed.groupBy("doc_id", "bucket").agg(
        bi(F.count(F.lit(1))).alias("n_tok")
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    c AS (
      SELECT p.event_id, p.user_id, p.ts,
        (SELECT max(c.ts) FROM events c
          WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts) AS back_ts,
        (SELECT min(c.ts) FROM events c
          WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts > p.ts) AS fwd_ts
      FROM p
    )
    SELECT event_id, user_id, ts AS purchase_ts,
      CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
           WHEN fwd_ts IS NULL THEN back_ts
           WHEN back_ts IS NULL THEN fwd_ts
           WHEN epoch_us(ts) - epoch_us(back_ts) <= epoch_us(fwd_ts) - epoch_us(ts)
             THEN back_ts ELSE fwd_ts END AS nearest_click_ts,
      CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN 'none'
           WHEN fwd_ts IS NULL THEN 'back'
           WHEN back_ts IS NULL THEN 'fwd'
           WHEN epoch_us(ts) - epoch_us(back_ts) <= epoch_us(fwd_ts) - epoch_us(ts)
             THEN 'back' ELSE 'fwd' END AS direction
    FROM c
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join: each purchase matched to the closest
    click in EITHER direction (tie → the earlier, i.e. backward, click).
    Completes the as-of family — backward (join_asof), forward
    (join_asof_forward), nearest. Both candidates come from the SAME
    union-tagged, (user)-partitioned sorted frame: a backward running max
    and a forward running min over mirrored window frames — one shuffle
    total, no join amplification, which is the 100-TB shape (cost = one
    sort within user partitions, same as the other two). Clicks sort
    before purchases at equal ts (tag 0 < 1), so the backward frame is
    ts-inclusive and the forward frame strictly-after — matching the
    oracle's <= / > split exactly."""
    e = t(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin("click", "purchase")).withColumn(
        "tag", F.when(F.col("event_type") == "click", 0).otherwise(1)
    )
    order = [F.col("ts"), F.col("tag"), F.col("event_id")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("tag") == 0, F.col("ts"))
    both = tagged.select(
        "event_id", "user_id", "ts", "tag", "event_type",
        F.max(click_ts).over(wb).alias("back_ts"),
        F.min(click_ts).over(wf).alias("fwd_ts"),
    ).filter(F.col("event_type") == "purchase")
    back_gap = um("ts") - um("back_ts")
    fwd_gap = um("fwd_ts") - um("ts")
    prefer_back = back_gap <= fwd_gap
    return both.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(F.col("back_ts").isNull() & F.col("fwd_ts").isNull(), F.lit(None).cast("timestamp"))
        .when(F.col("fwd_ts").isNull(), F.col("back_ts"))
        .when(F.col("back_ts").isNull(), F.col("fwd_ts"))
        .when(prefer_back, F.col("back_ts"))
        .otherwise(F.col("fwd_ts"))
        .alias("nearest_click_ts"),
        F.when(F.col("back_ts").isNull() & F.col("fwd_ts").isNull(), F.lit("none"))
        .when(F.col("fwd_ts").isNull(), F.lit("back"))
        .when(F.col("back_ts").isNull(), F.lit("fwd"))
        .when(prefer_back, F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("direction"),
    )


@query(
    "orders_association_rules",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n FROM li),
    sup AS (SELECT l_partkey, count(*) AS s FROM li GROUP BY 1),
    pop AS (SELECT l_partkey, s FROM sup WHERE s >= 3),
    f AS (SELECT l.l_orderkey, l.l_partkey FROM li l JOIN pop USING (l_partkey)),
    und AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
      FROM f a JOIN f b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    dir AS (
      SELECT pa AS part_a, pb AS part_b, n_ab FROM und
      UNION ALL
      SELECT pb AS part_a, pa AS part_b, n_ab FROM und
    )
    SELECT d.part_a, d.part_b, d.n_ab,
      round(d.n_ab / sa.s, 6) AS confidence,
      round(d.n_ab * (SELECT n FROM tot) / (sa.s * sb.s), 6) AS lift
    FROM dir d
    JOIN pop sa ON sa.l_partkey = d.part_a
    JOIN pop sb ON sb.l_partkey = d.part_b
    """,
)
def orders_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules a→b over co-purchased parts: support (n_ab),
    confidence (n_ab / s_a) and lift (n_ab·N / (s_a·s_b)), both
    directions of every surviving pair. Pair discovery reuses the
    orders_copurchase_pairs shape (a-priori prune BEFORE the basket
    self-join — no frequent pair contains an infrequent part); the
    support table that scores the rules is a post-prune dimension
    (≤ |frequent parts| rows) and is BROADCAST twice into the rule join,
    so rule scoring adds zero shuffles beyond pair counting."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    total = li.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders_total")
    )
    sup = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s")).where(
        F.col("s") >= 3
    )
    f = li.join(sup.select("l_partkey"), "l_partkey")
    a = f.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = f.select(F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("pb"))
    und = (
        a.join(b, (F.col("o") == F.col("o2")) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    directed = und.select(
        F.col("pa").alias("part_a"), F.col("pb").alias("part_b"), "n_ab"
    ).unionAll(
        und.select(F.col("pb").alias("part_a"), F.col("pa").alias("part_b"), "n_ab")
    )
    sa = sup.select(F.col("l_partkey").alias("part_a"), F.col("s").alias("s_a"))
    sb = sup.select(F.col("l_partkey").alias("part_b"), F.col("s").alias("s_b"))
    return (
        directed.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            r6(F.col("n_ab") / F.col("s_a")).alias("confidence"),
            r6(F.col("n_ab") * F.col("n_orders_total") / (F.col("s_a") * F.col("s_b"))).alias("lift"),
        )
    )


_BPE_LEARN_ROUNDS = 8


@query(
    "text_bpe_learn",
    oracle="""
    WITH words AS MATERIALIZED (
      SELECT tok, count(*) AS n
      FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
            FROM documents)
      GROUP BY tok
    ),
    s0 AS MATERIALIZED (
      SELECT n, list_transform(range(1, length(tok) + 1),
                               i -> substring(tok, i, 1)) AS sym
      FROM words
    ),
    p1 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s0 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b1 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p1
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s1 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s0 CROSS JOIN b1 b
    ),
    v1 AS (
      SELECT count(DISTINCT sy) AS v
      FROM (SELECT unnest(sym) AS sy FROM s1)
    ),
    p2 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s1 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b2 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p2
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s2 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s1 CROSS JOIN b2 b
    ),
    v2 AS (
      SELECT count(DISTINCT sy) AS v
      FROM (SELECT unnest(sym) AS sy FROM s2)
    ),
    p3 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s2 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b3 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p3
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s3 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s2 CROSS JOIN b3 b
    ),
    v3 AS (
      SELECT count(DISTINCT sy) AS v
      FROM (SELECT unnest(sym) AS sy FROM s3)
    ),
    p4 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s3 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b4 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p4
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s4 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s3 CROSS JOIN b4 b
    ),
    v4 AS (
      SELECT count(DISTINCT sy) AS v
      FROM (SELECT unnest(sym) AS sy FROM s4)
    ),
    p5 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s4 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b5 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p5
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s5 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s4 CROSS JOIN b5 b
    ),
    v5 AS (
      SELECT count(DISTINCT sy) AS v
      FROM (SELECT unnest(sym) AS sy FROM s5)
    ),
    p6 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s5 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b6 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p6
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s6 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s5 CROSS JOIN b6 b
    ),
    v6 AS (
      SELECT count(DISTINCT sy) AS v
      FROM (SELECT unnest(sym) AS sy FROM s6)
    ),
    p7 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s6 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b7 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p7
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s7 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s6 CROSS JOIN b7 b
    ),
    v7 AS (
      SELECT count(DISTINCT sy) AS v
      FROM (SELECT unnest(sym) AS sy FROM s7)
    ),
    p8 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s7 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b8 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p8
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s8 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s7 CROSS JOIN b8 b
    ),
    v8 AS (
      SELECT count(DISTINCT sy) AS v
      FROM (SELECT unnest(sym) AS sy FROM s8)
    )
    SELECT CAST(1 AS BIGINT) AS round, l AS left, r2 AS right, m AS merged,
           CAST(cnt AS BIGINT) AS n_pairs,
           CAST((SELECT v FROM v1) AS BIGINT) AS vocab_size_after
    FROM b1
    UNION ALL
    SELECT CAST(2 AS BIGINT) AS round, l AS left, r2 AS right, m AS merged,
           CAST(cnt AS BIGINT) AS n_pairs,
           CAST((SELECT v FROM v2) AS BIGINT) AS vocab_size_after
    FROM b2
    UNION ALL
    SELECT CAST(3 AS BIGINT) AS round, l AS left, r2 AS right, m AS merged,
           CAST(cnt AS BIGINT) AS n_pairs,
           CAST((SELECT v FROM v3) AS BIGINT) AS vocab_size_after
    FROM b3
    UNION ALL
    SELECT CAST(4 AS BIGINT) AS round, l AS left, r2 AS right, m AS merged,
           CAST(cnt AS BIGINT) AS n_pairs,
           CAST((SELECT v FROM v4) AS BIGINT) AS vocab_size_after
    FROM b4
    UNION ALL
    SELECT CAST(5 AS BIGINT) AS round, l AS left, r2 AS right, m AS merged,
           CAST(cnt AS BIGINT) AS n_pairs,
           CAST((SELECT v FROM v5) AS BIGINT) AS vocab_size_after
    FROM b5
    UNION ALL
    SELECT CAST(6 AS BIGINT) AS round, l AS left, r2 AS right, m AS merged,
           CAST(cnt AS BIGINT) AS n_pairs,
           CAST((SELECT v FROM v6) AS BIGINT) AS vocab_size_after
    FROM b6
    UNION ALL
    SELECT CAST(7 AS BIGINT) AS round, l AS left, r2 AS right, m AS merged,
           CAST(cnt AS BIGINT) AS n_pairs,
           CAST((SELECT v FROM v7) AS BIGINT) AS vocab_size_after
    FROM b7
    UNION ALL
    SELECT CAST(8 AS BIGINT) AS round, l AS left, r2 AS right, m AS merged,
           CAST(cnt AS BIGINT) AS n_pairs,
           CAST((SELECT v FROM v8) AS BIGINT) AS vocab_size_after
    FROM b8
    """,
)
def text_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-round BPE merge LEARNING — the actual tokenizer-training loop
    that text_bpe_pair_counts is one round of: for 8 deterministic rounds,
    count adjacent symbol pairs (weighted by word frequency), pick the
    best pair under the total order (count desc, left asc, right asc),
    apply it greedily leftmost-first across the vocabulary, recount.
    Output: one row per round — the merge table a tokenizer ships.

    Distribution contract: BPE trains on the WORD-FREQUENCY table, not
    the raw corpus (the standard Sennrich et al. shape) — one corpus
    tokenize+groupBy up front collapses 100 TB of text to a
    vocabulary-sized (word, count) frame, and every round after that
    touches only it. The merge apply is an in-row JVM ``aggregate`` fold
    over the symbol array (leftmost-first semantics exactly: a merged
    symbol can never cascade into the next pair because merged != left
    whenever right is non-empty); per round ONE alphabet²-bounded pair
    agg crosses the shuffle, ONE best-pair row crosses the driver
    (bounded literal, the k-means-centroid class), and the symbol frame
    is localCheckpoint-ed so round R's plan stays flat. Round 6: fully
    VALUE-ORACLED — the 8 learning rounds unroll as chained CTEs (pair
    agg → argmax under the same total order → the identical
    last-element-check merge fold via list_reduce), so the hash
    certifies the merge SEQUENCE and per-round vocab sizes; the
    hand-computed fixture pin in tests/test_iterative_pins.py remains."""
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    syms = words.select(
        "n",
        F.expr(
            "transform(sequence(1, length(tok)), i -> substring(tok, i, 1))"
        ).alias("sym"),
    ).localCheckpoint(eager=True)

    merges: list[tuple] = []
    for rnd in range(1, _BPE_LEARN_ROUNDS + 1):
        pairs = syms.where(F.size("sym") >= 2).select(
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(sym) - 1),"
                    " i -> struct(element_at(sym, i) AS l,"
                    "             element_at(sym, i + 1) AS r))"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merged = left + right
        fold = F.aggregate(
            "sym",
            F.expr("cast(array() as array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        syms = syms.select("n", fold.alias("sym")).localCheckpoint(eager=True)
        n_symbols = (
            syms.select(F.explode("sym").alias("s")).agg(
                F.countDistinct("s").alias("v")
            ).collect()[0]["v"]
        )
        merges.append((rnd, left, right, merged, cnt, int(n_symbols)))

    return spark.createDataFrame(
        merges,
        schema="round bigint, left string, right string, merged string,"
        " n_pairs bigint, vocab_size_after bigint",
    )


@query(
    "text_bpe_apply",
    oracle="""
    WITH words AS MATERIALIZED (
      SELECT tok, count(*) AS n
      FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
            FROM documents)
      GROUP BY tok
    ),
    s0 AS MATERIALIZED (
      SELECT n, list_transform(range(1, length(tok) + 1),
                               i -> substring(tok, i, 1)) AS sym
      FROM words
    ),
    p1 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s0 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b1 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p1
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s1 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s0 CROSS JOIN b1 b
    ),
    p2 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s1 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b2 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p2
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s2 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s1 CROSS JOIN b2 b
    ),
    p3 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s2 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b3 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p3
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s3 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s2 CROSS JOIN b3 b
    ),
    p4 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s3 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b4 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p4
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s4 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s3 CROSS JOIN b4 b
    ),
    p5 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s4 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b5 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p5
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s5 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s4 CROSS JOIN b5 b
    ),
    p6 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s5 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b6 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p6
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s6 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s5 CROSS JOIN b6 b
    ),
    p7 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s6 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b7 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p7
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s7 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s6 CROSS JOIN b7 b
    ),
    p8 AS (
      SELECT pr[1] AS l, pr[2] AS r2, sum(n) AS cnt
      FROM (SELECT n, unnest(list_zip(list_slice(sym, 1, len(sym) - 1),
                                      list_slice(sym, 2, len(sym)))) AS pr
            FROM s7 WHERE len(sym) >= 2)
      GROUP BY 1, 2
    ),
    b8 AS MATERIALIZED (
      SELECT l, r2, l || r2 AS m, cnt FROM p8
      ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1
    ),
    s8 AS MATERIALIZED (
      SELECT n, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM s7 CROSS JOIN b8 b
    ),
    lw AS MATERIALIZED (
      SELECT lang, tok, count(*) AS cnt
      FROM (SELECT lang,
                   unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
            FROM documents)
      GROUP BY 1, 2
    ),
    e0 AS MATERIALIZED (
      SELECT lang, tok, cnt,
             list_transform(range(1, length(tok) + 1),
                            i -> substring(tok, i, 1)) AS sym
      FROM lw
    ),
    e1 AS MATERIALIZED (
      SELECT lang, tok, e0.cnt AS cnt, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM e0 CROSS JOIN b1 b
    ),
    e2 AS MATERIALIZED (
      SELECT lang, tok, e1.cnt AS cnt, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM e1 CROSS JOIN b2 b
    ),
    e3 AS MATERIALIZED (
      SELECT lang, tok, e2.cnt AS cnt, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM e2 CROSS JOIN b3 b
    ),
    e4 AS MATERIALIZED (
      SELECT lang, tok, e3.cnt AS cnt, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM e3 CROSS JOIN b4 b
    ),
    e5 AS MATERIALIZED (
      SELECT lang, tok, e4.cnt AS cnt, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM e4 CROSS JOIN b5 b
    ),
    e6 AS MATERIALIZED (
      SELECT lang, tok, e5.cnt AS cnt, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM e5 CROSS JOIN b6 b
    ),
    e7 AS MATERIALIZED (
      SELECT lang, tok, e6.cnt AS cnt, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM e6 CROSS JOIN b7 b
    ),
    e8 AS MATERIALIZED (
      SELECT lang, tok, e7.cnt AS cnt, list_reduce(list_transform(sym, x -> [x]),
        (acc, xx) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l AND xx[1] = b.r2
                     THEN list_concat(list_slice(acc, 1, len(acc) - 1), [b.m])
                     ELSE list_concat(acc, xx) END) AS sym
      FROM e7 CROSS JOIN b8 b
    )
    SELECT lang,
           CAST(sum(cnt) AS BIGINT) AS n_words,
           CAST(sum(cnt * length(tok)) AS BIGINT) AS n_chars,
           CAST(sum(cnt * len(sym)) AS BIGINT) AS n_tokens_bpe,
           round(sum(cnt * length(tok)) / CAST(sum(cnt * len(sym)) AS DOUBLE), 6)
             AS chars_per_token,
           round(sum(cnt * len(sym)) / CAST(sum(cnt * length(tok)) AS DOUBLE), 6)
             AS compression_vs_chars
    FROM e8
    GROUP BY lang
    """,
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer INFERENCE: apply the merge table text_bpe_learn trained
    to encode the corpus — the deploy-side half of BPE (train once,
    encode forever). The learned merges arrive as a bounded driver
    literal (8 rows — the merge table IS the tokenizer artifact, k-means
    centroid class); encoding replays them in training order over each
    word's symbol array with the same greedy-leftmost in-row fold, so
    train and apply CANNOT diverge (shared semantics by construction).
    Output per language: word-token count before/after, characters per
    token after — the compression-ratio readout that decides whether a
    vocabulary is paying for itself. One corpus scan + tokenize, the
    per-word encode is pure in-row JVM folds. Round 6: fully
    VALUE-ORACLED — the oracle re-learns the same 8 merges (the
    text_bpe_learn chain) and re-encodes at (lang, word)-TYPE grain with
    occurrence weights (identical integer sums to Spark's per-instance
    encode, vocabulary-sized work); the banana/bandana fixture pin in
    tests/test_iterative_pins.py remains."""
    from ..registry import QUERIES

    merges = [
        (r["left"], r["right"], r["merged"])
        for r in sorted(
            QUERIES["text_bpe_learn"](spark, sf_dir).collect(),
            key=lambda r: r["round"],
        )
    ]
    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        "lang",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("tok"),
    )
    sym = F.expr("transform(sequence(1, length(tok)), i -> substring(tok, i, 1))")
    enc = words.select("lang", "tok", sym.alias("sym"))
    for left, right, merged in merges:
        fold = F.aggregate(
            "sym",
            F.expr("cast(array() as array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        enc = enc.select("lang", "tok", fold.alias("sym"))
    return (
        enc.groupBy("lang")
        .agg(
            bi(F.count(F.lit(1))).alias("n_words"),
            bi(F.sum(F.length("tok"))).alias("n_chars"),
            bi(F.sum(F.length("tok"))).alias("n_tokens_char_level"),
            bi(F.sum(F.size("sym"))).alias("n_tokens_bpe"),
        )
        .select(
            "lang",
            "n_words",
            "n_chars",
            "n_tokens_bpe",
            r6(F.col("n_chars") / F.col("n_tokens_bpe")).alias("chars_per_token"),
            r6(F.col("n_tokens_bpe") / F.col("n_tokens_char_level")).alias(
                "compression_vs_chars"
            ),
        )
    )
