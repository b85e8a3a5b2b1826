"""§2 round-2 addendum — behavioral analytics over the event stream.

The two canonical product-analytics shapes users run on an events table:

- events_cohort_retention — classic cohort/retention triangle: each user
  belongs to the cohort of their first-activity day; the matrix counts
  distinct active users per (cohort day, age-in-days). One window keyed
  on user_id computes first-activity without a join-back (the groupBy +
  re-join formulation shuffles the fact table twice; the window shuffles
  once), then a distinct + keyed count — every stage keyed, no global
  state.
- events_funnel_steps — ordered funnel (view → click → purchase) with
  strict event-time ordering between steps. Each stage is a keyed
  min-aggregate joined to the (shrinking) survivor set of the previous
  stage — the fact table is scanned once per step but each scan is
  filtered to one event type (predicate pushdown to the scan), and the
  survivor sets are user-cardinality, not event-cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6, um
from ..registry import query


@query(
    "events_cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ), a AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS age_days
      FROM events e JOIN f USING (user_id)
    )
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day, age_days, count(*) AS n_users
    FROM a GROUP BY cohort_day, age_days
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: cohort = first-activity day per user,
    age = days since cohort, cell = distinct active users. The first-day
    computation is a user-keyed window (single shuffle on user_id), the
    cell count a keyed distinct+agg — no join-back of a per-user
    aggregate onto the fact table."""
    e = t(spark, sf_dir, "events")
    day = F.to_date("ts")
    w = Window.partitionBy("user_id")
    active = e.select(
        "user_id",
        F.min(day).over(w).cast("string").alias("cohort_day"),
        F.datediff(day, F.min(day).over(w)).alias("age_days"),
    ).distinct()
    return active.groupBy("cohort_day", bi(F.col("age_days")).alias("age_days")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


@query(
    "events_funnel_steps",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
      GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT '1_view' AS step, (SELECT count(*) FROM s1) AS n_users
    UNION ALL
    SELECT '2_click', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT '3_purchase', (SELECT count(*) FROM s3)
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: users who viewed, then clicked after their
    first view, then purchased after that first qualifying click. Step N
    = user-keyed min-timestamp join against step N−1's survivors;
    event-type filters push down to each scan. Counts are monotone
    non-increasing by construction."""
    e = t(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = [
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("1_view").alias("step"), "n_users"
        ),
        s2.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("2_click").alias("step"), "n_users"
        ),
        s3.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit("3_purchase").alias("step"), "n_users"
        ),
    ]
    out = rows[0].unionAll(rows[1]).unionAll(rows[2])
    return out.select("step", bi(F.col("n_users")).alias("n_users"))


@query(
    "events_pathing_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_pathing_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix of user journeys: count (previous event →
    next event) pairs per user path. One user-keyed lag window (single
    shuffle on user_id) feeding a keyed count — transition cardinality is
    |types|², so the final agg is tiny regardless of stream size. The
    (ts, event_id) ordering pins simultaneous-event ties."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    return s.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "events_run_length",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS grp
      FROM events
    )
    SELECT user_id, event_type, count(*) AS run_len,
           min(event_id) AS first_event_id
    FROM s
    GROUP BY user_id, event_type, grp
    HAVING count(*) >= 2
    """,
)
def events_run_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of user activity — the generic gaps-and-islands
    rank-difference trick: two row_numbers over the SAME (ts, event_id)
    order (one per user, one per user+type) differ by a constant within
    each maximal run of equal event_type, so grouping on the difference
    recovers the runs. Both windows share the user-keyed shuffle; emits
    runs of length ≥ 2 (repeat-behavior detection)."""
    e = t(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        "event_type",
        "event_id",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
    )
    return (
        s.groupBy("user_id", "event_type", "grp")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("event_id").alias("first_event_id"),
        )
        .where(F.col("run_len") >= 2)
        .select("user_id", "event_type", "run_len", "first_event_id")
    )


@query(
    "events_entropy_by_user",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT user_id, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY 1
    )
    SELECT c.user_id, tot.total AS n_events,
           round(-sum((CAST(n AS DOUBLE) / total)
                      * ln(CAST(n AS DOUBLE) / total)), 6) AS entropy
    FROM c JOIN tot USING (user_id)
    GROUP BY c.user_id, tot.total
    """,
)
def events_entropy_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity signal (bots and single-purpose accounts sit
    near 0; explorers near ln|types|). Two keyed aggregates over the
    (user × type)-bounded count table; the entropy sum runs over ≤
    |types| rows per user, never raw events. Counts are exact integers
    on both engines, so the only float step is the final p·ln p."""
    e = t(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("user_id").agg(F.sum("n").alias("total"))
    p = F.col("n").cast("double") / F.col("total")
    return (
        c.join(tot, "user_id")
        .groupBy("user_id", F.col("total").alias("n_events"))
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
    )


@query(
    "events_next_event_baseline",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), trans AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ), pred AS (
      SELECT prev_type, next_type AS predicted
      FROM (SELECT prev_type, next_type,
                   row_number() OVER (PARTITION BY prev_type
                                      ORDER BY n DESC, next_type) AS rn
            FROM trans)
      WHERE rn = 1
    )
    SELECT s.prev_type, p.predicted,
           count(*) AS n_total,
           CAST(sum(CASE WHEN s.event_type = p.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(CAST(sum(CASE WHEN s.event_type = p.predicted THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS accuracy
    FROM s JOIN pred p ON s.prev_type = p.prev_type
    GROUP BY s.prev_type, p.predicted
    """,
)
def events_next_event_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-class next-event baseline, trained and scored in one plan:
    the transition matrix picks each context's most frequent successor
    (pinned tie-break), and in-sample accuracy per context is the floor
    any sequence model must beat. The model table is |types|²-bounded and
    broadcast back onto the lagged stream — one user-keyed window
    shuffle, one keyed count, one broadcast join; the eval never
    re-shuffles the event stream."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    trans = s.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type").orderBy(F.desc("n"), F.asc("next_type"))
    pred = (
        trans.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .select("prev_type", F.col("next_type").alias("predicted"))
    )
    hit = F.when(F.col("event_type") == F.col("predicted"), 1).otherwise(0)
    return (
        s.join(F.broadcast(pred), "prev_type")
        .groupBy("prev_type", "predicted")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(hit).cast("long").alias("n_correct"),
            F.round(
                F.sum(hit).cast("double") / F.count(F.lit(1)), 6
            ).alias("accuracy"),
        )
    )


@query(
    "events_ab_ttest",
    oracle="""
    WITH arms AS (
      SELECT
        count(*) FILTER (WHERE event_type = 'click')    AS n_a,
        count(*) FILTER (WHERE event_type = 'purchase') AS n_b,
        avg(value) FILTER (WHERE event_type = 'click')    AS m_a,
        avg(value) FILTER (WHERE event_type = 'purchase') AS m_b,
        var_samp(value) FILTER (WHERE event_type = 'click')    AS v_a,
        var_samp(value) FILTER (WHERE event_type = 'purchase') AS v_b
      FROM events
      WHERE event_type IN ('click', 'purchase')
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(m_a, 6) AS mean_a, round(m_b, 6) AS mean_b,
           round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 6) AS t_stat,
           round(pow(v_a / n_a + v_b / n_b, 2)
                 / (pow(v_a / n_a, 2) / (n_a - 1) + pow(v_b / n_b, 2) / (n_b - 1)),
                 6) AS df_welch
    FROM arms
    """,
)
def events_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test between two event arms ('click' as A,
    'purchase' as B) — the A/B-experiment readout every analytics
    pipeline ships. ONE conditional-aggregation pass over the filtered
    stream computes both arms' count/mean/variance (algebraic, partial+
    final — a 100 TB experiment is still one shuffle of 6 partials);
    the t statistic and Welch–Satterthwaite degrees of freedom are scalar
    arithmetic on the one-row result. Variances are O(2e3)-magnitude
    sums, so r6 rounding dominates float summation-order error on both
    engines (parity.py policy)."""
    ev = t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    is_a = F.col("event_type") == "click"
    is_b = F.col("event_type") == "purchase"
    arms = ev.agg(
        F.count(F.when(is_a, 1)).alias("n_a"),
        F.count(F.when(is_b, 1)).alias("n_b"),
        F.avg(F.when(is_a, F.col("value"))).alias("m_a"),
        F.avg(F.when(is_b, F.col("value"))).alias("m_b"),
        F.var_samp(F.when(is_a, F.col("value"))).alias("v_a"),
        F.var_samp(F.when(is_b, F.col("value"))).alias("v_b"),
    )
    se2 = F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    return arms.select(
        bi(F.col("n_a")).alias("n_a"),
        bi(F.col("n_b")).alias("n_b"),
        F.round(F.col("m_a"), 6).alias("mean_a"),
        F.round(F.col("m_b"), 6).alias("mean_b"),
        F.round((F.col("m_a") - F.col("m_b")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v_a") / F.col("n_a"), 2) / (F.col("n_a") - 1)
                + F.pow(F.col("v_b") / F.col("n_b"), 2) / (F.col("n_b") - 1)
            ),
            6,
        ).alias("df_welch"),
    )


@query(
    "events_conversion_latency",
    oracle="""
    WITH fv AS (
      SELECT user_id, min(epoch_us(ts)) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), conv AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS first_purchase, any_value(fv.first_view) AS first_view
      FROM events e JOIN fv ON fv.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.first_view
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM fv)                                        AS n_viewers,
           count(*)                                                         AS n_converted,
           round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM fv), 6)   AS conv_rate,
           round(avg((first_purchase - first_view) / 1e6), 6)               AS avg_latency_s,
           round(min((first_purchase - first_view) / 1e6), 6)               AS min_latency_s,
           round(max((first_purchase - first_view) / 1e6), 6)               AS max_latency_s
    FROM conv
    """,
)
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion latency: per user, the first 'view' and
    the first 'purchase' AT OR AFTER it (purchases before ever viewing
    don't convert); reports the viewer count, converted count, conversion
    rate, and exact latency stats in seconds. One window keyed on user_id
    carries first-view onto every event (single shuffle — no fact-table
    re-join), then one user-keyed agg and one global reduce; timestamps
    compare as exact epoch microseconds (um — the parity-safe integer
    lane), divided to seconds only at the end."""
    from ..functions.parity import r6, um

    e = t(spark, sf_dir, "events").select("user_id", "event_type", um("ts").alias("us"))
    w = Window.partitionBy("user_id")
    fv = F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w)
    per_user = (
        e.withColumn("first_view", fv)
        .filter(F.col("first_view").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("us") >= F.col("first_view")),
                    F.col("us"),
                )
            ).alias("first_purchase"),
            F.first("first_view").alias("first_view"),
        )
    )
    lat_s = (F.col("first_purchase") - F.col("first_view")) / F.lit(1e6)
    return per_user.agg(
        F.count(F.lit(1)).alias("n_viewers"),
        F.count("first_purchase").alias("n_converted"),
        r6(F.count("first_purchase") / F.count(F.lit(1))).alias("conv_rate"),
        r6(F.avg(lat_s)).alias("avg_latency_s"),
        r6(F.min(lat_s)).alias("min_latency_s"),
        r6(F.max(lat_s)).alias("max_latency_s"),
    )


@query(
    "events_sequence_pattern",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(CASE event_type WHEN 'click' THEN 'c' WHEN 'error' THEN 'e'
                        WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                        ELSE 'v' END, '' ORDER BY ts, event_id) AS s,
             count(*) AS n_events
      FROM events
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_events AS BIGINT) AS n_events,
           regexp_matches(s, 's.*v.*p') AS signup_view_purchase,
           CAST(len(regexp_extract_all(s, 'vp')) AS BIGINT) AS n_direct_view_purchase,
           CAST(len(regexp_extract_all(s, 'ee+')) AS BIGINT) AS n_error_bursts
    FROM seq
    """,
)
def events_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequential pattern detection, the
    composable-DataFrame way: each user's event history collapses to a
    compact symbol string under the deterministic (ts, event_id) total
    order — one char per event — and patterns become ordinary regexes
    over that string: an ordered signup→…→view→…→purchase funnel
    (subsequence match), direct view→purchase adjacencies, and error
    bursts (runs of ≥ 2). ONE user-keyed agg builds the sequence
    (array_sort on (epoch, id, symbol) structs → in-row projection to
    chars), regexes run in the same codegen stage — no window, no join,
    no reparse per pattern. Per-user state is bounded by per-user event
    count, the natural partition grain; a 10⁸-event user wants the
    streaming stateful twin instead (same boundary as ts_ewma_fold)."""
    e = t(spark, sf_dir, "events")
    sym = (
        F.when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "error", "e")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("v")
    )
    seq = (
        e.select(
            "user_id",
            F.struct(um("ts").alias("t"), F.col("event_id").alias("i"), sym.alias("ch")).alias("ev"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(F.transform(F.array_sort(F.collect_list("ev")), lambda s: s["ch"]), "").alias("s"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return seq.select(
        "user_id",
        bi(F.col("n_events")).alias("n_events"),
        F.col("s").rlike("s.*v.*p").alias("signup_view_purchase"),
        bi(F.size(F.regexp_extract_all(F.col("s"), F.lit("vp"), F.lit(0)))).alias("n_direct_view_purchase"),
        bi(F.size(F.regexp_extract_all(F.col("s"), F.lit("ee+"), F.lit(0)))).alias("n_error_bursts"),
    )


@query(
    "events_active_streaks",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    g AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS grp
      FROM d
    ),
    runs AS (
      SELECT user_id, min(day) AS streak_start, max(day) AS streak_end, count(*) AS streak_days
      FROM g GROUP BY user_id, grp
    )
    SELECT user_id, CAST(streak_start AS VARCHAR) AS streak_start,
           CAST(streak_end AS VARCHAR) AS streak_end,
           CAST(streak_days AS BIGINT) AS streak_days
    FROM runs
    WHERE streak_days >= 3
    """,
)
def events_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active days per user
    (reported at ≥ 3 days) — the retention-streak query every product
    analytics stack ships, and the canonical SQL islands idiom: group
    key = day − row_number(), constant exactly while days are
    consecutive. Everything is user-keyed — the dedup, the window, the
    run agg — so one shuffle partitioning serves all three stages and
    per-user state is bounded by active-day counts (≤ 1 row per
    calendar day after the distinct)."""
    e = t(spark, sf_dir, "events")
    d = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn("grp", F.date_sub("day", F.row_number().over(w)))
    return (
        g.groupBy("user_id", "grp")
        .agg(
            F.min("day").cast("string").alias("streak_start"),
            F.max("day").cast("string").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        .where(F.col("streak_days") >= 3)
        .select("user_id", "streak_start", "streak_end", bi(F.col("streak_days")).alias("streak_days"))
    )


@query(
    "events_power_users_hhi",
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, sum(c) AS n, max(c) AS top_c, count(*) AS n_users
      FROM per_user GROUP BY 1
    )
    SELECT p.event_type,
           CAST(t.n_users AS BIGINT) AS n_users,
           CAST(t.n AS BIGINT) AS n_events,
           round(sum(power(p.c / CAST(t.n AS DOUBLE), 2)), 6) AS hhi,
           round(t.top_c / CAST(t.n AS DOUBLE), 6) AS top_user_share
    FROM per_user p JOIN tot t USING (event_type)
    GROUP BY p.event_type, t.n_users, t.n, t.top_c
    """,
)
def events_power_users_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration per stream — the Herfindahl–Hirschman index
    over user shares (1/n_users = perfectly even, 1.0 = single-user
    stream) plus the top user's share: the diagnostic that tells a
    training-data pipeline when a 'popular' source is really three bots
    (pairs with events_bot_detection — that op flags users, this one
    flags STREAMS). Two aggregations both keyed by (event_type[, user]):
    the per-user counts reduce to stream grain, totals broadcast back as
    a dimension — no window, no global state; shares are squared and
    summed in one keyed agg."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("c"))
    tot = per_user.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.max("c").alias("top_c"),
        F.count(F.lit(1)).alias("n_users"),
    )
    joined = per_user.join(F.broadcast(tot), "event_type")
    return (
        joined.groupBy("event_type", "n_users", "n", "top_c")
        .agg(F.sum(F.pow(F.col("c") / F.col("n").cast("double"), 2)).alias("h"))
        .select(
            "event_type",
            bi(F.col("n_users")).alias("n_users"),
            bi(F.col("n")).alias("n_events"),
            r6(F.col("h")).alias("hhi"),
            r6(F.col("top_c") / F.col("n").cast("double")).alias("top_user_share"),
        )
    )


@query(
    "events_dau_stickiness",
    oracle="""
    WITH day_users AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (
      SELECT DISTINCT day FROM day_users
    ), m AS (
      SELECT d.day,
             count(DISTINCT du.user_id) FILTER (WHERE du.day = d.day) AS dau,
             count(DISTINCT du.user_id) FILTER (
               WHERE du.day BETWEEN d.day - INTERVAL 6 DAY AND d.day) AS wau,
             count(DISTINCT du.user_id) FILTER (
               WHERE du.day BETWEEN d.day - INTERVAL 27 DAY AND d.day) AS mau
      FROM days d
      JOIN day_users du ON du.day BETWEEN d.day - INTERVAL 27 DAY AND d.day
      GROUP BY d.day
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
           CAST(mau AS BIGINT) AS mau,
           round(dau / CAST(mau AS DOUBLE), 6) AS stickiness
    FROM m
    """,
)
def events_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DAU/WAU/MAU triple + stickiness (DAU/MAU) per day — the
    engagement dashboard's first row. One corpus-sized shuffle only (the
    (day, user) DISTINCT); the 28-day expansion joins DAY-GRAIN
    aggregates (events_rolling_dau's shape, widened to three windows
    computed from ONE expansion with conditional distincts — not three
    joins). DAU/MAU is an exact integer ratio → identical doubles both
    engines. At 100 TB: day_users is the table you persist daily; each
    day's triple merges 28 daily partitions, never raw events."""
    e = t(spark, sf_dir, "events")
    day_users = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = day_users.select("day").distinct()
    d = days.select(F.col("day").alias("anchor"))
    expanded = d.join(
        day_users,
        (F.col("day") >= F.date_sub(F.col("anchor"), 27))
        & (F.col("day") <= F.col("anchor")),
    )
    m = expanded.groupBy("anchor").agg(
        F.countDistinct(F.when(F.col("day") == F.col("anchor"), F.col("user_id"))).alias("dau"),
        F.countDistinct(
            F.when(F.col("day") >= F.date_sub(F.col("anchor"), 6), F.col("user_id"))
        ).alias("wau"),
        F.countDistinct("user_id").alias("mau"),
    )
    return m.select(
        F.col("anchor").cast("string").alias("day"),
        bi(F.col("dau")).alias("dau"),
        bi(F.col("wau")).alias("wau"),
        bi(F.col("mau")).alias("mau"),
        r6(F.col("dau") / F.col("mau").cast("double")).alias("stickiness"),
    )


@query(
    "events_cumulative_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY 1
    ),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    new_per_day AS (
      SELECT first_day AS day, count(*) AS n_new FROM firsts GROUP BY 1
    )
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new_users,
           CAST(sum(COALESCE(n.n_new, 0)) OVER (ORDER BY d.day) AS BIGINT)
             AS cumulative_users
    FROM days d LEFT JOIN new_per_day n ON n.day = d.day
    """,
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users to date — the growth curve, and the
    classic 'running COUNT(DISTINCT) window' problem that has no native
    window form: a naive distinct-over-expanding-frame re-counts the
    whole prefix per day (quadratic). The linear identity: each user
    counts exactly once, on their FIRST day — so one user-keyed min, a
    day-grain new-user count, and a day-grain running sum produce the
    exact cumulative distinct. The only corpus-sized shuffle is the
    user min; everything after is calendar-bounded (§R class 3). This
    identity is also the streaming form (first-seen state per user)."""
    e = t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    days = e.select(F.to_date("ts").alias("day")).distinct()
    new_per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined = days.join(new_per_day, "day", "left").select(
        "day", F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new")
    )
    return joined.select(
        F.col("day").cast("string").alias("day"),
        bi(F.col("n_new")).alias("n_new_users"),
        bi(F.sum("n_new").over(w)).alias("cumulative_users"),
    )


@query(
    "events_conversion_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type, 1) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2,
             lag(event_type, 3) OVER w AS p3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT concat(COALESCE(p3, '_'), '>', COALESCE(p2, '_'), '>',
                  COALESCE(p1, '_')) AS path,
           CAST(count(*) AS BIGINT) AS n_conversions
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1
    ORDER BY n_conversions DESC, path
    LIMIT 15
    """,
)
def events_conversion_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top paths-to-conversion: the exact 3-event sequence preceding each
    purchase (start-of-history padded with '_'), counted and ranked —
    the attribution view that answers 'what do users DO right before
    buying' at path grain, where events_pathing_transitions answers it
    at single-step grain and events_attribution_lasttouch at channel
    grain. One user-keyed window (three lags share one sort), path
    cardinality is |types|³-bounded so the count agg is tiny, final is
    TakeOrderedAndProject under (count desc, path asc)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
        F.lag("event_type", 3).over(w).alias("p3"),
    )
    path = F.concat_ws(
        ">",
        F.coalesce(F.col("p3"), F.lit("_")),
        F.coalesce(F.col("p2"), F.lit("_")),
        F.coalesce(F.col("p1"), F.lit("_")),
    )
    return (
        seq.where(F.col("event_type") == "purchase")
        .select(path.alias("path"))
        .groupBy("path")
        .agg(bi(F.count(F.lit(1))).alias("n_conversions"))
        .orderBy(F.desc("n_conversions"), F.asc("path"))
        .limit(15)
    )


@query(
    "events_churn_flags",
    oracle="""
    WITH g AS (SELECT max(CAST(ts AS DATE)) AS corpus_max FROM events),
    u AS (
      SELECT user_id,
             max(CAST(ts AS DATE)) AS last_day,
             min(CAST(ts AS DATE)) AS first_day,
             count(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT u.user_id,
           CAST(u.n_events AS BIGINT) AS n_events,
           CAST(u.last_day AS VARCHAR) AS last_day,
           CAST(date_diff('day', u.last_day, g.corpus_max) AS BIGINT) AS inactive_days,
           date_diff('day', u.last_day, g.corpus_max) > 7 AS churned,
           date_diff('day', u.first_day, g.corpus_max) <= 7 AS is_new
    FROM u CROSS JOIN g
    """,
)
def events_churn_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User lifecycle flags against the corpus frontier: inactive days
    since last activity, churned (> 7 idle days), and new (first seen
    within the last week) — the segmentation every lifecycle email/
    re-engagement system keys on, and dq_freshness_sla's shape moved to
    USER grain. One user-keyed agg + a 1-row frontier broadcast; flags
    compare exact integer day differences (§5.3-clean). At 100 TB the
    per-user (first, last, n) triple is a mergeable daily rollup —
    min/max/sum algebra — so the daily job merges yesterday's triple
    with today's partition, never re-scanning history."""
    e = t(spark, sf_dir, "events")
    g = e.agg(F.max(F.to_date("ts")).alias("corpus_max"))
    u = e.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.min(F.to_date("ts")).alias("first_day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    j = u.crossJoin(F.broadcast(g))
    inactive = F.datediff("corpus_max", "last_day")
    return j.select(
        "user_id",
        bi(F.col("n_events")).alias("n_events"),
        F.col("last_day").cast("string").alias("last_day"),
        bi(inactive).alias("inactive_days"),
        (inactive > 7).alias("churned"),
        (F.datediff("corpus_max", "first_day") <= 7).alias("is_new"),
    )
