"""§2-C Joins.

Scale strategy per join class (SURVEY.md §4):

- dimension joins (nation/region/customer at this ratio) → broadcast hash
  join, no shuffle of the fact side; Catalyst picks this automatically via
  `autoBroadcastJoinThreshold`, `join_broadcast` pins it with a hint;
- fact-fact equi-joins → shuffled hash / sort-merge on the key, AQE handles
  skew splitting at runtime;
- the interval self-join is bucket-bounded (equi-join on a coarse time
  bucket + residual range predicate) so the per-key pair space stays O(rows
  per bucket), not O(rows per user)² — the 100-TB-safe range-join shape;
- as-of has no native Spark operator → union-tag + running last() window,
  one shuffle by (user), no join blowup at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import r2, r6, um
from ..registry import query


@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_multiway",
    oracle="""
    SELECT
      n_name,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      count(*)                                          AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped 5-way join, associated for ONE fact shuffle (round 4):
    the selective region filter reduces nation→customer FIRST (broadcast
    chain — the reduced customer dim is region-fraction-sized and stays
    broadcastable), that dim pushes into the filtered orders side, and
    only THEN does lineitem join — so the single corpus-scale exchange
    is lineitem⋈orders on the order key. The round-3 ordering joined
    lineitem⋈orders first and then shuffled the fact stream AGAIN on
    o_custkey against the (not-broadcastable-by-stats) customer table —
    two fact shuffles. The orders⋈customer edge is deliberately
    UNhinted: customer is unbounded at 100 TB, so whether that dim-scale
    join broadcasts is AQE's runtime-stats call, not a hardcoded hint
    (nation/region stay hinted — genuinely bounded). At 100 TB the same
    ordering holds: dim reduction before the fact exchange is the
    semi-join-push every optimizer with stats would pick; the one
    orderkey shuffle that remains is the bucketing target
    (join_bucketed_colocated).

    Round 5: the fact join carries a SHUFFLE_HASH hint. Catalyst's
    default for two "large" sides is sort-merge, which SORTS the entire
    probe stream; but the build side here is the dimension-reduced,
    date-bounded order stream — structurally a bounded fraction of
    orders and orders of magnitude under the lineitem probe — so
    hash-build-the-small-side is strictly less work than sorting both
    (the exact asymmetry SMJ exists to avoid paying when NEITHER side is
    small). Measured: sf30 (180M-row probe) 13 s → 4.8 s, sf0.1
    1.4 → 0.7 s. Per-partition build memory is the contract: it shrinks
    with shuffle partitions, which scale with the cluster; remove the
    hint to fall back to SMJ if a deployment's order stream is not
    date-bounded."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    c_dim = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    o_keep = o.join(c_dim, o.o_custkey == c_dim.c_custkey).select(
        "o_orderkey", "n_name"
    )
    return (
        li.join(o_keep.hint("shuffle_hash"), li.l_orderkey == o_keep.o_orderkey)
        .groupBy("n_name")
        .agg(
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_left",
    oracle="""
    SELECT
      c_custkey,
      c_mktsegment,
      count(o_orderkey)                         AS n_orders,
      round(sum(coalesce(o_totalprice, 0)), 2)  AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN keeping customers without orders (count(col) skips nulls)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            r2(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)))).alias("total_spent"),
        )
    )


@query(
    "join_right",
    oracle="""
    SELECT
      o_orderstatus,
      count(c_custkey) AS n_with_customer,
      count(*)         AS n_rows
    FROM customer
    RIGHT JOIN orders ON c_custkey = o_custkey
    GROUP BY o_orderstatus
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "right")
        .groupBy("o_orderstatus")
        .agg(F.count("c_custkey").alias("n_with_customer"), F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "join_full",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nationkey, count(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ), s AS (
      SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT
      coalesce(c.nationkey, s.nationkey) AS nationkey,
      coalesce(n_customers, 0)           AS n_customers,
      coalesce(n_suppliers, 0)           AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER over per-nation customer/supplier rollups."""
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c.c_nk == s.s_nk, "full").select(
        F.coalesce(c.c_nk, s.s_nk).alias("nationkey"),
        F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi join: probe side streams, no duplication."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicitly broadcast-hinted dimension join (plan asserted in
    tests/test_plans.py). Same answer as the unhinted planner choice."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), r2(F.sum("c_acctbal")).alias("acctbal"))
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (both sides tiny — 5 × 25)."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_theta",
    oracle="""
    SELECT
      o_orderstatus,
      count(*)                                                                       AS n_late_ship,
      round(avg(floor((epoch(l_shipdate) - epoch(o_orderdate)) / 86400.0)), 6)       AS avg_gap_days
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    GROUP BY o_orderstatus
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + residual theta predicate: planned as a hash join on the
    key with the range condition applied as a post-join filter — never a
    cartesian product."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    gap_days = F.floor(
        (F.unix_timestamp("l_shipdate") - F.unix_timestamp("o_orderdate")) / F.lit(86400.0)
    )
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_late_ship"),
            r6(F.avg(gap_days)).alias("avg_gap_days"),
        )
    )


@query(
    "join_range_interval",
    oracle="""
    SELECT e1.user_id, count(*) AS n_pairs
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    GROUP BY e1.user_id
    """,
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event pairs within (0, 1h]. Spark has no range-join rule, so a naive
    (user_id) self-join degenerates to O(per-user²) comparisons. We bound it
    by bucketing time into 1-hour epochs and equi-joining on (user, bucket)
    where the left side expands to its own and the next bucket — every
    qualifying pair lands in exactly one of those two buckets, and the join
    key carries time locality, which holds at any scale."""
    e = t(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    left = e.select(
        F.col("user_id").alias("u"), F.col("ts").alias("ts1"), (epoch / 3600).cast("long").alias("b")
    ).withColumn("bucket", F.explode(F.array(F.col("b"), F.col("b") + 1)))
    right = e.select(
        F.col("user_id").alias("u2"),
        F.col("ts").alias("ts2"),
        (epoch / 3600).cast("long").alias("bucket2"),
    )
    pairs = left.join(
        right,
        (F.col("u") == F.col("u2"))
        & (F.col("bucket") == F.col("bucket2"))
        & (F.col("ts2") > F.col("ts1"))
        & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 1 HOUR")),
    )
    return pairs.groupBy(F.col("u").alias("user_id")).agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "join_asof",
    oracle="""
    SELECT
      p.event_id,
      p.user_id,
      p.ts AS purchase_ts,
      (SELECT max(c.ts) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts) AS last_click_ts,
      epoch_us(p.ts) - (SELECT epoch_us(max(c.ts)) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts) AS gap_us
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward, inclusive) join: each purchase matched to the same
    user's latest click at-or-before it. No native as-of in Spark SQL →
    union-tag + running max over a (user)-partitioned window ordered by
    (ts, tag, event_id): one shuffle, zero join amplification. This is also
    the 100-TB shape — cost is a sort within user partitions."""
    e = t(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin("click", "purchase")).withColumn(
        "tag", F.when(F.col("event_type") == "click", 0).otherwise(1)
    )
    # clicks sort before purchases at equal ts → inclusive (<=) semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_click = tagged.withColumn(
        "last_click_ts", F.max(F.when(F.col("tag") == 0, F.col("ts"))).over(w)
    )
    return with_click.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
        # integer microseconds: unix_timestamp() floors to seconds and
        # DuckDB's epoch() keeps fractions — both divergent (SURVEY.md §5.3)
        (um("ts") - um("last_click_ts")).alias("gap_us"),
    )


@query(
    "join_interval_overlap",
    oracle="""
    SELECT v.user_id, count(*) AS n_overlaps
    FROM (SELECT user_id, epoch_us(ts) AS s,
                 epoch_us(ts) + CAST(floor(value) AS BIGINT) * 60000000 AS e
          FROM events WHERE event_type = 'view') v
    JOIN (SELECT user_id, epoch_us(ts) AS s,
                 epoch_us(ts) + CAST(floor(value) AS BIGINT) * 60000000 AS e
          FROM events WHERE event_type = 'click') c
      ON v.user_id = c.user_id AND v.s < c.e AND c.s < v.e
    GROUP BY v.user_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (both sides are intervals, overlap iff
    s₁<e₂ ∧ s₂<e₁): view-intervals × click-intervals per user. The naive
    formulation is a per-user cartesian; we bucket time into 1-hour
    epochs, explode each interval over the buckets it touches, equi-join
    on (user, bucket), and de-duplicate pairs that met in several buckets
    — the join key carries time locality, so work scales with co-located
    intervals, not per-user volume. Durations are floor(value)
    minutes (≤ ~5.5 h) so the explode factor is ≤ 7; at 100 TB the
    bucket width is tuned to the P99 duration to bound it."""
    e = t(spark, sf_dir, "events")
    s_us = um("ts")
    e_us = um("ts") + F.floor(F.col("value")).cast("long") * F.lit(60_000_000).cast("long")
    _HOUR_US = 3_600_000_000

    def side(etype: str, tag: str) -> DataFrame:
        iv = e.where(F.col("event_type") == etype).select(
            F.col("user_id").alias(f"u_{tag}"),
            F.col("event_id").alias(f"id_{tag}"),
            s_us.alias(f"s_{tag}"),
            e_us.alias(f"e_{tag}"),
        )
        return iv.withColumn(
            f"bkt_{tag}",
            F.explode(
                F.sequence(
                    (F.col(f"s_{tag}") / _HOUR_US).cast("long"),
                    ((F.col(f"e_{tag}") - 1) / _HOUR_US).cast("long"),
                )
            ),
        )

    v, c = side("view", "v"), side("click", "c")
    pairs = (
        v.join(
            c,
            (F.col("u_v") == F.col("u_c"))
            & (F.col("bkt_v") == F.col("bkt_c"))
            & (F.col("s_v") < F.col("e_c"))
            & (F.col("s_c") < F.col("e_v")),
        )
        .select("u_v", "id_v", "id_c")
        .distinct()
    )
    return pairs.groupBy(F.col("u_v").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_overlaps")
    )


@query(
    "join_asof_forward",
    oracle="""
    SELECT
      p.event_id,
      p.user_id,
      p.ts AS purchase_ts,
      (SELECT min(c.ts) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts >= p.ts)
        AS next_click_ts,
      (SELECT epoch_us(min(c.ts)) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts >= p.ts)
        - epoch_us(p.ts) AS gap_us
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join — the mirror of join_asof: each purchase matched
    to the same user's EARLIEST click at-or-after it (the "what happened
    next" direction used for post-event effect measurement). Same
    single-shuffle window shape, with the frame flipped to currentRow →
    unboundedFollowing and purchases sorting BEFORE clicks at equal ts so
    the inclusive (>=) boundary holds."""
    e = t(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin("click", "purchase")).withColumn(
        "tag", F.when(F.col("event_type") == "click", 1).otherwise(0)
    )
    # purchases (tag 0) sort before clicks (tag 1) at equal ts → inclusive >=
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    with_click = tagged.withColumn(
        "next_click_ts", F.min(F.when(F.col("tag") == 1, F.col("ts"))).over(w)
    )
    return with_click.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "next_click_ts",
        (um("next_click_ts") - um("ts")).alias("gap_us"),
    )


@query(
    "join_null_safe_eq",
    oracle="""
    WITH c AS (SELECT c_custkey, nullif(c_nationkey, 3) AS ck FROM customer),
    n AS (SELECT n_name, nullif(n_nationkey, 3) AS nk FROM nation)
    SELECT n.n_name, (n.nk IS NULL) AS via_null,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM c JOIN n ON c.ck IS NOT DISTINCT FROM n.nk
    GROUP BY n.n_name, (n.nk IS NULL)
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): one nation key
    is deliberately nulled on BOTH sides, and the null-safe predicate
    still matches those rows (NULL <=> NULL is TRUE, unlike NULL = NULL
    which is UNKNOWN and would drop every such customer). The via_null
    flag isolates the rows that only exist because of null-safe
    semantics. Planning note: Spark treats <=> as an equi-key, so this
    still hash-joins (broadcast here — nation is tiny); an `OR (a IS NULL
    AND b IS NULL)` rewrite would degrade to a nested-loop join at
    scale."""
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey"), F.lit(3)).alias("ck")
    )
    nat = t(spark, sf_dir, "nation").select(
        "n_name", F.nullif(F.col("n_nationkey"), F.lit(3)).alias("nk")
    )
    return (
        cust.join(F.broadcast(nat), cust["ck"].eqNullSafe(nat["nk"]))
        .groupBy("n_name", F.col("nk").isNull().alias("via_null"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_asof_tolerance",
    oracle="""
    SELECT
      p.event_id,
      p.user_id,
      p.ts AS purchase_ts,
      CASE WHEN epoch_us(p.ts) - (SELECT epoch_us(max(c.ts)) FROM events c
             WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts)
           <= 3600000000
           THEN (SELECT max(c.ts) FROM events c
                 WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts)
      END AS last_click_ts,
      (SELECT max(c.ts) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts)
        IS NOT NULL
      AND epoch_us(p.ts) - (SELECT epoch_us(max(c.ts)) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts)
          > 3600000000 AS dropped_by_tolerance
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas merge_asof's `tolerance`,
    QuestDB/kdb ASOF ... WITHIN): the backward match only counts if the
    click is within 1 hour of the purchase — staler state is worse than
    no state for attribution and feature-join use cases, and the
    tolerance is also what lets a STREAMING as-of expire its state
    (unbounded as-of state never frees; join_asof documents the
    unbounded form). Same one-shuffle union-tag window as join_asof —
    the tolerance is a post-window projection, not a join predicate, so
    the plan is identical plus one filter; dropped_by_tolerance reports
    exactly the matches the bound discarded."""
    e = t(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin("click", "purchase")).withColumn(
        "tag", F.when(F.col("event_type") == "click", 0).otherwise(1)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_click = tagged.withColumn(
        "raw_click_ts", F.max(F.when(F.col("tag") == 0, F.col("ts"))).over(w)
    )
    gap = um("ts") - um("raw_click_ts")
    return with_click.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(gap <= 3_600_000_000, F.col("raw_click_ts")).alias("last_click_ts"),
        (F.col("raw_click_ts").isNotNull() & (gap > 3_600_000_000)).alias(
            "dropped_by_tolerance"
        ),
    )
