"""§2 round-2 addendum — distribution patterns for hostile data shapes.

Every operator here computes something round 1 already could — a join, an
aggregate, an upsert — but declares the *distribution strategy* a 100 TB
deployment needs when the data shape turns hostile (skewed keys, continual
appends, dimension churn). Each is oracled against the straightforward
one-shot SQL, proving the scaled shape is answer-preserving:

- join_salted_skew      — salt-replicated join: hot key's rows spread over
  S tasks instead of one straggler (AQE skew-split is the automatic twin;
  salting is the deterministic, planner-independent form);
- agg_salted_twophase   — two-phase salted aggregate for low-cardinality
  hot groups (beyond what map-side combine already absorbs);
- agg_incremental_merge — persisted algebraic partial state re-merged to
  the exact global answer: the incremental/materialized-view pattern (new
  partitions aggregate alone, old state is never rescanned); the sketch
  twin for non-algebraic aggs is agg_hll/quantile_mergeable;
- merge_upsert          — SCD1 MERGE as a keyed full-outer reconcile
  (partition-overwrite on write is the 100 TB deployment of it);
- scd2_intervals        — type-2 history (gaps-and-islands over a keyed
  window, one shuffle by entity);
- sample_stratified     — per-stratum deterministic hash sampling, the
  reproducible downsampling primitive (engine-portable multiplicative
  hash, no RNG, membership stable under appends/repartitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r2, r6, um
from ..registry import query
from .sources import _scratch

_SALT = 8
_AGG_SALT = 16
_KNUTH = 2654435761  # Knuth multiplicative hash constant (2^32 / phi)


@query(
    "join_salted_skew",
    oracle="""
    SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*)                                          AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant equi-join via deterministic salting: the fact side
    derives salt = l_linenumber mod S (no RNG — reproducible), the build
    side replicates each row S× with an exploded salt column, and the join
    key becomes (key, salt) — a hot orderkey's lineitems now land on S
    tasks instead of one straggler. Replication cost is S× the *build*
    side only; pick S ≈ (hottest-key rows / target task rows). AQE's
    runtime skew-split does this automatically per skewed partition; the
    explicit form works under any planner and for deliberately adversarial
    keys. Oracled against the unsalted join — answer-preserving.

    Round-10 skew rung (BASELINE.md, 30%-hot-key sf10, fresh JVMs):
    salting cuts the straggler's max task 8.07 -> 4.74 s but pays the 8x
    build replication every run (wall 10.6 vs 11.0 s unsalted), while
    the shipped session posture — AQE skew split with the 64m detection
    threshold — halves the wall outright (5.76 s, max task 3.73 s). So
    the DEFAULT is tuned AQE; reach for the salt only when the planner
    can't help (non-AQE engines, deliberately adversarial keys, or
    aggregation skew AQE's join-split doesn't cover)."""
    li = t(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_linenumber"), F.lit(_SALT))
    )
    o = t(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1)))
    )
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt))
        .groupBy("o_orderpriority")
        .agg(
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "agg_salted_twophase",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity), 2)      AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(*)                       AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for pathologically hot groups: phase 1
    aggregates by (key, salt) spreading each key over S reducers, phase 2
    re-aggregates the S partials per key. Spark's map-side combine already
    absorbs most of this for algebraic aggs — the explicit salt matters
    when combiners can't keep up (huge per-mapper cardinality) or for
    holistic aggs where partials must be bounded. Both shuffles are keyed
    and tiny (S rows per key after phase 1). Answer-preserving (oracled
    against the direct groupBy; float-sum reorder is absorbed by the
    rounding policy)."""
    li = t(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_orderkey"), F.lit(_AGG_SALT))
    )
    partial = li.groupBy("l_returnflag", "salt").agg(
        F.sum("l_quantity").alias("p_qty"),
        F.sum("l_extendedprice").alias("p_price"),
        F.count(F.lit(1)).alias("p_n"),
    )
    return partial.groupBy("l_returnflag").agg(
        r2(F.sum("p_qty")).alias("sum_qty"),
        r2(F.sum("p_price")).alias("sum_price"),
        F.sum("p_n").alias("n_items"),
    )


@query(
    "agg_incremental_merge",
    oracle="""
    SELECT o_orderstatus,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS revenue,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           round(avg(o_totalprice), 6) AS avg_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation via persisted algebraic state: per
    (status, year) partial states (count/sum/min/max) are materialized to
    parquet — the state a nightly job keeps per ingest partition — then
    read back and merged to the exact global answer (avg derives from
    merged sum/count, never averaged averages). At 100 TB only new
    partitions are scanned; history is |groups×partitions| rows of
    constant-size state. Exact twin of the sketch-merge pattern
    (agg_hll_mergeable / agg_quantile_mergeable) for non-algebraic aggs."""
    o = t(spark, sf_dir, "orders")
    state_path = _scratch(sf_dir, "agg_state_orders")
    state = o.groupBy("o_orderstatus", F.year("o_orderdate").alias("o_year")).agg(
        F.count(F.lit(1)).alias("s_n"),
        F.sum("o_totalprice").alias("s_sum"),
        F.min("o_totalprice").alias("s_min"),
        F.max("o_totalprice").alias("s_max"),
    )
    state.write.mode("overwrite").parquet(state_path)
    merged = spark.read.parquet(state_path)
    return merged.groupBy("o_orderstatus").agg(
        F.sum("s_n").alias("n_orders"),
        r2(F.sum("s_sum")).alias("revenue"),
        r2(F.min("s_min")).alias("min_price"),
        r2(F.max("s_max")).alias("max_price"),
        r6(F.sum("s_sum") / F.sum("s_n")).alias("avg_price"),
    )


@query(
    "merge_upsert",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 10 != 0
    ), upd AS (
      SELECT o_orderkey, round(o_totalprice + 1000.0, 2) AS u_price, 'U' AS u_status
      FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT
      coalesce(b.o_orderkey, u.o_orderkey) AS o_orderkey,
      CASE WHEN b.o_orderkey IS NULL THEN 'insert'
           WHEN u.o_orderkey IS NULL THEN 'keep'
           ELSE 'update' END               AS action,
      round(coalesce(u.u_price, b.o_totalprice), 2)   AS o_totalprice,
      coalesce(u.u_status, b.o_orderstatus)           AS o_orderstatus
    FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 MERGE (upsert): reconcile a deterministic change-set against a
    base table — matched rows take the update, unmatched updates insert,
    the rest pass through, with the action tagged. Declared as one keyed
    full-outer join: a single shuffle by the merge key, no per-row lookups.
    The 100 TB deployment joins only the target partitions the change-set
    touches (dynamic partition pruning) and rewrites those partitions —
    the classic hive-style MERGE; ACID table formats add a log on top of
    the same join."""
    o = t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    upd = o.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderkey").alias("u_orderkey"),
        # +1000, not ×1.05: a 2-decimal price times 1.05 lands on half-cent
        # ties whose round() direction depends on the binary double below,
        # and the two engines resolve those ties differently
        r2(F.col("o_totalprice") + 1000.0).alias("u_price"),
        F.lit("U").alias("u_status"),
    )
    m = base.join(upd, base.o_orderkey == upd.u_orderkey, "full_outer")
    return m.select(
        F.coalesce(base.o_orderkey, upd.u_orderkey).alias("o_orderkey"),
        F.when(base.o_orderkey.isNull(), "insert")
        .when(upd.u_orderkey.isNull(), "keep")
        .otherwise("update")
        .alias("action"),
        r2(F.coalesce(upd.u_price, base.o_totalprice)).alias("o_totalprice"),
        F.coalesce(upd.u_status, base.o_orderstatus).alias("o_orderstatus"),
    )


@query(
    "scd2_intervals",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT user_id, event_type, ts,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ), runs AS (
      SELECT user_id, event_type, island,
             min(ts)  AS valid_from,
             count(*) AS n_events
      FROM islands
      GROUP BY user_id, event_type, island
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
           n_events,
           CASE WHEN lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM runs
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history: collapse each user's
    event stream into validity intervals per consecutive event_type run
    (gaps-and-islands: change-point flag → running island id → per-island
    min/count → lead() closes each interval; open interval = current).
    Everything partitions by user_id — one shuffle, per-user window state
    only, no self-join. This is the batch twin of stream_stateful_running's
    state machine and the standard dimension-versioning primitive."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.withColumn(
        "is_start",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    islands = marked.withColumn(
        "island", F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    runs = islands.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
        bi(F.when(F.lead("valid_from").over(w2).isNull(), 1).otherwise(0)).alias("is_current"),
    )


@query(
    "sample_stratified",
    oracle=f"""
    WITH b AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             ((c_custkey * {_KNUTH}) % 4294967296) % 100 AS bucket,
             CASE c_mktsegment WHEN 'BUILDING' THEN 10
                               WHEN 'AUTOMOBILE' THEN 20
                               ELSE 50 END AS pct
      FROM customer
    )
    SELECT c_custkey, c_mktsegment, c_acctbal, bucket
    FROM b WHERE bucket < pct
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-stratum rates (10 % of
    BUILDING, 20 % of AUTOMOBILE, 50 % otherwise) via the same
    engine-portable multiplicative hash as split_train_test — no RNG, so
    membership is reproducible across engines/runs/partitionings and
    stable under appends (a new row never flips an old row's membership,
    unlike fraction-based reservoir/bernoulli with a seed tied to
    partition layout). Shuffle-free: a pure projection+filter that pushes
    into the scan."""
    c = t(spark, sf_dir, "customer")
    bucket = F.pmod(F.pmod(F.col("c_custkey") * F.lit(_KNUTH), F.lit(4294967296)), F.lit(100))
    pct = (
        F.when(F.col("c_mktsegment") == "BUILDING", 10)
        .when(F.col("c_mktsegment") == "AUTOMOBILE", 20)
        .otherwise(50)
    )
    return (
        c.withColumn("bucket", bucket)
        .withColumn("pct", pct)
        .filter(F.col("bucket") < F.col("pct"))
        .select("c_custkey", "c_mktsegment", "c_acctbal", "bucket")
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderpriority,
           count(*)                                          AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free big-big join via bucketing: both sides are written
    `bucketBy(n, orderkey)` into a scratch database, so at read time the
    join key's partitioning is already satisfied — the SortMergeJoin
    consumes both scans with NO Exchange on either side (asserted in
    tests/test_plans.py). This is THE pattern for a 100 TB fact⋈fact
    join that broadcast can't absorb: pay the bucketed layout once at
    ingest, then every keyed join/agg on that key is shuffle-free
    forever. The bucket count is BYTE-TARGETED (round-11, the sf100
    rung's own lesson made code): n = layout.bucket_count(on-disk bytes
    of the larger side, 128 MB target, floor 8) — a fixed count rots as
    data grows (32 buckets read 1.42x at sf10 but 3.32x at sf100, the
    within-bucket sort dominating 19M-row buckets; BASELINE.md rounds
    10-11). Both sides must agree on count and key. Oracled against the
    plain (shuffled) join — layout never changes answers."""
    from ..catalog import table_path
    from ..functions.layout import bucket_count, parquet_bytes

    db = "bucketdb"
    loc = _scratch(sf_dir, "bucket_warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    # size from the LARGER side; both sides share the count (co-location
    # requires equal bucketing) — the small side just gets thinner files
    n_buckets = bucket_count(
        parquet_bytes(table_path(sf_dir, "lineitem")), min_buckets=8
    )
    (
        li.write.mode("overwrite")
        .bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"{db}.lineitem_b")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(f"{db}.orders_b")
    )
    lib = spark.table(f"{db}.lineitem_b")
    ob = spark.table(f"{db}.orders_b")
    # hint pins SortMergeJoin: at toy scale the planner would broadcast the
    # small side, silently bypassing the bucketed layout this op exists to
    # demonstrate (at fact⋈fact scale SMJ is what the planner picks anyway)
    return (
        lib.hint("merge").join(ob, lib.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
        )
    )


@query(
    "sink_bucketed_sized",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)                 AS n_rows,
           CAST(sum(o_orderkey) AS BIGINT)          AS key_sum,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders
    """,
)
def sink_bucketed_sized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-targeted bucketed-table sink (round-10 verdict missing #3
    made a first-class operator): orders is written ``bucketBy(n,
    o_orderkey)`` where n = layout.bucket_count(on-disk bytes, 128 MB
    target) — the count DERIVES from the data so a bucket stays one
    comfortable task at any scale, instead of a fixed count whose
    buckets grow past the sort/memory envelope (the sf100 rung measured
    the rot: 32 fixed buckets went 1.42x→3.32x from sf10 to sf100).
    The aggregate round-trips the PERSISTED metastore table against the
    source-identity oracle — layout never changes answers; the
    bucket-file count == helper output and the sizing math itself are
    pinned in tests/test_layout.py."""
    from ..catalog import table_path
    from ..functions.layout import bucket_count, parquet_bytes

    db = "bucketdb_sized"
    loc = _scratch(sf_dir, "bucket_sized_warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n_buckets = bucket_count(
        parquet_bytes(table_path(sf_dir, "orders")), min_buckets=4
    )
    (
        o.write.mode("overwrite")
        .bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(f"{db}.orders_sized")
    )
    back = spark.table(f"{db}.orders_sized")
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        F.countDistinct("o_custkey").alias("n_custs"),
    )


@query(
    "cdc_latest_by_key",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, event_type, value, epoch_us(ts) AS t_us,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value, t_us AS last_t_us
    FROM r WHERE rn = 1
    """,
)
def cdc_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record compaction — the CDC read-side pattern: a change
    stream keyed by entity collapses to each key's most recent record
    ((ts, event_id) DESC pins ties). One keyed window shuffle, no
    join-back of a max-ts aggregate (that formulation shuffles twice and
    breaks on duplicate timestamps). At 100 TB this IS how an
    append-only change log becomes a queryable current-state snapshot;
    with a date-partitioned log, partition pruning bounds the replay
    window and the same window merges the survivors."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            um("ts").alias("last_t_us"),
        )
    )


@query(
    "join_scd2_pit_lookup",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT user_id, event_type, ts,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ), runs AS (
      SELECT user_id, event_type AS state, island, min(ts) AS valid_from
      FROM islands GROUP BY user_id, event_type, island
    ), dim AS (
      SELECT user_id, state, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               AS valid_to
      FROM runs
    )
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           d.state AS state_at_purchase, d.valid_from
    FROM events p
    JOIN dim d
      ON d.user_id = p.user_id
     AND p.ts >= d.valid_from
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    WHERE p.event_type = 'purchase'
    """,
)
def join_scd2_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against an SCD2 dimension — the CONSUMER of
    scd2_intervals' build: every purchase joined to the state interval
    covering its timestamp (ts ∈ [valid_from, valid_to)), i.e. 'which
    run was this user in when they bought'. The dimensional-join twin of
    join_asof: as-of answers it with a window over the union, this
    answers it the way a star schema does — equi-join on the entity key,
    interval predicate on the version rows, exactly one match per fact
    because SCD2 intervals PARTITION time. At 100 TB the dimension is
    versions-per-entity sized (joins broadcast or bucket on user);
    per-fact work is the handful of version rows for its key, never a
    range scan. ml_pit_features is the feature-store variant of the same
    discipline (no future leakage); this is the classic warehouse
    lookup."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0).alias("is_start"),
    )
    islands = marked.withColumn(
        "island",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    runs = islands.groupBy("user_id", F.col("event_type").alias("state"), "island").agg(
        F.min("ts").alias("valid_from")
    )
    w_dim = Window.partitionBy("user_id").orderBy("valid_from")
    dim = runs.select(
        "user_id", "state", "valid_from", F.lead("valid_from").over(w_dim).alias("valid_to")
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
    )
    return p.join(
        dim,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("purchase_ts") < F.col("valid_to"))),
    ).select(
        "event_id",
        "user_id",
        "purchase_ts",
        F.col("state").alias("state_at_purchase"),
        "valid_from",
    )


@query(
    "merge_scd2_apply",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), islands AS (
      SELECT user_id, event_type, ts,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ), runs AS (
      SELECT user_id, event_type, island,
             min(ts)  AS valid_from,
             count(*) AS n_events
      FROM islands
      GROUP BY user_id, event_type, island
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to,
           CAST(n_events AS BIGINT) AS n_events,
           CASE WHEN lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
                     IS NULL THEN 1 ELSE 0 END AS is_current
    FROM runs
    """,
)
def merge_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE side of SCD2 — incremental interval maintenance:
    yesterday's dimension (built from events before 2024-01-16) receives
    today's delta (events at/after), and the apply must (1) extend the
    open interval when the user's state did NOT change across the
    boundary — a naive append would split one true run into two
    version rows — (2) close it and chain new intervals when it did,
    (3) insert whole histories for brand-new users. The implementation
    runs gaps-and-islands on EACH SIDE separately (each shuffles only
    its own rows — the point of incremental: the old side would be read
    from the dimension table, not recomputed, in production), offsets
    delta island ids by the user's old island count MINUS the
    boundary-merge flag, and re-aggregates (user, island) — merged
    boundary runs recombine valid_from/n_events exactly. ORACLE = the
    full-history rebuild (scd2_intervals' SQL verbatim): incremental
    apply == rebuild is the correctness contract that makes nightly
    SCD2 jobs trustworthy at 100 TB, where rebuild is unaffordable."""
    cutoff = F.lit("2024-01-16").cast("timestamp")
    e = t(spark, sf_dir, "events")

    def runs_of(df):
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        marked = df.select(
            "user_id", "event_type", "ts", "event_id",
            F.when(
                ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
            ).otherwise(0).alias("is_start"),
        )
        islands = marked.withColumn(
            "island",
            F.sum("is_start").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        return islands.groupBy("user_id", F.col("event_type").alias("state"), "island").agg(
            F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
        )

    old_runs = runs_of(e.where(F.col("ts") < cutoff))
    delta_runs = runs_of(e.where(F.col("ts") >= cutoff))

    old_last = old_runs.groupBy("user_id").agg(
        F.max("island").alias("n_old"),
        F.max_by("state", "island").alias("last_state"),
    )
    delta_first = delta_runs.where(F.col("island") == 1).select(
        "user_id", F.col("state").alias("first_state")
    )
    boundary = old_last.join(delta_first, "user_id", "left").select(
        "user_id",
        "n_old",
        (F.col("first_state").isNotNull() & (F.col("first_state") == F.col("last_state")))
        .cast("int")
        .alias("merge_flag"),
    )
    # boundary is PER-USER (scale-growing) — no forced broadcast; AQE
    # decides from measured stats (round-8 sweep, SCALE.md S17)
    adjusted_delta = delta_runs.join(boundary, "user_id", "left").select(
        "user_id",
        "state",
        (
            F.col("island") + F.coalesce(F.col("n_old"), F.lit(0)) - F.coalesce(F.col("merge_flag"), F.lit(0))
        ).alias("island"),
        "valid_from",
        "n_events",
    )
    combined = old_runs.unionByName(adjusted_delta)
    merged = combined.groupBy("user_id", "island").agg(
        F.min("state").alias("event_type"),
        F.min("valid_from").alias("valid_from"),
        F.sum("n_events").alias("n_events"),
    )
    w_dim = Window.partitionBy("user_id").orderBy("valid_from")
    return merged.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_dim).alias("valid_to"),
        bi(F.col("n_events")).alias("n_events"),
        F.when(F.lead("valid_from").over(w_dim).isNull(), 1).otherwise(0).alias("is_current"),
    )
