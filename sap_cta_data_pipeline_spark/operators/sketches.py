"""§2-D addendum (round 2): mergeable-sketch aggregation lane.

SCALE.md §D's 100-TB story for approximate aggregates is "persist
per-partition sketches, re-aggregate by MERGING sketches, never re-scan
raw data". Round 1 only *named* that swap; these operators execute it:

- `agg_hll_mergeable` builds per-nation HyperLogLog sketches (Apache
  DataSketches via `hll_sketch_agg`), round-trips them through a parquet
  sink as binary cells, merges the persisted sketches with
  `hll_union_agg`, and proves the merged estimate equals the one-shot
  whole-table estimate. Rows-only lane: sketch bytes/estimates are
  DataSketches-specific, no DuckDB twin.
- `agg_quantile_mergeable` is the quantile analogue with a fully
  ORACLED algebra: fixed-width histograms are mergeable by construction
  (vector addition), so per-group histograms → merged global histogram →
  quantile edges is reproducible in ANSI SQL exactly — the mergeability
  demonstration carries a hard value check, not just a row count.

tests/test_sketch_merge.py additionally pins merged == one-shot at the
estimate level for HLL and merged == direct for the histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query
from .sources import _scratch

#: l_quantity lives in [1, 50]; 25 fixed buckets of width 2 — the bucket
#: spec must be a CONSTANT for histograms to be mergeable across
#: partitions/days (data-dependent bounds would make vectors unalignable).
_Q_BUCKETS = 25
_Q_WIDTH = 2.0


@query("agg_hll_mergeable")  # rows-only: DataSketches binary/estimate, no SQL twin
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-sketch re-aggregation: per-nation HLL sketches of
    c_custkey → parquet (binary column) → read back → `hll_union_agg`
    merge → estimate; alongside the one-shot whole-table estimate and the
    exact distinct count. At 100 TB the per-partition sketch table is
    what you store per day/partition; any rollup (per week, global,
    per region) is a merge over kilobyte sketches with NO raw re-scan.
    Output pins merged == one-shot (same sketch algebra ⇒ identical
    estimate), which the driver sees as a 1-row stable-schema result."""
    c = t(spark, sf_dir, "customer")
    per_group = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    path = _scratch(sf_dir, "hll_sketches")
    per_group.write.mode("overwrite").parquet(path)
    persisted = spark.read.parquet(path)
    merged = persisted.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate"),
        F.count(F.lit(1)).alias("n_sketches"),
    )
    oneshot = c.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey")).alias("oneshot_estimate"),
        F.countDistinct("c_custkey").alias("n_exact"),
    )
    return (
        merged.crossJoin(oneshot)
        .select(
            "n_sketches",
            "merged_estimate",
            "oneshot_estimate",
            "n_exact",
            (F.col("merged_estimate") == F.col("oneshot_estimate")).alias(
                "merged_equals_oneshot"
            ),
        )
    )


@query(
    "agg_quantile_mergeable",
    oracle=f"""
    WITH hist_g AS (
      SELECT l_returnflag,
             least(CAST(floor(l_quantity / {_Q_WIDTH}) AS BIGINT), {_Q_BUCKETS - 1}) AS bucket,
             count(*) AS n
      FROM lineitem GROUP BY 1, 2
    ), hist AS (
      SELECT bucket, sum(n) AS n FROM hist_g GROUP BY bucket
    ), cum AS (
      SELECT bucket, n,
             sum(n) OVER (ORDER BY bucket) AS cum_n,
             sum(n) OVER () AS total_n
      FROM hist
    )
    SELECT
      min(CASE WHEN cum_n >= 0.5 * total_n THEN (bucket + 1) * {_Q_WIDTH} END) AS p50_edge,
      min(CASE WHEN cum_n >= 0.9 * total_n THEN (bucket + 1) * {_Q_WIDTH} END) AS p90_edge,
      min(CASE WHEN cum_n >= 0.99 * total_n THEN (bucket + 1) * {_Q_WIDTH} END) AS p99_edge,
      CAST(max(total_n) AS BIGINT) AS n_total
    FROM cum
    """,
)
def agg_quantile_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles via fixed-width histograms: per-returnflag
    histograms (the 'persisted per-partition sketch') merge by bucket-wise
    addition into the global histogram, and quantile edges come off the
    merged cumulative counts. Every stage is exact integer algebra →
    full DuckDB oracle. Shuffle profile: corpus → (flag, bucket) partial
    agg (≤ groups×25 rows), then a 25-row merge and a 25-row window —
    re-aggregation cost is independent of corpus size, which is the whole
    point of the sketch lane."""
    li = t(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.floor(F.col("l_quantity") / _Q_WIDTH).cast("long"), F.lit(_Q_BUCKETS - 1)
    )
    hist_g = li.groupBy("l_returnflag", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    hist = hist_g.groupBy("bucket").agg(F.sum("n").alias("n"))
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = hist.select(
        "bucket",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("n").over(w_all).alias("total_n"),
    )
    edge = (F.col("bucket") + 1) * _Q_WIDTH
    return cum.agg(
        F.min(F.when(F.col("cum_n") >= 0.5 * F.col("total_n"), edge)).alias("p50_edge"),
        F.min(F.when(F.col("cum_n") >= 0.9 * F.col("total_n"), edge)).alias("p90_edge"),
        F.min(F.when(F.col("cum_n") >= 0.99 * F.col("total_n"), edge)).alias("p99_edge"),
        bi(F.max("total_n")).alias("n_total"),
    )


@query(
    "agg_bitmap_mergeable",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT re-aggregatable distinct counting via bitmap partials — the
    deterministic sibling of agg_hll_mergeable. Each user_id maps to a
    (bucket, bit) coordinate; per (event_type, bucket) bitmaps are built
    with bitmap_construct_agg, PERSISTED to parquet (the incremental
    state a 100 TB pipeline keeps per day/partition), read back, and
    merged: buckets cover disjoint id ranges, so the global distinct is
    the sum of per-bucket popcounts — and re-merging tomorrow's partials
    needs bitmap_or_agg, never the raw events. Exactness costs bitmap
    size O(id-range/8) per group vs HLL's fixed bytes; for dense bounded
    ids (users, SKUs) bitmaps win, for open domains (URLs) HLL does."""
    e = t(spark, sf_dir, "events")
    part = (
        e.select(
            "event_type",
            F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
            F.bitmap_bit_position(F.col("user_id")).alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bm"))
    )
    path = _scratch(sf_dir, "bitmap_partials")
    part.write.mode("overwrite").parquet(path)
    merged = (
        spark.read.parquet(path)
        .groupBy("event_type", "bucket")
        .agg(F.bitmap_or_agg(F.col("bm")).alias("bm"))
    )
    return merged.groupBy("event_type").agg(
        F.sum(F.bitmap_count(F.col("bm"))).alias("n_users")
    )


@query(
    "agg_histogram_fixed",
    oracle="""
    WITH b AS (
      SELECT event_type,
             least(9, greatest(0, CAST(floor(value / 33.0) AS INTEGER))) AS bin
      FROM events
    )
    SELECT event_type, CAST(bin AS BIGINT) AS bin, count(*) AS n
    FROM b GROUP BY 1, 2
    """,
)
def agg_histogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (10 bins of 33 over the value range, clamped
    tails) per series — the explicit-formula twin of width_bucket, written
    identically in both engines so bin edges are bit-identical. One
    combiner-friendly groupBy on a (series × 10)-bounded key space; this
    is also the partial state agg_quantile_mergeable re-merges, here
    surfaced as the raw histogram."""
    e = t(spark, sf_dir, "events")
    bin_ = F.least(
        F.lit(9), F.greatest(F.lit(0), F.floor(F.col("value") / 33.0).cast("int"))
    )
    return (
        e.groupBy("event_type", bin_.cast("long").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query("quantile_accuracy_eval")  # rows-only: GK sketch estimates are impl-specific
def quantile_accuracy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy harness for the approximate-percentile lane: exact
    percentiles of l_extendedprice (p50/p90/p99) against
    approx_percentile at three relative-error budgets (1%, 0.1%,
    0.01%), reporting absolute and rank-relative error per (quantile,
    budget) — the measurement that licenses swapping agg_median_exact
    for the one-pass mergeable sketch at 100 TB (same role
    dedup_recall_eval plays for MinHash and sim_recall_eval for ANN:
    every approximate lane here ships with its eval). Exact side is one
    sort-based percentile pass — the thing you run ONCE on a sample to
    calibrate; the sketch side is what production runs. Rows-only lane
    (estimates are Spark-GK-specific); the GK ε-bound itself is pinned
    in tests/test_iterative_pins.py."""
    li = t(spark, sf_dir, "lineitem")
    qs = [0.5, 0.9, 0.99]
    accs = [100, 1000, 10000]
    exact = li.agg(
        *[F.expr(f"percentile(l_extendedprice, {q})").alias(f"e{i}") for i, q in enumerate(qs)]
    )
    approx = li.agg(
        *[
            F.expr(f"approx_percentile(l_extendedprice, {q}, {a})").alias(f"a{i}_{a}")
            for i, q in enumerate(qs)
            for a in accs
        ]
    )
    wide = exact.crossJoin(approx)
    # rank-relative error: the OBSERVED quantile of each approx value
    # (fraction of rows ≤ it — one more conditional-agg scan against the
    # broadcast 1-row estimate frame) vs the target quantile. abs_err says
    # "how far in value"; rank_rel_err says "how far in rank" — the GK
    # guarantee is stated in rank, so this is the column that checks the
    # ε-bound directly.
    observed = (
        li.crossJoin(F.broadcast(wide)).agg(
            *[
                F.avg(
                    (F.col("l_extendedprice") <= F.col(f"a{i}_{a}")).cast("double")
                ).alias(f"o{i}_{a}")
                for i in range(len(qs))
                for a in accs
            ]
        )
    )
    wide = wide.crossJoin(F.broadcast(observed))
    rows = []
    for i, q in enumerate(qs):
        for a in accs:
            rows.append(
                F.struct(
                    F.lit(q).alias("quantile"),
                    F.lit(a).cast("long").alias("accuracy_param"),
                    F.round(F.col(f"e{i}"), 2).alias("exact_value"),
                    F.round(F.col(f"a{i}_{a}"), 2).alias("approx_value"),
                    F.round(F.abs(F.col(f"a{i}_{a}") - F.col(f"e{i}")), 2).alias("abs_err"),
                    F.round(F.abs(F.col(f"o{i}_{a}") - F.lit(q)), 6).alias("rank_rel_err"),
                )
            )
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


@query("agg_hll_intersection_eval")  # rows-only: sketch estimates, no SQL twin
def agg_hll_intersection_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based SET INTERSECTION via inclusion–exclusion — the
    audience-overlap question ("how many users did BOTH click and
    view?") answered from per-segment HLL sketches: |A∩B| ≈ est(A) +
    est(B) − est(A∪B), where the union is a kilobyte-sized
    hll_union_agg merge, never a raw re-scan. HLL has no native
    intersection (inclusion–exclusion error grows as the overlap
    shrinks relative to the union — the known weakness theta sketches
    fix), so this lane is the EVAL that quantifies the error against
    the exact distinct-user intersection (one semi-join), the same
    calibrate-before-trusting role quantile_accuracy_eval plays: run it
    once on a sample, then ship the sketch path for the 100 TB overlap
    matrix (k segments → k sketches + k² merges, zero fact re-scans).
    Output: exact sizes, estimates, and the relative intersection
    error, 1 row."""
    e = t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "view").select("user_id")
    exact_inter = a.distinct().join(b.distinct(), "user_id", "left_semi").count()
    sk = (
        e.filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    ests = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union"),
        F.max(
            F.when(F.col("event_type") == "click", F.hll_sketch_estimate("sk"))
        ).alias("est_a"),
        F.max(
            F.when(F.col("event_type") == "view", F.hll_sketch_estimate("sk"))
        ).alias("est_b"),
    )
    exact = (
        a.agg(F.countDistinct("user_id").alias("exact_a"))
        .crossJoin(b.agg(F.countDistinct("user_id").alias("exact_b")))
        .withColumn("exact_inter", F.lit(exact_inter).cast("long"))
    )
    est_inter = F.col("est_a") + F.col("est_b") - F.col("est_union")
    return (
        exact.crossJoin(F.broadcast(ests))
        .select(
            "exact_a",
            "exact_b",
            "exact_inter",
            r6(F.col("est_a")).alias("est_a"),
            r6(F.col("est_b")).alias("est_b"),
            r6(est_inter).alias("est_inter"),
            r6(
                F.abs(est_inter - F.col("exact_inter")) / F.col("exact_inter")
            ).alias("rel_err"),
        )
    )
