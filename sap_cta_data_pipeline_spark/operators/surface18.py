"""§2 round-8 batch DR — SQL-surface equivalences VI: MATCH_RECOGNIZE
pattern detection (the gaps-and-islands compilation) and a keyed
table-diff operator.

- ``sql_match_recognize_equiv``: SQL:2016 MATCH_RECOGNIZE
  (``PATTERN (DOWN+ UP+)`` per partition, ORDER BY sequence) compiled to
  the window-function form every engine without the clause uses:
  direction classification (lag), island numbering (conditional running
  sum over direction changes), run aggregation, then adjacent
  down-run/up-run pairing — V-shape occurrences with valley depth.
  Neither Spark nor DuckDB ships MATCH_RECOGNIZE, so BOTH engines run
  the same windowed compilation — exactly how the equivalence surface
  treats QUALIFY / DISTINCT ON.
- ``dq_table_diff_keyed``: the data-eng staple "diff two table versions
  by key": one full-outer join on the key classifies every row as
  added / removed / changed / unchanged, aggregated to counts + key
  checksums per class. The right version is derived from orders with
  deterministic arithmetic (drops, value bumps, key-shifted inserts),
  so the oracle replays the same derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi
from ..registry import query


@query(
    "sql_match_recognize_equiv",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS idx
      FROM events
    ), dirs AS (
      SELECT user_id, value, idx,
             CASE WHEN value > lag(value) OVER w THEN 1
                  WHEN value < lag(value) OVER w THEN -1
                  ELSE 0 END AS dir
      FROM seq
      WINDOW w AS (PARTITION BY user_id ORDER BY idx)
    ), marks AS (
      SELECT user_id, value, idx, dir,
             CASE WHEN dir IS DISTINCT FROM
                       lag(dir) OVER (PARTITION BY user_id ORDER BY idx)
                  THEN 1 ELSE 0 END AS chg
      FROM dirs WHERE dir IS NOT NULL
    ), isl AS (
      SELECT user_id, value, idx, dir,
             sum(chg) OVER (PARTITION BY user_id ORDER BY idx) AS rid
      FROM marks
    ), runs AS (
      SELECT user_id, rid, min(dir) AS dir,
             CAST(count(*) AS BIGINT) AS run_len,
             min(idx) AS start_idx, max(idx) AS end_idx
      FROM isl GROUP BY user_id, rid
    ), vees AS (
      SELECT d.user_id, d.run_len AS down_len, u.run_len AS up_len,
             (SELECT i.value FROM isl i
               WHERE i.user_id = d.user_id AND i.idx = d.end_idx) AS valley
      FROM runs d JOIN runs u
        ON d.user_id = u.user_id AND u.rid = d.rid + 1
      WHERE d.dir = -1 AND u.dir = 1
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT)    AS n_patterns,
           round(min(valley), 6)       AS deepest_valley,
           CAST(max(down_len) AS BIGINT) AS longest_down
    FROM vees GROUP BY user_id
    """,
)
def sql_match_recognize_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE ``PATTERN (DOWN+ UP+)`` over each user's event
    values (ORDER BY ts, event_id): count V-shape occurrences, the
    deepest valley value, and the longest strictly-falling run. The
    clause compiles to four window stages — direction (lag), island id
    (running sum of direction CHANGES — the gaps-and-islands trick),
    run collapse (groupBy island), and adjacent-run pairing (self-join
    rid ↔ rid+1, the only non-window step, keyed and output-bound).
    Flat/equal steps break runs (dir=0 islands pair with nothing), ties
    are impossible because the ORDER BY key is unique per user.

    Scale: every stage is partitioned by user_id — one shuffle
    establishes the partitioning and the windows/island join reuse it;
    no global window anywhere. The valley lookup subquery in the oracle
    is a keyed join in the Spark plan (runs → isl on (user, end_idx)).
    """
    e = t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    widx = Window.partitionBy("user_id").orderBy("idx")
    seq = e.select(
        "user_id", "value", F.row_number().over(wseq).alias("idx")
    )
    prev = F.lag("value").over(widx)
    dirs = seq.select(
        "user_id",
        "value",
        "idx",
        F.when(F.col("value") > prev, 1)
        .when(F.col("value") < prev, -1)
        .otherwise(
            F.when(prev.isNull(), F.lit(None).cast("int")).otherwise(0)
        )
        .alias("dir"),
    )
    # NOTE the Spark CASE above mirrors the oracle exactly: first row has
    # dir NULL (lag undefined) and is dropped before island numbering.
    marks = dirs.filter(F.col("dir").isNotNull()).select(
        "user_id",
        "value",
        "idx",
        "dir",
        F.when(~F.col("dir").eqNullSafe(F.lag("dir").over(widx)), 1)
        .otherwise(0)
        .alias("chg"),
    )
    isl = marks.select(
        "user_id",
        "value",
        "idx",
        "dir",
        F.sum("chg").over(widx).alias("rid"),
    )
    runs = isl.groupBy("user_id", "rid").agg(
        F.min("dir").alias("dir"),
        bi(F.count(F.lit(1))).alias("run_len"),
        F.min("idx").alias("start_idx"),
        F.max("idx").alias("end_idx"),
    )
    d = runs.filter(F.col("dir") == -1).alias("d")
    u = runs.filter(F.col("dir") == 1).alias("u")
    vees = d.join(
        u,
        (F.col("d.user_id") == F.col("u.user_id"))
        & (F.col("u.rid") == F.col("d.rid") + 1),
    ).select(
        F.col("d.user_id").alias("user_id"),
        F.col("d.run_len").alias("down_len"),
        F.col("d.end_idx").alias("end_idx"),
    )
    valley = vees.join(
        isl.select("user_id", F.col("idx").alias("end_idx"), "value"),
        ["user_id", "end_idx"],
    )
    return valley.groupBy("user_id").agg(
        bi(F.count(F.lit(1))).alias("n_patterns"),
        F.round(F.min("value"), 6).alias("deepest_valley"),
        bi(F.max("down_len")).alias("longest_down"),
    )


@query(
    "dq_table_diff_keyed",
    oracle="""
    WITH left_v AS (
      SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS status
      FROM orders
    ), right_v AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 89 = 1 THEN o_totalprice + 10
                  ELSE o_totalprice END AS price,
             o_orderstatus AS status
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 300000000, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 101 = 5
    ), classified AS (
      SELECT COALESCE(l.k, r.k) AS k,
             CASE WHEN l.k IS NULL THEN 'added'
                  WHEN r.k IS NULL THEN 'removed'
                  WHEN l.price <> r.price OR l.status <> r.status
                       THEN 'changed'
                  ELSE 'unchanged' END AS change_type
      FROM left_v l FULL OUTER JOIN right_v r ON l.k = r.k
    )
    SELECT change_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT)   AS key_checksum
    FROM classified GROUP BY change_type
    """,
)
def dq_table_diff_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed table diff — "what changed between version A and B": ONE
    full-outer join on the key classifies every row added / removed /
    changed / unchanged (value columns compared with non-null-safe <>,
    matching the oracle), aggregated to per-class counts and key
    checksums. The right version derives from orders deterministically:
    every 97th key dropped, every 89th-residue-1 price bumped, every
    101st-residue-5 key re-inserted shifted — so both engines diff the
    same pair.

    Scale: the diff IS the join — both sides shuffle once on the key
    (or colocate for free on bucketed/identically-partitioned tables,
    the join_bucketed_colocated layout), classification is per-row, and
    the output aggregation is 4 groups. This is the reconciliation
    primitive behind CDC validation and migration sign-off at any
    size."""
    o = t(spark, sf_dir, "orders")
    left_v = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    right_v = (
        o.filter("o_orderkey % 97 <> 0")
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(
                F.col("o_orderkey") % 89 == 1, F.col("o_totalprice") + 10
            )
            .otherwise(F.col("o_totalprice"))
            .alias("price"),
            F.col("o_orderstatus").alias("status"),
        )
        .unionAll(
            o.filter("o_orderkey % 101 = 5").select(
                (F.col("o_orderkey") + 300000000).alias("k"),
                F.col("o_totalprice").alias("price"),
                F.col("o_orderstatus").alias("status"),
            )
        )
    )
    l, r = left_v.alias("l"), right_v.alias("r")
    joined = l.join(r, F.col("l.k") == F.col("r.k"), "full_outer")
    classified = joined.select(
        F.coalesce(F.col("l.k"), F.col("r.k")).alias("k"),
        F.when(F.col("l.k").isNull(), "added")
        .when(F.col("r.k").isNull(), "removed")
        .when(
            (F.col("l.price") != F.col("r.price"))
            | (F.col("l.status") != F.col("r.status")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("change_type"),
    )
    return classified.groupBy("change_type").agg(
        bi(F.count(F.lit(1))).alias("n"),
        bi(F.sum("k")).alias("key_checksum"),
    )
