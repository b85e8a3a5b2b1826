"""§2 round-3 addendum AA — global id assignment and rolling distinct
windows.

- ids_assign_global — dense global row ids (1..N) under a total order,
  the ubiquitous "number my corpus" primitive, expressed with the
  functions/ranks.py range-partitioned layout: local row_numbers +
  broadcast per-partition offsets, NO single-partition sort anywhere
  (monotonically_increasing_id gives non-dense ids; a global window
  gives dense ids but funnels the corpus through one partition — this
  is the scalable third way).
- events_rolling_dau — trailing-7-day distinct active users per day:
  distinct (day, user) FIRST (the corpus-sized shuffle), then a
  day×7 window-expansion join at POST-AGGREGATION grain — the
  distinct-counting-over-sliding-windows shape where the expansion
  happens after cardinality reduction, never on raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t, register_views
from ..functions.parity import bi
from ..functions.ranks import with_global_row_number
from ..registry import query


@query(
    "ids_assign_global",
    oracle="""
    SELECT doc_id, lang,
           CAST(row_number() OVER (ORDER BY lang ASC, doc_id ASC) AS BIGINT)
             AS global_id
    FROM documents
    """,
)
def ids_assign_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global ids 1..N under (lang, doc_id) order — the
    range-partitioned rank helper (functions/ranks.py) as a first-class
    operator: repartitionByRange on the sort key, per-partition
    row_number at full parallelism, broadcast offset join. The oracle
    states the semantics with a global window; the Spark plan never
    funnels data through one partition (plan-asserted in
    tests/test_plans.py). monotonically_increasing_id is the cheaper
    cousin when ids may be sparse; THIS is what you use when downstream
    needs density (array indexing, matrix row ids, shard-stable
    sampling frames)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    ranked = with_global_row_number(
        d, [F.asc("lang"), F.asc("doc_id")], "_rn"
    )
    return ranked.select("doc_id", "lang", bi(F.col("_rn")).alias("global_id"))


@query(
    "events_rolling_dau",
    oracle="""
    WITH day_users AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (
      SELECT DISTINCT day FROM day_users
    ), expanded AS (
      SELECT d.day, du.user_id
      FROM days d
      JOIN day_users du
        ON du.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS rolling_7d_users
    FROM expanded
    GROUP BY day
    """,
)
def events_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day. Distinct counting
    does NOT compose over sliding windows (users active on several days
    must count once), so the shape is: collapse to distinct (day, user)
    FIRST — the only corpus-sized shuffle — then expand each (day,
    user) into the ≤7 window-end days it serves via a broadcast
    day-range join at post-aggregation grain, then count distinct per
    window. The ×7 expansion applies to |days|·|daily actives|, never
    to raw events; at true scale the same question is answered
    incrementally by agg_bitmap_mergeable / agg_hll_mergeable partials
    (union 7 daily sketches), which this exact lane calibrates."""
    e = t(spark, sf_dir, "events")
    day_users = e.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = day_users.select("day").distinct().select(F.col("day").alias("win_day"))
    expanded = day_users.join(
        F.broadcast(days),
        (F.col("day") <= F.col("win_day"))
        & (F.col("day") >= F.date_sub(F.col("win_day"), 6)),
    )
    return (
        expanded.groupBy(F.col("win_day").alias("day"))
        .agg(F.countDistinct("user_id").alias("rolling_7d_users"))
        .select(
            F.col("day").cast("timestamp_ntz").alias("day"),
            bi(F.col("rolling_7d_users")).alias("rolling_7d_users"),
        )
    )


@query(
    "sql_select_except",
    oracle="""
    SELECT * EXCLUDE (c_name, c_acctbal) FROM customer WHERE c_nationkey < 5
    """,
)
def sql_select_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCEPT(cols) — the wide-table ergonomics surface (Spark 4
    UnresolvedStarExceptOrReplace; DuckDB spells it EXCLUDE): project
    everything but the named columns, resolved at ANALYSIS time so
    column pruning still reaches the scan (ReadSchema drops the excluded
    columns exactly as an explicit select would — this is sugar, not a
    post-scan drop). The 100-TB relevance is real: on 1000-column
    feature tables, 'everything except the 3 raw blobs' is how wide
    projections are actually written, and it must not cost a full-width
    scan."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        "SELECT * EXCEPT (c_name, c_acctbal) FROM customer WHERE c_nationkey < 5"
    )


@query(
    "sql_named_window",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(rank() OVER w AS BIGINT) AS bal_rank,
           round(sum(c_acctbal) OVER w, 2) AS run_bal,
           round(avg(c_acctbal) OVER w2, 6) AS nation_avg
    FROM customer
    WINDOW w  AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
           w2 AS (PARTITION BY c_nationkey)
    """,
)
def sql_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-window SQL surface (the WINDOW clause): two named specs
    shared by three window functions — rank + running sum over the
    ordered spec, partition average over the unordered one. Beyond
    ergonomics, the named form makes spec REUSE visible to the planner:
    all three functions key on c_nationkey, so Catalyst evaluates them
    over ONE exchange (two Window operators, one shuffle — same physical
    plan the DataFrame API would produce from shared Window objects).
    Runs through spark.sql for SQL-surface parity (SURVEY §3.2)."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey,
               CAST(rank() OVER w AS BIGINT) AS bal_rank,
               round(sum(c_acctbal) OVER w, 2) AS run_bal,
               round(avg(c_acctbal) OVER w2, 6) AS nation_avg
        FROM customer
        WINDOW w  AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
               w2 AS (PARTITION BY c_nationkey)
        """
    )


@query(
    "sql_identifier_indirection",
    oracle="""
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n_name
    """,
)
def sql_identifier_indirection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() indirection (Spark 4): table AND column names arrive
    as string PARAMETERS, resolved safely at analysis time — the
    SQL-injection-proof way to template 'count per <dim> from <table>'
    dashboards (string-concatenated SQL is the unsafe alternative this
    surface exists to kill; sql_parameterized covers value parameters,
    this covers identifier parameters). The oracle is the resolved
    query — indirection is syntax, not semantics, and the plan is
    identical to writing the names inline (broadcast dim join +
    keyed count)."""
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT IDENTIFIER(:dimcol) AS n_name, CAST(count(*) AS BIGINT) AS n_customers
        FROM IDENTIFIER(:facttbl) c JOIN IDENTIFIER(:dimtbl) n
          ON n.n_nationkey = c.c_nationkey
        GROUP BY IDENTIFIER(:dimcol)
        """,
        args={"dimcol": "n_name", "facttbl": "customer", "dimtbl": "nation"},
    )


@query(
    "sql_limit_offset",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 20 OFFSET 40
    """,
)
def sql_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination surface: ORDER BY ... LIMIT 20 OFFSET 40
    (page 3) — deterministic because the sort key (c_acctbal, c_custkey)
    is a total order. Spark 4 supports OFFSET natively and plans the
    pair as a single global top-(limit+offset) — per-partition heaps of
    60 rows, driver drops the first 40 — so a page deep in the corpus
    still never materializes a full sort. The known cliff is documented
    honestly: OFFSET 10⁹ makes the heap 10⁹ deep; past shallow pages the
    keyset form (WHERE (bal, key) < last_seen ORDER BY ... LIMIT 20,
    i.e. filter_range + topk_limit's shapes composed) is the scalable
    pagination — this op is the SQL-surface page, not the deep-scroll
    recommendation."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 20 OFFSET 40
        """
    )
