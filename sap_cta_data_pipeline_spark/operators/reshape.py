"""§2 addendum: relational reshaping — pivot (long→wide) and unpivot
(wide→long), the remaining first-class DataFrame API surface.

Pivot with an EXPLICIT value list is the scale-safe form: without it Spark
runs an extra distinct-values job and the output schema becomes
data-dependent (nondeterministic columns under drift). Unpivot is a
zero-shuffle row expansion (×|metrics|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import r2, r6
from ..registry import query


@query(
    "agg_pivot",
    oracle="""
    SELECT
      o_orderpriority,
      count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
      count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
      count(*) FILTER (WHERE o_orderstatus = 'P') AS P,
      round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS F_rev,
      round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS O_rev,
      round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS P_rev
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into wide columns (counts + revenue per status)
    via the native pivot operator with an explicit value list; missing
    combinations are filled to 0 to match the FILTER-aggregation oracle."""
    o = t(spark, sf_dir, "orders")
    counts = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    revs = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(r2(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)))))
        .na.fill(0.0)
        .select(
            "o_orderpriority",
            F.col("F").alias("F_rev"),
            F.col("O").alias("O_rev"),
            F.col("P").alias("P_rev"),
        )
    )
    return counts.join(revs, "o_orderpriority")


@query(
    "project_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, round(l_quantity, 6) AS value
    FROM lineitem WHERE l_partkey < 40
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price' AS metric, round(l_extendedprice, 6) AS value
    FROM lineitem WHERE l_partkey < 40
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount' AS metric, round(l_discount, 6) AS value
    FROM lineitem WHERE l_partkey < 40
    """,
)
def project_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) three measure columns into (metric, value) long
    format on a pruned sample — the native unpivot operator; the oracle is
    the portable UNION ALL formulation."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 40)
    melted = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
    ).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["quantity", "price", "discount"],
        variableColumnName="metric",
        valueColumnName="value_raw",
    )
    return melted.select(
        "l_orderkey", "l_linenumber", "metric", r6(F.col("value_raw")).alias("value")
    )


@query(
    "agg_pivot_dynamic",
    oracle="""
    SELECT lang,
           round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
           round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
           round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
           round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
    FROM (
      SELECT e.event_type, e.value, d.lang
      FROM events e JOIN documents d ON e.user_id % 500 = d.doc_id % 500
                                     AND d.doc_id < 500
    )
    GROUP BY lang
    """,
)
def agg_pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic pivot: the column list is DISCOVERED at runtime (distinct
    scan of the pivot key, sorted for a stable layout), then passed to
    pivot() explicitly — the two-phase pattern that avoids Spark's
    implicit whole-table distinct inside pivot() AND keeps the output
    schema deterministic. The probe join fabricates a (lang × event_type)
    matrix from the shared corpus. At 100 TB the discovery scan is the
    cheap pass (distinct over a low-cardinality key) and the pivot itself
    is one partial+final agg with |values| columns, not |values| scans."""
    e = t(spark, sf_dir, "events")
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    joined = e.join(
        F.broadcast(d.select("doc_id", "lang")),
        e["user_id"] % 500 == F.col("doc_id") % 500,
    )
    types = sorted(
        r.event_type for r in e.select("event_type").distinct().collect()
    )
    out = (
        joined.groupBy("lang")
        .pivot("event_type", types)
        .agg(F.round(F.sum("value"), 2))
    )
    return out
