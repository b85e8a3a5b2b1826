"""§2 round-4 batch BJ — managed-table catalog surface.

Everything else in the inventory is path-based; real users also live in
the session CATALOG: CREATE TABLE AS SELECT, INSERT OVERWRITE of single
partitions, spark.table() reads. These ops exercise the managed-table
path end to end (warehouse dir, Hive-style partition directories, dynamic
partition overwrite) with full value oracles. Tables are per-process
named and DROP IF EXISTS-ed so repeated driver runs stay idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..registry import query


def _tbl(name: str) -> str:
    # per-process table names: concurrent pytest/driver runs share one
    # metastore dir but must not clobber each other's tables
    return f"sap_cta_{name}_{os.getpid()}"


@query(
    "catalog_ctas_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(length(n_name) AS BIGINT) AS name_len
    FROM nation
    """,
)
def catalog_ctas_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE AS SELECT into the session catalog (managed parquet
    table under the warehouse dir) and read back via ``spark.table`` —
    the catalog-managed twin of every path-based sink in §2-A: the table
    has a NAME, its files live wherever the warehouse says, and readers
    never see a path. The CTAS body computes a derived column so the
    oracle certifies the computed write, not just a copy. DROP IF
    EXISTS + re-create keeps repeated runs idempotent (the CREATE is
    atomic-per-statement; concurrent writers would use the txn-log
    lane's optimistic pattern instead)."""
    from ..catalog import register_views

    register_views(spark, sf_dir, ("nation",))
    name = _tbl("ctas_nation")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"""
        CREATE TABLE {name} USING parquet AS
        SELECT n_nationkey, n_name, n_regionkey,
               CAST(length(n_name) AS BIGINT) AS name_len
        FROM nation
        """
    )
    return spark.table(name)


@query(
    "catalog_insert_overwrite_partition",
    oracle="""
    SELECT event_id, user_id,
           round(CASE WHEN event_type = 'click' THEN value * 2
                      ELSE value END, 6) AS value,
           event_type
    FROM events
    """,
)
def catalog_insert_overwrite_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite on a managed partitioned table — the
    daily-restatement shape (recompute ONE partition, leave the rest
    untouched): events load partitioned by event_type, then a corrected
    'click' slice INSERT OVERWRITEs with
    ``partitionOverwriteMode=dynamic``, which replaces exactly the
    partitions present in the incoming data — a STATIC overwrite would
    have dropped every other partition (the classic footgun this mode
    exists to fix). The read-back oracle checks both halves: doubled
    values in the restated partition AND untouched originals elsewhere.
    At 100 TB this is the partition-grain idempotent-rerun contract:
    restating day D rewrites day D's directory only."""
    name = _tbl("events_part")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "value", "event_type")
    e.write.partitionBy("event_type").format("parquet").saveAsTable(name)
    restated = (
        e.filter(F.col("event_type") == "click")
        .withColumn("value", F.col("value") * 2)
    )
    # insertInto has no per-write partitionOverwriteMode option, so the
    # session conf must be set — save/restore it so this operator never
    # changes overwrite semantics for anything else running in the session.
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        restated.write.mode("overwrite").insertInto(name)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    out = spark.table(name)
    return out.select(
        "event_id", "user_id", F.round("value", 6).alias("value"), "event_type"
    )
