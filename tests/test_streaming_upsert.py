"""foreachBatch keyed-upsert sink — the production streaming-sink shape
(stream → MERGE into a keyed table). Without a MERGE-capable table format
in this environment, the upsert is the version-swap parquet equivalent:
each micro-batch folds into the previous store version (union → latest
per key → write v_i), which is exactly what Delta/Iceberg MERGE does
under the hood minus the transaction log. The final store must equal the
batch ground truth (latest event per user over ALL events) — pinning
that per-batch folding loses nothing across micro-batch boundaries."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.catalog import load_table

SF_SMALL = "/root/testdata/sf0.001"


def _latest_per_user(df):
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def test_foreachbatch_upsert_matches_batch(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("upsert"))
    src, store = f"{base}/src", f"{base}/store"

    events = load_table(spark, SF_SMALL, "events")
    n = events.count()
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        events.filter(f"event_id >= {lo} AND event_id < {hi}").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/chunk{i}")

    schema = spark.read.parquet(f"{src}/chunk0").schema
    version = {"v": 0}

    def upsert(batch_df, batch_id):
        batch_latest = _latest_per_user(batch_df)
        prev = version["v"]
        if prev > 0:
            merged = _latest_per_user(
                spark.read.parquet(f"{store}/v{prev}").unionByName(batch_latest)
            )
        else:
            merged = batch_latest
        version["v"] = prev + 1
        merged.write.mode("overwrite").parquet(f"{store}/v{version['v']}")

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk*")
        .writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    assert version["v"] >= 3  # one fold per micro-batch

    final = spark.read.parquet(f"{store}/v{version['v']}").toPandas()
    truth = _latest_per_user(events).toPandas()
    assert len(final) == len(truth)
    f = final.sort_values("user_id")[["user_id", "event_id"]].values.tolist()
    t = truth.sort_values("user_id")[["user_id", "event_id"]].values.tolist()
    assert f == t  # latest-per-key identical to the batch answer
