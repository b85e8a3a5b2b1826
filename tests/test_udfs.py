"""§2-L UDF-surface equivalence tests: the slow paths must agree with the
fast paths they shadow."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.registry import QUERIES

from .differential import frames_match


def test_row_udf_equals_pandas_udf(spark, sf_dir):
    """Row-at-a-time @udf and the Arrow-batched pandas UDF must produce
    identical clips (the query ships the pandas one; this pins the
    equivalence)."""

    @F.udf(DoubleType())
    def clip_row(v):
        return None if v is None else max(5.0, min(100.0, float(v)))

    e = load_table(spark, sf_dir, "events")
    via_row = e.select("event_id", clip_row("value").alias("clipped")).toPandas()
    via_pandas = QUERIES["udf_scalar_clip"](spark, sf_dir).select(
        "event_id", "clipped"
    ).toPandas()
    problems = frames_match(via_row, via_pandas)
    assert not problems, "; ".join(problems)


def test_python_udtf_equals_jvm_generator(spark, sf_dir):
    """A true Spark-4 Python UDTF emitting the same 3-grams must match the
    JVM-side transform+posexplode implementation used by the query."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, ngram: string")
    class NgramUDTF:
        def eval(self, text: str):
            t = (text or "")[:20]
            for i in range(max(len(t) - 2, 0)):
                yield i + 1, t[i : i + 3]

    spark.udtf.register("char_ngrams", NgramUDTF)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    via_udtf = spark.sql(
        "SELECT doc_id, n.pos, n.ngram FROM documents_v, LATERAL char_ngrams(text) n"
    ).toPandas()
    via_jvm = QUERIES["udtf_char_ngrams"](spark, sf_dir).toPandas()
    problems = frames_match(via_udtf, via_jvm)
    assert not problems, "; ".join(problems)


def test_grouped_agg_udaf_matches_sql_formulation(spark, sf_dir):
    """The pandas GROUPED_AGG geomean equals exp(avg(ln(x))) (bit-level
    after rounding) — already covered by the oracle, pinned here without
    DuckDB in the loop."""
    o = load_table(spark, sf_dir, "orders")
    sql_side = (
        o.groupBy("o_orderpriority")
        .agg(F.round(F.exp(F.avg(F.log("o_totalprice"))), 4).alias("geomean_price"))
        .toPandas()
    )
    udaf_side = (
        QUERIES["agg_udaf_geomean"](spark, sf_dir)
        .select("o_orderpriority", "geomean_price")
        .toPandas()
    )
    problems = frames_match(udaf_side, sql_side)
    assert not problems, "; ".join(problems)
