"""functions/ranks.py equivalence pins: the range-partitioned forms must
be BIT-IDENTICAL to the single-partition window functions they replace,
on data with duplicates, skew, and multiple partition layouts."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.functions.ranks import (
    ntile_expr,
    with_global_cumsum,
    with_global_row_number,
)


def _fixture(spark, seed: int, n: int):
    rng = random.Random(seed)
    rows = [(i, rng.randrange(50), rng.randrange(1000)) for i in range(n)]
    return spark.createDataFrame(rows, "id bigint, k bigint, v bigint")


@pytest.mark.parametrize("seed,n,n_parts", [(1, 500, 8), (2, 999, 3), (3, 257, 32)])
def test_global_row_number_matches_window(spark, seed, n, n_parts):
    df = _fixture(spark, seed, n)
    order = [F.desc("k"), F.asc("id")]
    got = with_global_row_number(df, order, "rn", total_col="tot", n_parts=n_parts)
    w = Window.orderBy(*order)
    want = df.withColumn("rn", F.row_number().over(w))
    g = {r["id"]: (r["rn"], r["tot"]) for r in got.collect()}
    exp = {r["id"]: r["rn"] for r in want.collect()}
    assert len(g) == n
    assert all(g[i][0] == exp[i] for i in exp)
    assert all(t == n for _, t in g.values())


@pytest.mark.parametrize("seed,n,n_parts", [(4, 500, 8), (5, 123, 4)])
def test_global_cumsum_matches_window(spark, seed, n, n_parts):
    df = _fixture(spark, seed, n)
    order = [F.desc("v"), F.asc("id")]
    got = with_global_cumsum(df, order, "v", "cum", total_col="tot", n_parts=n_parts)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.withColumn("cum", F.sum("v").over(w))
    g = {r["id"]: (r["cum"], r["tot"]) for r in got.collect()}
    exp = {r["id"]: r["cum"] for r in want.collect()}
    assert all(g[i][0] == exp[i] for i in exp)
    total = sum(r["v"] for r in df.collect())
    assert all(t == total for _, t in g.values())


@pytest.mark.parametrize("n,k", [(10, 4), (7, 7), (3, 8), (100, 6), (1, 3)])
def test_ntile_expr_matches_ntile_window(spark, n, k):
    df = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    w = Window.orderBy("id")
    want = {r["id"]: r["nt"] for r in df.withColumn("nt", F.ntile(k).over(w)).collect()}
    got_df = df.withColumn("rn", F.row_number().over(w)).withColumn(
        "nt2", ntile_expr(F.col("rn"), F.lit(n), k).cast("int")
    )
    got = {r["id"]: r["nt2"] for r in got_df.collect()}
    assert got == want
