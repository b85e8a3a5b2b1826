"""Edge-semantics units for the round-2 addendum operators: salting
answer-preservation, merge action accounting, SCD2 interval algebra,
stratified-sample determinism, quantization error bounds, subquery
decorrelation equivalence."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401  (populates registry)
from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.registry import QUERIES


def test_salted_join_answer_preserving(spark, sf_dir):
    """Salting must be invisible in the result: compare against the plain
    unsalted join computed inline."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .toPandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    salted = (
        QUERIES["join_salted_skew"](spark, sf_dir)
        .toPandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(salted, plain, check_exact=False, rtol=0, atol=0.011)


def test_merge_upsert_action_accounting(spark, sf_dir):
    """insert = keys ≡0 (mod 10) (absent from base), update = ≡0 (mod 5)
    minus those, keep = the rest; every key appears exactly once."""
    pdf = QUERIES["merge_upsert"](spark, sf_dir).toPandas()
    o = load_table(spark, sf_dir, "orders").select("o_orderkey").toPandas()
    keys = o["o_orderkey"]
    assert pdf["o_orderkey"].is_unique and len(pdf) == len(keys)
    n_ins = int((keys % 10 == 0).sum())
    n_upd = int(((keys % 5 == 0) & (keys % 10 != 0)).sum())
    counts = pdf["action"].value_counts()
    assert counts.get("insert", 0) == n_ins
    assert counts.get("update", 0) == n_upd
    assert counts.get("keep", 0) == len(keys) - n_ins - n_upd
    assert (pdf.loc[pdf["action"] != "keep", "o_orderstatus"] == "U").all()


def test_scd2_intervals_partition_time(spark, sf_dir):
    """Per user: intervals are chronologically chained (valid_to of one
    run = valid_from of the next), exactly one open interval, and
    n_events sums to the user's event count."""
    pdf = QUERIES["scd2_intervals"](spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").groupBy("user_id").count().toPandas()
    per_user_events = dict(zip(ev["user_id"], ev["count"]))
    for uid, grp in pdf.groupby("user_id"):
        g = grp.sort_values("valid_from").reset_index(drop=True)
        assert g["is_current"].sum() == 1 and g["is_current"].iloc[-1] == 1
        assert g["valid_to"].iloc[:-1].equals(
            g["valid_from"].iloc[1:].reset_index(drop=True).rename("valid_to")
        )
        assert pd.isna(g["valid_to"].iloc[-1])
        # consecutive runs must actually change type (else not collapsed)
        assert (g["event_type"].iloc[:-1].values != g["event_type"].iloc[1:].values).all()
        assert g["n_events"].sum() == per_user_events[uid]


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    a = QUERIES["sample_stratified"](spark, sf_dir).toPandas().sort_values("c_custkey")
    b = QUERIES["sample_stratified"](spark, sf_dir).toPandas().sort_values("c_custkey")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    pct = {"BUILDING": 10, "AUTOMOBILE": 20}
    for seg, grp in a.groupby("c_mktsegment"):
        assert (grp["bucket"] < pct.get(seg, 50)).all()


def test_quantize_error_bounded_by_half_step(spark, sf_dir):
    """Affine int8 reconstruction error can never exceed half a
    quantization step."""
    pdf = QUERIES["emb_quantize_int8"](spark, sf_dir).toPandas()
    # both columns carry r6 output rounding: max_err may round up and
    # scale down by 5e-7 each, so the true ≤ scale/2 bound needs 1e-6 slack
    assert (pdf["max_err"] <= pdf["scale"] / 2 + 1e-6).all()
    assert (pdf["mae"] <= pdf["max_err"] + 1e-12).all()
    assert (pdf["scale"] > 0).all()


def test_sub_correlated_matches_naive_recompute(spark, sf_dir):
    """The windowed decorrelation must equal a literal per-part average
    join (the naive correlated-subquery evaluation)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    avg_per_part = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("pa"))
    naive = (
        li.join(avg_per_part, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("pa"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_items"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_weekly_revenue"),
        )
        .toPandas()
        .sort_values("p_brand")
        .reset_index(drop=True)
    )
    got = (
        QUERIES["sub_correlated_agg"](spark, sf_dir)
        .toPandas()
        .sort_values("p_brand")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, naive)


def test_ngram_freq_total_order(spark, sf_dir):
    pdf = QUERIES["text_ngram_freq"](spark, sf_dir).toPandas()
    assert len(pdf) == 50
    # non-increasing counts; ties broken by bigram ascending
    assert (pdf["cnt"].diff().dropna() <= 0).all()
    for _, grp in pdf.groupby("cnt"):
        assert list(grp["bigram"]) == sorted(grp["bigram"])


def test_ngram_jaccard_probe_lane(spark, sf_dir):
    pdf = QUERIES["dedup_ngram_jaccard"](spark, sf_dir).toPandas()
    assert (pdf["probe_id"] % 37 == 0).all()
    assert (pdf["probe_id"] != pdf["cand_id"]).all()
    assert ((pdf["jaccard"] >= 0.5) & (pdf["jaccard"] <= 1.0)).all()


def test_incremental_merge_equals_direct(spark, sf_dir):
    direct = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
        .toPandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    merged = (
        QUERIES["agg_incremental_merge"](spark, sf_dir)
        .toPandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged, direct, check_exact=False, rtol=0, atol=1e-6)


def test_win_count_distinct_bounds(spark, sf_dir):
    pdf = QUERIES["win_count_distinct"](spark, sf_dir).toPandas()
    per_order = pdf.groupby("l_orderkey").agg(
        n_rows=("l_linenumber", "size"), n_supp=("n_supp_in_order", "max")
    )
    assert (per_order["n_supp"] <= per_order["n_rows"]).all()
    assert (pdf["n_supp_in_order"] >= 1).all()
    # constant within each order (it's a partition-level stat at row grain)
    assert (pdf.groupby("l_orderkey")["n_supp_in_order"].nunique() == 1).all()
