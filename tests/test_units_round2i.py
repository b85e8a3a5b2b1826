"""Unit tests for the round-2i additions: graph lane (degrees, oriented
triangle count, PageRank), NOT-IN null semantics, null-safe join, MoM/YoY
growth, PMI collocations."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.catalog import load_table
from sap_cta_data_pipeline_spark.operators.graph_ops import _edges
from sap_cta_data_pipeline_spark.registry import QUERIES


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(key):
        return QUERIES[key](spark, sf_dir)

    return run


@pytest.fixture(scope="module")
def edge_list(spark, sf_dir):
    return [(r.u, r.v) for r in _edges(spark, sf_dir).collect()]


def test_degree_distribution_sums_to_twice_edges(q, edge_list):
    rows = q("graph_degree_distribution").collect()
    assert rows
    assert sum(r.degree * r.n_nodes for r in rows) == 2 * len(edge_list)


def test_triangle_count_matches_bruteforce(q, edge_list):
    adj: dict = {}
    for u, v in edge_list:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    brute = (
        sum(len(adj[u] & adj[v]) for u, v in edge_list) // 3
    )  # each triangle counted once per edge
    row = q("graph_triangle_count").collect()[0]
    assert row.n_triangles == brute
    assert row.n_edges == len(edge_list)
    assert row.n_nodes == len(adj)
    assert row.n_triangles > 0  # the co-purchase graph is dense enough


def test_pagerank_mass_conserved_and_positive(q):
    rows = q("graph_pagerank").collect()
    n = len(rows)
    assert n > 0
    total = sum(r.rank_scaled for r in rows)
    # scaled ranks average 1; damped PR conserves total mass
    assert total == pytest.approx(n, rel=1e-3)
    assert all(r.rank_scaled > 0 for r in rows)
    # hubs outrank leaves: max should clearly exceed the mean
    assert max(r.rank_scaled for r in rows) > 1.2


def test_not_in_null_semantics(q, spark, sf_dir):
    row = q("sub_not_in_nulls").collect()[0]
    assert row.n_not_in_null == 0  # NULL in the NOT IN set kills every row
    assert row.n_not_exists_null == row.n_not_in  # NOT EXISTS is unaffected
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert 0 < row.n_not_in < n_orders


def test_null_safe_join_preserves_all_customers(q, spark, sf_dir):
    rows = q("join_null_safe_eq").collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.n_customers for r in rows) == n_cust  # nothing dropped
    via_null = [r for r in rows if r.via_null]
    n_k3 = (
        load_table(spark, sf_dir, "customer").where(F.col("c_nationkey") == 3).count()
    )
    if n_k3:
        assert len(via_null) == 1 and via_null[0].n_customers == n_k3


def test_growth_lags_align(q):
    rows = sorted(q("orders_growth_mom_yoy").collect(), key=lambda r: r.month)
    assert rows[0].mom_pct is None and rows[0].yoy_pct is None
    for i in range(1, len(rows)):
        prev, cur = rows[i - 1], rows[i]
        if cur.mom_pct is not None:
            expect = (cur.revenue - prev.revenue) / prev.revenue * 100
            assert cur.mom_pct == pytest.approx(expect, abs=1e-3)
    assert sum(r.yoy_pct is not None for r in rows) == max(0, len(rows) - 12)


def test_pmi_definition_spotcheck(q, spark, sf_dir):
    rows = q("text_collocations_pmi").collect()
    assert rows and all(r.c_ab >= 10 for r in rows)
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    toks = [[w for w in d.text.split(" ") if w] for d in docs]
    from collections import Counter

    uni = Counter(w for ts in toks for w in ts)
    bg = Counter((ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1))
    n_tok, n_bg = sum(uni.values()), sum(bg.values())
    for r in rows[:25]:
        expect = math.log(
            (bg[(r.w1, r.w2)] / n_bg) / ((uni[r.w1] / n_tok) * (uni[r.w2] / n_tok))
        )
        assert r.pmi == pytest.approx(expect, abs=1e-5)
        assert r.c_ab == bg[(r.w1, r.w2)]


def test_ab_ttest_welch_spotcheck(q, spark, sf_dir):
    import statistics

    row = q("events_ab_ttest").collect()[0]
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    a = [r.value for r in ev if r.event_type == "click"]
    b = [r.value for r in ev if r.event_type == "purchase"]
    assert (row.n_a, row.n_b) == (len(a), len(b))
    va, vb = statistics.variance(a), statistics.variance(b)
    se2 = va / len(a) + vb / len(b)
    t_expect = (statistics.fmean(a) - statistics.fmean(b)) / math.sqrt(se2)
    df_expect = se2**2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert row.t_stat == pytest.approx(t_expect, abs=1e-4)
    assert row.df_welch == pytest.approx(df_expect, rel=1e-4)
    # Welch df is bounded by min(n)-1 below and n_a+n_b-2 above
    assert min(row.n_a, row.n_b) - 1 <= row.df_welch <= row.n_a + row.n_b - 2


def test_seasonality_index_normalized(q):
    rows = q("orders_seasonality_index").collect()
    assert len(rows) == 12
    # the index averages to 1 across months-of-year by construction
    assert sum(r.seasonality_idx for r in rows) / 12 == pytest.approx(1.0, abs=1e-5)
    assert all(r.avg_rev > 0 and r.n_months >= 1 for r in rows)
