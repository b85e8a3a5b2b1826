"""Batch FN pins — RRF consensus property and the Grubbs closed form."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import sap_cta_data_pipeline_spark.operators.surface45 as m45
from sap_cta_data_pipeline_spark.operators.surface45 import (
    ir_rrf_fusion,
    stats_grubbs_max_dev,
)

_ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_rrf_consensus_beats_single_list(spark, monkeypatch):
    # term ranks by df: 'alpha' (3 docs), 'bravo' (2 docs)
    # doc 1: top tf in BOTH lists; doc 2: top of neither but present in
    # both; doc 3: only in alpha's list
    docs = [
        (1, "alpha alpha alpha bravo bravo"),
        (2, "alpha alpha bravo"),
        (3, "alpha"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    monkeypatch.setattr(m45, "t", lambda s, sf, name: df)
    out = ir_rrf_fusion.__wrapped__(spark, "x").collect()
    assert out[0].doc_id == 1
    assert math.isclose(out[0].rrf, 1 / 61 + 1 / 61, abs_tol=1e-6)
    # doc 2 (rank 2 in both) beats doc 3 (rank 3 in one list only)
    by_id = {r.doc_id: r for r in out}
    assert by_id[2].rrf > by_id[3].rrf
    assert by_id[3].r_b is None


def test_grubbs_lone_spike_closed_form(spark, monkeypatch):
    base = datetime(2020, 1, 1)
    rows, k = [], 0
    counts = [4] * 15 + [20]
    for d, c in enumerate(counts):
        for _ in range(c):
            k += 1
            rows.append((k, 1, "O", 1.0, base + timedelta(days=d), "x"))
    df = spark.createDataFrame(rows, _ORD_SCHEMA)
    monkeypatch.setattr(m45, "t", lambda s, sf, name: df)
    r = stats_grubbs_max_dev.__wrapped__(spark, "x").collect()[0]
    assert (r.n_days, r.worst_count) == (16, 20)
    assert r.worst_day == "2020-01-16"
    n, mean = 16, (15 * 4 + 20) / 16
    var = (15 * 16 + 400) / 16 - mean * mean
    assert math.isclose(r.g_stat, (20 - mean) / math.sqrt(var), abs_tol=1e-5)
