"""Pin tests for the rows-only dedup lanes (VERDICT r1 task 1/7).

The minhash/simhash operators have no DuckDB oracle (signatures derive
from engine hashes), so these tests pin their sf0.001 output exactly —
row count + content hash over the fully sorted frame — to catch any
semantic drift when the plans are restructured for performance.
"""

from __future__ import annotations

import hashlib
import os

import pytest

import sap_cta_data_pipeline_spark.operators  # noqa: F401  (registry population)
from sap_cta_data_pipeline_spark.registry import QUERIES

SF0001 = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF0001), reason="sf0.001 fixture not present"
)


def _frame(spark, key):
    pdf = QUERIES[key](spark, SF0001).toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _digest(pdf) -> str:
    return hashlib.sha256(pdf.to_csv(index=False).encode()).hexdigest()[:16]


def test_minhash_lsh_pinned(spark):
    pdf = _frame(spark, "dedup_minhash_lsh")
    assert list(pdf.columns) == [
        "doc_a", "doc_b", "est_jaccard", "n_members_a", "n_members_b",
    ]
    assert (pdf["doc_a"] < pdf["doc_b"]).all()
    assert (pdf["est_jaccard"] >= 0.75).all()
    assert not pdf.duplicated(["doc_a", "doc_b"]).any()
    assert len(pdf) == 21563
    assert _digest(pdf) == "72ec533a9608ec06"


def test_simhash_pinned(spark):
    pdf = _frame(spark, "dedup_simhash")
    assert list(pdf.columns) == ["doc_a", "doc_b", "hamming"]
    assert (pdf["doc_a"] < pdf["doc_b"]).all()
    assert (pdf["hamming"] <= 3).all()
    assert not pdf.duplicated(["doc_a", "doc_b"]).any()
    assert len(pdf) == 7166
    assert _digest(pdf) == "e60c290d0411410b"


def test_minhash_scoring_lanes_agree(spark, monkeypatch):
    """Round 13: the numpy scoring lane (matrix-gather pandas UDFs, the
    default under _SCORING_NUMPY_MAX) must produce byte-identical pairs
    to the broadcast zip-compare tier it replaced — forced here by
    dropping the numpy gate to 0."""
    from sap_cta_data_pipeline_spark.operators import text as tx

    numpy_pdf = _frame(spark, "dedup_minhash_lsh")
    monkeypatch.setattr(tx, "_SCORING_NUMPY_MAX", 0)
    hof_pdf = _frame(spark, "dedup_minhash_lsh")
    assert _digest(numpy_pdf) == _digest(hof_pdf)


def test_minhash_incremental_scoring_lanes_agree(spark, monkeypatch):
    """Round 14: the incremental lane's numpy scoring tier (same gate
    and matrix-gather UDF family as the pair lane) must produce
    byte-identical best-match verdicts to the broadcast zip-compare
    tier — forced by dropping the numpy gate to 0."""
    from sap_cta_data_pipeline_spark.operators import text as tx

    numpy_pdf = _frame(spark, "dedup_minhash_incremental")
    monkeypatch.setattr(tx, "_SCORING_NUMPY_MAX", 0)
    hof_pdf = _frame(spark, "dedup_minhash_incremental")
    assert _digest(numpy_pdf) == _digest(hof_pdf)


def test_numpy_tier_broadcasts_are_retired(spark):
    """Round 14 (ADVICE r13): the numpy tiers' matrix broadcasts must
    not accumulate across invocations — each lane entry retires the
    previous invocations' broadcasts, so the registry stays bounded and
    the driver block manager holds at most the LIVE lane's matrices."""
    from sap_cta_data_pipeline_spark.operators import text as tx

    for _ in range(3):
        QUERIES["dedup_minhash_lsh"](spark, SF0001).count()
    assert len(tx._NUMPY_TIER_BCS) <= 1
    for _ in range(2):
        QUERIES["dedup_minhash_incremental"](spark, SF0001).count()
    assert len(tx._NUMPY_TIER_BCS) <= 1
