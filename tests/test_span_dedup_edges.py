"""Crafted-corpus edge cases for text_span_dedup / dedup_containment /
dedup_incremental_exact: boundary token counts (7/8/9 tokens around the
8-token span width), whole-doc self-repetition, exact duplicates, and
subset containment — cases the synthetic corpus only hits by accident.
The ops take an sf_dir, so the crafted corpus is written as a real
documents.parquet into a tmp dir shaped like a scale-factor directory."""

from __future__ import annotations

import pytest

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.registry import QUERIES

DOCS = [
    # doc 1: exactly 7 tokens → zero spans, dup_frac must be 0.0 not null
    (1, "a b c d e f g", "en", "web", 13),
    # doc 2: exactly 8 tokens → exactly one span
    (2, "a b c d e f g h", "en", "web", 15),
    # docs 3+4: identical 9-token texts → all spans cross-doc duplicated
    (3, "p q r s t u v w x", "en", "web", 17),
    (4, "p q r s t u v w x", "en", "web", 17),
    # doc 5: the same 8-gram repeated twice in one doc (self-repetition:
    # within-doc dups but NOT cross-doc)
    (5, "m n o p2 q2 r2 s2 t2 m n o p2 q2 r2 s2 t2", "en", "web", 41),
    # doc 6: subset of doc 3's tokens (containment 1.0 one direction)
    (6, "p q r s t", "en", "web", 9),
    # doc 7: same tokens as 6 but different lang → lang block applies
    (7, "p q r s t", "de", "web", 9),
]


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("crafted_sf"))
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_span_dedup_boundaries(spark, crafted_dir):
    rows = {r.doc_id: r for r in QUERIES["text_span_dedup"](spark, crafted_dir).collect()}
    assert rows[1].n_spans == 0 and rows[1].dup_frac == 0.0
    assert rows[2].n_spans == 1 and rows[2].n_dup_spans == 0
    # identical docs: both have every span cross-doc duplicated
    for d in (3, 4):
        assert rows[d].n_spans == 2
        assert rows[d].n_dup_spans == 2 and rows[d].n_cross_doc_spans == 2
        assert rows[d].dup_frac == 1.0
    # self-repetition: doc 5 is 16 tokens → 9 spans; the window wraps the
    # repeat so the first span (m n o p2 q2 r2 s2 t2) occurs at positions
    # 1 and 9 → duplicated WITHIN the doc, but cross-doc must stay 0
    assert rows[5].n_spans == 9
    assert rows[5].n_dup_spans == 2
    assert rows[5].n_cross_doc_spans == 0


def test_containment_direction_and_lang_block(spark, crafted_dir):
    got = {
        (r.doc_a, r.doc_b): r
        for r in QUERIES["dedup_containment"](spark, crafted_dir).collect()
    }
    # doc 6 ⊂ doc 3 and ⊂ doc 4: containment 1.0 from the subset side
    assert got[(6, 3)].containment == 1.0
    assert got[(6, 4)].containment == 1.0
    # reverse direction: 5/9 ≈ 0.556 < 0.9 → absent
    assert (3, 6) not in got
    # identical docs 3/4 contain each other, both directions
    assert got[(3, 4)].containment == 1.0 and got[(4, 3)].containment == 1.0
    # doc 7 matches doc 6's tokens exactly but is lang-blocked out
    assert not any(7 in k for k in got)


def test_incremental_exact_crafted(spark, crafted_dir):
    rows = {
        r.doc_id: r
        for r in QUERIES["dedup_incremental_exact"](spark, crafted_dir).collect()
    }
    # batch = odd ids {1,3,5,7}; corpus = even ids {2,4,6}
    # doc 3's fingerprint == doc 4's (identical text, doc 4 in corpus)
    assert rows[3].dup_of_corpus and rows[3].corpus_keeper == 4 and not rows[3].keep
    # doc 7's fp (p q r s t) == corpus doc 6's fp — exact dedup ignores lang
    assert rows[7].dup_of_corpus and rows[7].corpus_keeper == 6
    # docs 1 and 5 are unique → keep
    assert rows[1].keep and rows[5].keep
    assert set(rows) == {1, 3, 5, 7}
