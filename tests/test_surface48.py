"""Batch FS pins — deflate-ratio regimes, ordering, and determinism
(rows-only lane: the pins ARE the correctness evidence)."""

from __future__ import annotations

import hashlib
import zlib

import sap_cta_data_pipeline_spark.operators.surface48 as m48
from sap_cta_data_pipeline_spark.operators.surface48 import (
    text_compression_ratio,
)


def _plant(monkeypatch, spark, texts):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    monkeypatch.setattr(m48, "t", lambda s, sf, name: df)


def _noise(n: int) -> str:
    buf, seed = b"", b"x"
    while len(buf) < n:
        seed = hashlib.sha256(seed).digest()
        buf += seed
    return buf[:n].decode("latin-1")


_REP = "spam " * 1000
_PROSE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "wizards brew quartz potions beneath a juniper sky, and every "
    "sentence changes its vocabulary enough to resist easy deflation "
)
_NOISE = _noise(2000)


def test_regimes_and_ordering(spark, monkeypatch):
    _plant(monkeypatch, spark, [_REP, _PROSE, _NOISE])
    rows = {r.doc_id: r for r in text_compression_ratio.__wrapped__(spark, "x").collect()}
    assert rows[0].verdict == "repetitive" and rows[0].deflate_ratio < 0.05
    assert rows[1].verdict == "prose"
    assert rows[2].verdict == "incompressible"
    assert (
        rows[0].deflate_ratio < rows[1].deflate_ratio < rows[2].deflate_ratio
    )


def test_ratio_matches_direct_zlib(spark, monkeypatch):
    _plant(monkeypatch, spark, [_PROSE])
    r = text_compression_ratio.__wrapped__(spark, "x").collect()[0]
    b = _PROSE.encode()
    expect = round(len(zlib.compress(b, 6)) / len(b), 6)
    assert r.deflate_ratio == expect
    assert r.n_chars == len(_PROSE)


def test_null_and_empty_docs_get_null_verdict(spark, monkeypatch):
    """NULL/empty text → NULL ratio AND NULL verdict (not 'prose'):
    the verdict must not fall through F.when's NULL conditions into
    otherwise()."""
    _plant(monkeypatch, spark, [_PROSE])
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, _PROSE)], "doc_id long, text string"
    )
    import sap_cta_data_pipeline_spark.operators.surface48 as m

    monkeypatch.setattr(m, "t", lambda s, sf, name: df)
    rows = {
        r.doc_id: r
        for r in text_compression_ratio.__wrapped__(spark, "x").collect()
    }
    assert rows[0].deflate_ratio is None and rows[0].verdict is None
    assert rows[1].deflate_ratio is None and rows[1].verdict is None
    assert rows[2].verdict == "prose"


def test_deterministic_across_runs(spark, monkeypatch):
    _plant(monkeypatch, spark, [_REP, _PROSE, _NOISE])
    a = sorted(map(tuple, text_compression_ratio.__wrapped__(spark, "x").collect()))
    b = sorted(map(tuple, text_compression_ratio.__wrapped__(spark, "x").collect()))
    assert a == b
