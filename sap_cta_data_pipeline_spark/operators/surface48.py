"""§2 round-9 batch FS — compression-ratio quality signal (the
Gopher/FineWeb curation heuristic).

``text_compression_ratio``: per-document deflate ratio
len(zlib(text)) / len(text) — the cheap universal-redundancy probe LLM
curation pipelines use alongside the repetition/entropy family:
boilerplate and template spam compress far below prose, random/binary
junk refuses to compress. zlib level 6 with fixed strategy is
bit-deterministic for a given input (the DEFLATE stream depends only on
input bytes and level), so the per-doc ratio is stable across runs and
partitionings; there is no SQL twin (DuckDB exposes no deflate), which
makes this a rows-only lane with closed-form pins instead of an oracle
— the declared §2-L-style exception, and a genuine Pandas-UDF use case:
the work is byte-level compression, not relational algebra.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_LOW = 0.30  # below: highly repetitive (template/boilerplate)
_HIGH = 0.80  # above: incompressible (random / non-text junk)


@pandas_udf(DoubleType())
def _deflate_ratio(texts: pd.Series) -> pd.Series:
    """Arrow-batched deflate ratio — zlib level 6, default strategy;
    deterministic per input bytes. Empty docs map to NULL."""
    import zlib

    def ratio(s):
        if s is None:
            return None
        b = s.encode("utf-8")
        if not b:
            return None
        return len(zlib.compress(b, 6)) / len(b)

    return texts.map(ratio)


@query("text_compression_ratio")  # rows-only: no SQL deflate twin
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document deflate ratio with the curation verdict: 'repetitive'
    below 0.30, 'incompressible' above 0.80, 'prose' between — the
    compression-based quality screen of the Gopher/FineWeb lineage,
    complementing text_repetition_gopher (n-gram grain) with a
    byte-grain universal detector. Pins: a 1000×-repeated token scores
    far below 0.05; sha-chained byte noise exceeds 0.8 (deflate's
    ceiling for textual junk — hence the 0.8 cut); repetitive < prose <
    noise ordering holds on planted docs; determinism pinned by running
    the lane twice.

    Scale: one scan + one Arrow-batched pandas UDF (byte-level work no
    relational engine expresses) + an in-row verdict expression — no
    shuffle at all; the canonical embarrassingly-parallel curation
    sweep."""
    docs = t(spark, sf_dir, "documents")
    r = _deflate_ratio(F.col("text"))
    return docs.select(
        "doc_id",
        bi(F.length(F.col("text"))).alias("n_chars"),
        r6(r).alias("deflate_ratio"),
        F.when(r.isNull(), F.lit(None).cast("string"))
        .when(r < _LOW, "repetitive")
        .when(r > _HIGH, "incompressible")
        .otherwise("prose")
        .alias("verdict"),
    )
