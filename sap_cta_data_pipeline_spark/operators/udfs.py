"""§2-L UDF / UDTF surface.

UDFs are the deliberate slow path (SURVEY.md §3.2): every op that CAN be
built-in IS built-in elsewhere in this package. These two keys exercise the
escape hatches and keep them honest:

- scalar: Arrow-batched pandas UDF (the only acceptable Python scalar
  path at scale — row-at-a-time @udf is 10-100× slower and exists only in
  unit tests as an equivalence check);
- UDTF-class: generator expressions stay JVM-side via
  transform + posexplode; a true Spark-4 @udtf equivalence test lives in
  tests/test_udfs.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..catalog import load_table as t
from ..functions.parity import bi
from ..registry import query


@pandas_udf(DoubleType())
def clip_5_100(v: pd.Series) -> pd.Series:
    """Vectorized clip to [5, 100] — one Arrow batch per call."""
    return v.clip(5.0, 100.0)


@query(
    "udf_scalar_clip",
    oracle="""
    SELECT
      event_id,
      value,
      greatest(least(value, 100.0), 5.0) AS clipped
    FROM events
    """,
)
def udf_scalar_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF clip of `value` to [5, 100]; exact equality with the
    SQL-native greatest∘least (clip moves values onto exact bounds — no
    float arithmetic, so no rounding discipline needed). The row-at-a-time
    @udf twin is asserted equal in tests/test_udfs.py."""
    e = t(spark, sf_dir, "events")
    return e.select("event_id", "value", clip_5_100(F.col("value")).alias("clipped"))


@query(
    "udtf_char_ngrams",
    oracle="""
    WITH tt AS (
      SELECT doc_id, substr(text, 1, 20) AS t20
      FROM documents
      WHERE length(substr(text, 1, 20)) >= 3
    ), pos AS (
      SELECT doc_id, t20, unnest(generate_series(1, length(t20) - 2)) AS i
      FROM tt
    )
    SELECT doc_id, i AS pos, substr(t20, CAST(i AS INTEGER), 3) AS ngram
    FROM pos
    """,
)
def udtf_char_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character 3-grams of each document's first 20 chars, one output row
    per gram (UDTF-class one-to-many). Implemented as JVM-side
    transform(sequence) + posexplode — the generator never leaves the
    executor; a Python @udtf producing identical rows is unit-tested."""
    docs = t(spark, sf_dir, "documents")
    t20 = F.substring("text", 1, 20)
    # substring with a non-literal start needs the SQL form, so the
    # generator is built with expr()
    base = docs.filter(F.length(t20) >= 3).select(
        "doc_id",
        F.expr(
            "transform(sequence(1, length(substr(text, 1, 20)) - 2),"
            " i -> substr(substr(text, 1, 20), i, 3))"
        ).alias("grams"),
    )
    return base.select("doc_id", F.posexplode("grams").alias("pos0", "ngram")).select(
        "doc_id", bi(F.col("pos0") + 1).alias("pos"), "ngram"
    )


@query(
    "udtf_token_windows",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x != '') AS l
      FROM documents
      WHERE doc_id % 101 = 0
    )
    SELECT d.doc_id,
           CAST(s.s // 4 AS BIGINT)                          AS win_idx,
           array_to_string(l[s.s + 1 : s.s + 8], ' ')        AS win_text,
           CAST(least(8, len(l) - s.s) AS BIGINT)            AS n_tok
    FROM d, LATERAL (SELECT unnest(range(0, len(d.l), 4)) AS s) s
    """,
)
def udtf_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Spark-4 Python UDTF (class-based, registered, invoked through
    LATERAL): sliding 8-token windows with stride 4 over each probe
    document's token stream — the chunking shape a RAG/pretraining
    pipeline uses before embedding. Python-side row generation is the
    slow path by contract (SURVEY §3.2), so the key runs on a
    deterministic probe subset (doc_id ≡ 0 mod 101) and exists to pin the
    UDTF API surface; the JVM transform+posexplode twin (udtf_char_ngrams
    pattern) is the whole-corpus form. The same windows are reproduced by
    the oracle's pure-SQL range()/slice lateral."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="win_idx: bigint, win_text: string, n_tok: bigint")
    class TokenWindows:
        def eval(self, text: str):
            toks = [x for x in (text or "").split(" ") if x]
            for s in range(0, len(toks), 4):
                win = toks[s : s + 8]
                yield s // 4, " ".join(win), len(win)

    spark.udtf.register("token_windows", TokenWindows)
    t(spark, sf_dir, "documents").filter(F.col("doc_id") % 101 == 0).createOrReplaceTempView(
        "udtf_probe_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, w.win_idx, w.win_text, w.n_tok
        FROM udtf_probe_docs d, LATERAL token_windows(d.text) w
        """
    )


@query(
    "udf_grouped_standardize",
    oracle="""
    SELECT event_id,
           event_type,
           round((value - avg(value)    OVER (PARTITION BY event_type))
                 / nullif(stddev_samp(value) OVER (PARTITION BY event_type), 0),
                 6) AS z
    FROM events
    """,
)
def udf_grouped_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-event-type z-score (sample std,
    ddof=1) computed inside one pandas frame per group — the §2-L surface
    for whole-group Python logic (sklearn-style fit/transform per key).
    The window-function twin (the oracle) is the preferred JVM form for
    anything SQL can say; this key pins the escape hatch: one shuffle on
    the group key, each group materialized as a single Arrow batch — so
    at 100 TB the group key must be chosen to bound group size (salt or
    sub-key skewed groups), which is the documented contract here."""
    e = t(spark, sf_dir, "events")

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        mean = pdf["value"].mean()
        z = (pdf["value"] - mean) / std if std and std > 0 else pd.Series([None] * len(pdf))
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "z": z}
        )

    # rounding happens JVM-side via r6 (BigDecimal HALF_UP) — pandas
    # .round is half-to-EVEN, which diverges from the DuckDB oracle's
    # half-away-from-zero on exact .5 ties at the 7th decimal
    from ..functions.parity import r6

    raw = e.select("event_id", "event_type", "value").groupBy("event_type").applyInPandas(
        standardize, schema="event_id long, event_type string, z double"
    )
    return raw.select("event_id", "event_type", r6(F.col("z")).alias("z"))


@query(
    "udtf_dynamic_schema",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS l
      FROM documents
    )
    SELECT doc_id,
           l[1] AS tok_0,
           l[2] AS tok_1,
           l[3] AS tok_2
    FROM toks
    """,
)
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 Python UDTF with a static ``analyze()`` — the output
    SCHEMA is computed at plan time from a literal argument (here: split
    the text into the first N=3 tokens as N named columns), which is the
    API that makes generic extract-to-columns table functions possible
    without hardcoding widths. The UDTF is invoked through SQL LATERAL
    (per-row argument + foldable width argument), so this also exercises
    the analyze path end-to-end: Catalyst calls analyze() once with the
    literal, plans tok_0..tok_2, and executors stream rows over Arrow.
    Missing tokens pad as NULL — mirrored in the oracle by DuckDB's
    out-of-range list indexing."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import udtf as udtf_deco

    class SplitN:
        @staticmethod
        def analyze(text, n):
            from pyspark.sql.udtf import AnalyzeResult

            width = int(n.value)
            return AnalyzeResult(
                T.StructType(
                    [
                        T.StructField(f"tok_{i}", T.StringType())
                        for i in range(width)
                    ]
                )
            )

        def eval(self, text: str, n: int):
            toks = [x for x in (text or "").split(" ") if x]
            yield tuple(toks[i] if i < len(toks) else None for i in range(n))

    spark.udtf.register("sap_cta_split_n", udtf_deco(SplitN))
    from ..catalog import register_views

    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        "SELECT d.doc_id, s.* FROM documents d, LATERAL sap_cta_split_n(d.text, 3) s"
    )
