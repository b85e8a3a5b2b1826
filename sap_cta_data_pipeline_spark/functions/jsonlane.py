"""Arrow-native JSON field extraction (round-11 verdict ask #2).

``json_extract_typed`` is the one perf letter that did NOT fall with
scale (21.7x sf0.1 -> 22.6x sf1 -> 17.5x sf10): the plan is already the
one-parse ``from_json`` shape, so the residual is the per-row JVM
Jackson parse vs DuckDB's SIMD JSON. This module is the last untried
lane: keep the parse OUT of the JVM entirely — a scalar pandas UDF
receives each Arrow batch of JSON strings, joins them into one NDJSON
buffer (JSON strings cannot contain a raw newline; it must be escaped,
so the join is lossless), and hands the whole buffer to pyarrow's C++
JSON reader with an explicit one-field schema. The per-row cost becomes
vectorized C++ parse work plus one Arrow column copy instead of a
Jackson object tree per row.

Null/empty inputs are substituted with ``{}`` before the join so row
alignment survives and those rows yield NULL, matching
``from_json``/``json_extract_string`` semantics for this shape.
Corrupt JSON differs between engines: ``from_json`` nulls the row
(PERMISSIVE) where the Arrow reader throws for the whole buffer — so a
batch that fails the fast path falls back to a per-row lenient parse
(stdlib json, int-strict: only a JSON integer yields a value) instead
of failing the job. The fallback costs only on batches that actually
contain corrupt rows; clean data never leaves the C++ path.

Measured (scripts/json_rung.py, canonical idle-box run, warm,
median-of-3): arrow 0.769/0.920/1.334/4.253 s vs from_json
0.977/2.499/2.824/7.404 s at sf0.1/sf1/sf10/sf30 — a 1.3-2.7x wall cut
at every scale, and the DuckDB ratio falls 27.3x -> 11.7x -> 11.5x ->
1.05x (at sf30 DuckDB's count-DISTINCT working set leaves cache and
the SIMD-parse edge stops dominating). Shipped as
``json_extract_typed``'s parse lane (BASELINE.md round-12).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.json as pj
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _lenient_rowwise(vals: pd.Series, field: str) -> pd.Series:
    """Per-row stdlib-json slow path (int-strict: only a JSON integer
    yields a value) — matches from_json's PERMISSIVE semantics, which
    parse the FIRST JSON value and ignore any trailing content (measured
    round 13: Jackson returns 2 for '{"k": 2} trailing', '{"k": 2},' and
    '{"k": 2}\\n{"k": 3}' alike), hence raw_decode, not loads."""
    import json as _json

    dec = _json.JSONDecoder()

    def _one(v: str):
        try:
            x, _ = dec.raw_decode(v.lstrip())
        except Exception:  # noqa: BLE001 — corrupt row -> NULL
            return None
        x = x.get(field) if isinstance(x, dict) else None
        return x if isinstance(x, int) and not isinstance(x, bool) else None

    return vals.map(_one)


def _parse_long_batch(series: pd.Series, field: str) -> pd.Series:
    """Parse one Arrow batch of JSON strings, returning ``field`` as
    int64 (NULL where absent/null/unparsable-as-long)."""
    if series.empty:
        return pd.Series([], dtype="object")
    vals = series.fillna("{}").replace("", "{}")
    # Alignment guard (round-13 advice fix): a corrupt value containing a
    # raw newline/CR whose fragments are themselves valid JSON parses as
    # EXTRA rows without tripping ArrowInvalid, and a whitespace-only
    # value parses as ZERO rows — either breaks the one-line-per-row
    # invariant the NDJSON join depends on, and the two can even cancel
    # out to a matching row count with silently misaligned values. Any
    # such row routes the whole batch to the per-row lenient path (clean
    # data never pays it), and the row-count re-check below is the
    # belt-and-braces backstop. One RE2 pass over the Arrow buffer — 58
    # ms/200k rows vs 155 ms for the two-pass pandas form (measured),
    # against ~34 ms for the NDJSON join itself.
    import pyarrow.compute as pc

    unsafe = pc.any(
        pc.match_substring_regex(pa.Array.from_pandas(vals), r"[\n\r]|^\s*$")
    ).as_py()
    if unsafe:
        return _lenient_rowwise(vals, field)
    try:
        buf = ("\n".join(vals)).encode("utf-8")
        tbl = pj.read_json(
            pa.BufferReader(buf),
            parse_options=pj.ParseOptions(
                explicit_schema=pa.schema([(field, pa.int64())]),
                unexpected_field_behavior="ignore",
            ),
        )
        if tbl.num_rows != len(vals):
            return _lenient_rowwise(vals, field)
        col = tbl.column(field)
        # integer_object_nulls keeps int64 exact alongside nulls — the
        # default to_pandas() converts a nullable int64 column to
        # float64, silently losing precision past 2^53 (advice fix);
        # null-free batches keep the fast int64 conversion.
        if col.null_count:
            return col.to_pandas(integer_object_nulls=True)
        return col.to_pandas()
    except pa.ArrowInvalid:
        # corrupt row(s) in the batch: lenient per-row slow path (see
        # module docstring) — only batches with bad rows pay it
        return _lenient_rowwise(vals, field)


def json_field_arrow(col: str | Column, field: str) -> Column:
    """BIGINT extraction of top-level ``field`` from a JSON-string
    column via the Arrow C++ parser (see module docstring). Drop-in for
    ``F.from_json(col, f"{field} long")[field]`` on flat objects."""

    @F.pandas_udf(LongType())
    def _extract(s: pd.Series) -> pd.Series:
        return _parse_long_batch(s, field)

    return _extract(F.col(col) if isinstance(col, str) else col)
