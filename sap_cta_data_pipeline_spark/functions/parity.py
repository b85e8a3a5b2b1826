"""Cross-engine parity helpers (SURVEY.md §5.3).

The driver value-hashes results against a DuckDB oracle, so every computed
double must be rounded identically on both sides, and computed integers must
agree in width (DuckDB aggregate/window functions emit BIGINT; several Spark
ones emit INT).

Rounding-decimals policy: the final rounding granularity must dominate the
float summation-order error, which scales with the magnitude of the result
(~|x|·1e-15·√n). Hence:

- ``r2`` for large sums (prices/revenues, magnitude ≥ 1e6);
- ``r4`` for mid-size sums (quantities, norms);
- ``r6`` for means/ratios/per-row scalars (magnitude ≤ 1e5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _round(col: Column, scale: int) -> Column:
    return F.round(col.cast("double"), scale)


def r2(col: Column) -> Column:
    return _round(col, 2)


def r4(col: Column) -> Column:
    return _round(col, 4)


def r6(col: Column) -> Column:
    return _round(col, 6)


def bi(col: Column) -> Column:
    """Cast computed integer columns to BIGINT for DuckDB width parity
    (row_number/rank/ntile/length/size/year are INT in Spark, BIGINT in
    DuckDB)."""
    return col.cast("long")


def um(col: Column | str) -> Column:
    """Exact epoch microseconds (≡ DuckDB epoch_us). unix_micros rejects
    TIMESTAMP_NTZ, which all catalog timestamps are — the cast to session
    TIMESTAMP is value-preserving because tune() pins the session to UTC."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
