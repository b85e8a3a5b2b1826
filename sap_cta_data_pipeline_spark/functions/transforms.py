"""Iceberg partition TRANSFORMS (spec §Partition Transforms), evaluated
as Spark Column expressions for write-side routing and driver-side
Python for pins.

The spec defines a partition value as ``transform(source_value)`` and
stores the TRANSFORMED value in each manifest entry's partition record;
readers prune by comparing query-side transformed values against those
records. Claimed here:

- ``identity``
- ``year`` / ``month`` / ``day`` / ``hour`` — ordinals relative to
  1970-01-01 (year: years from 1970; month: months from 1970-01; day:
  epoch days; hour: epoch hours). Evaluated with CALENDAR functions
  (``year``/``month``/``datediff``/``hour``), which are deterministic
  for ``date`` and ``timestamp_ntz`` inputs under ANY session time
  zone; a tz-AWARE timestamp source is REFUSED rather than silently
  routed through session-local wall-clock (the hostile-tz probe is a
  driver gate — a partition value must never depend on session conf).
- ``truncate[W]`` — ints/longs: ``W * floor(v / W)`` (Python ``%``
  already floors toward negative infinity, so ``v - v % W``); strings:
  the first ``W`` code points.
- ``bucket[N]`` — ``(murmur3_x86_32(v) & Int.MaxValue) % N`` over the
  spec's typed byte layout; int/long sources via functions/murmur3.py
  (pinned there against the spec's own hash(34L) = 2017239379 vector).

Everything else (``void``, decimal truncate, bucket over
strings/decimals here) refuses in house style — a wrong partition value
corrupts every future pruned read, so unsupported means loud.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNCATE_RE = re.compile(r"^truncate\[(\d+)\]$")

#: singular spec names; some writers emit plural forms
_TEMPORAL = {
    "year": "year", "years": "year",
    "month": "month", "months": "month",
    "day": "day", "days": "day",
    "hour": "hour", "hours": "hour",
}

def _epoch() -> Column:
    # built lazily: Column construction needs an active SparkContext
    return F.lit("1970-01-01").cast("date")


def _is_temporal_ok(dt: T.DataType, tr: str) -> bool:
    if isinstance(dt, T.DateType):
        return tr != "hour"  # spec: hour is timestamp-only
    return isinstance(dt, T.TimestampNTZType)


def transform_expr(transform: str, src: str, dt: T.DataType) -> Column:
    """The transform as a Spark Column over source column ``src`` of
    Spark type ``dt`` — the value the partition record stores."""
    c = F.col(src)
    if transform == "identity":
        return c
    tr = _TEMPORAL.get(transform)
    if tr is not None:
        if not _is_temporal_ok(dt, tr):
            raise NotImplementedError(
                f"temporal transform {transform!r} over {dt.simpleString()} "
                "is not claimed: only date and timestamp_ntz sources have "
                "session-tz-independent calendar fields (a tz-aware "
                "timestamp would route rows by session wall-clock)"
            )
        d = c.cast("date")
        if tr == "year":
            return (F.year(d) - F.lit(1970)).cast("int")
        if tr == "month":
            return (
                (F.year(d) - F.lit(1970)) * F.lit(12) + F.month(d) - F.lit(1)
            ).cast("int")
        if tr == "day":
            return F.datediff(d, _epoch()).cast("int")
        # hour: epoch days * 24 + calendar hour (ntz-exact)
        return (
            F.datediff(d, _epoch()) * F.lit(24) + F.hour(c)
        ).cast("int")
    m = _TRUNCATE_RE.match(transform)
    if m:
        w = int(m.group(1))
        if w <= 0:
            raise ValueError(f"truncate width must be positive: {transform}")
        if isinstance(dt, (T.IntegerType, T.LongType)):
            # W * floor(v/W): Spark % keeps the dividend's sign, so the
            # double-mod form floors negatives correctly (-1 trunc 10 = -10)
            return (c - (((c % w) + w) % w)).cast(dt)
        if isinstance(dt, T.StringType):
            return F.substring(c, 1, w)
        raise NotImplementedError(
            f"truncate over {dt.simpleString()} is not claimed (ints, "
            "longs, strings only — decimal truncate needs unscaled-value "
            "arithmetic this writer refuses to approximate)"
        )
    m = _BUCKET_RE.match(transform)
    if m:
        n = int(m.group(1))
        if not isinstance(dt, (T.IntegerType, T.LongType)):
            raise NotImplementedError(
                f"bucket over {dt.simpleString()} is not claimed (int/long "
                "sources only — the spec hashes each type's own byte "
                "layout and only the long layout is pinned here)"
            )
        from .murmur3 import bucket_long_np

        @F.pandas_udf("int")
        def _bucket(s):  # pragma: no cover - executed on executors
            import pandas as pd

            return pd.Series(
                bucket_long_np(s.astype("int64").to_numpy(), n)
            ).astype("int32")

        return _bucket(c)
    raise NotImplementedError(
        f"Iceberg partition transform {transform!r} is not claimed"
    )


def transform_value(transform: str, v, dt: T.DataType | None = None):
    """Driver-side Python twin of ``transform_expr`` for single values
    (pins + partition_filter construction in tests). Temporal inputs:
    ``datetime.date`` / naive ``datetime.datetime``."""
    import datetime as _dt

    if v is None:
        return None
    if transform == "identity":
        return v
    tr = _TEMPORAL.get(transform)
    if tr is not None:
        if isinstance(v, _dt.datetime):
            if v.tzinfo is not None:
                raise NotImplementedError(
                    "temporal transforms over tz-aware timestamps are not "
                    "claimed"
                )
            d, hh = v.date(), v.hour
        elif isinstance(v, _dt.date):
            if tr == "hour":
                raise NotImplementedError("hour transform is timestamp-only")
            d, hh = v, 0
        else:
            raise TypeError(f"temporal transform over {type(v).__name__}")
        days = (d - _dt.date(1970, 1, 1)).days
        if tr == "year":
            return d.year - 1970
        if tr == "month":
            return (d.year - 1970) * 12 + d.month - 1
        if tr == "day":
            return days
        return days * 24 + hh
    m = _TRUNCATE_RE.match(transform)
    if m:
        w = int(m.group(1))
        if isinstance(v, int):
            return v - (v % w)  # Python % floors: -1 % 10 = 9 -> -10
        if isinstance(v, str):
            return v[:w]
        raise NotImplementedError(f"truncate over {type(v).__name__}")
    m = _BUCKET_RE.match(transform)
    if m:
        from .murmur3 import bucket_long

        return bucket_long(int(v), int(m.group(1)))
    raise NotImplementedError(
        f"Iceberg partition transform {transform!r} is not claimed"
    )


def result_iceberg_type(transform: str, src_type: str) -> str:
    """The Iceberg type of the TRANSFORMED partition value (what the
    manifest partition record and its Avro schema carry)."""
    if transform == "identity":
        return src_type
    if _TEMPORAL.get(transform) is not None or _BUCKET_RE.match(transform):
        return "int"
    if _TRUNCATE_RE.match(transform):
        return src_type  # truncation preserves the source type
    raise NotImplementedError(
        f"Iceberg partition transform {transform!r} is not claimed"
    )
