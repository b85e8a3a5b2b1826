"""Local replica of the driver's DuckDB differential oracle (SURVEY.md §5.2).

Comparison model: sort columns by name, canonicalize rows, sort rows, then
require EXACT value equality (floats included — the rounding discipline in
the queries must make both engines produce bit-identical doubles; a
tolerance here would hide failures the driver's value-hash would catch).
"""

from __future__ import annotations

import decimal

import duckdb
import numpy as np
import pandas as pd

from sap_cta_data_pipeline_spark.catalog import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v):
    if isinstance(v, np.ndarray):
        return tuple(v.tolist())
    if isinstance(v, list):
        return tuple(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.integer):
        return int(v)
    return v


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sorted columns, normalized dtypes, rows sorted by stringified tuple."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            col = df[c]
            if getattr(col.dt, "tz", None) is not None:
                col = col.dt.tz_localize(None)
            df[c] = col.astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(_canon_cell)
    if len(df):
        # vectorized lexicographic row sort on stringified columns (per-row
        # python tuples were minutes-slow on 600k-row frames)
        key = df.astype(str)
        order = key.sort_values(by=list(key.columns), kind="mergesort").index
        df = df.loc[order].reset_index(drop=True)
    return df


def frames_match(actual: pd.DataFrame, expected: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    a_cols, e_cols = sorted(actual.columns), sorted(expected.columns)
    if a_cols != e_cols:
        return [f"column mismatch: spark={a_cols} oracle={e_cols}"]
    if len(actual) != len(expected):
        problems.append(f"row count: spark={len(actual)} oracle={len(expected)}")
    a, e = canonicalize(actual), canonicalize(expected)
    n = min(len(a), len(e))
    for c in a_cols:
        av, ev = a[c].iloc[:n], e[c].iloc[:n]
        # dtype-kind strictness: an int64-vs-float64 split (e.g. DuckDB
        # sum(INTEGER)→HUGEINT→float64 vs Spark BIGINT) would hash
        # differently in any bytes-level comparison even when values match
        if av.dtype.kind != ev.dtype.kind and not (
            av.dtype.kind in "OU" and ev.dtype.kind in "OU"
        ):
            problems.append(
                f"col {c!r}: dtype kind mismatch spark={av.dtype} oracle={ev.dtype}"
            )
            continue
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(ev):
            neq = np.asarray(
                ~np.isclose(av.to_numpy(), ev.to_numpy(), rtol=0, atol=0, equal_nan=True)
            )
        else:
            neq = np.asarray(~((av == ev) | (av.isna() & ev.isna())))
        bad = int(neq.sum())
        if bad:
            i = int(np.argmax(neq))
            problems.append(
                f"col {c!r}: {bad}/{n} cells differ; first diff row {i}: "
                f"spark={av.iloc[i]!r} oracle={ev.iloc[i]!r}"
            )
    return problems


def compare_query(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    actual = spark_df.toPandas()
    expected = con.execute(sql).fetchdf()
    return frames_match(actual, expected)
