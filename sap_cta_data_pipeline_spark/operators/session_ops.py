"""§2 round-7 batch CX — capped-duration sessionization.

Production sessionization rules are rarely the textbook single-gap
form: the common contract is "30-minute inactivity gap OR 4-hour
maximum session length, whichever first" (the analytics-suite default).
The duration cap makes the boundary decision NON-ASSOCIATIVE — whether
an event opens a new session depends on the CURRENT session's start,
which depends on every prior boundary — so no window/gaps-and-islands
form exists (the running-max trick that saved the dynamic-gap lane
needs boundaries independent of session identity). This is exactly the
declared §2-L surface: a per-user fold in applyInPandas (Arrow batches
of (ts, id) pairs, never payloads), value-oracled by a DuckDB
list_reduce replay of the IDENTICAL fold (the pack_sequences_bestfit
pattern — accumulator as a flat BIGINT list because struct-of-list
accumulators are broken in DuckDB 1.0).

Scale: one user-keyed shuffle; per-user state is (current start, last
ts) — O(1) — and the fold streams each user's events once. The same
shape ships as applyInPandasWithState for the streaming twin of this
contract (stream_session covers the uncapped form)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..registry import query

_GAP_US = 30 * 60 * 1_000_000
_MAX_US = 4 * 3600 * 1_000_000


def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["t", "event_id"]).reset_index(drop=True)
    out = []
    cur_start = last = None
    sid = 0
    n = 0
    for t_us in pdf["t"]:
        t_us = int(t_us)
        if (
            cur_start is None
            or t_us - last > _GAP_US
            or t_us - cur_start > _MAX_US
        ):
            if cur_start is not None:
                out.append((sid, cur_start, n, last - cur_start))
            sid += 1
            cur_start, n = t_us, 0
        last = t_us
        n += 1
    if cur_start is not None:
        out.append((sid, cur_start, n, last - cur_start))
    res = pd.DataFrame(
        out, columns=["session_id", "session_start_us", "n_events", "duration_us"]
    )
    res.insert(0, "user_id", pdf["user_id"].iloc[0])
    return res


@query(
    "events_sessionize_capped",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t, event_id FROM events
    ),
    per_user AS (
      SELECT user_id, list(t ORDER BY t, event_id) AS ts FROM e GROUP BY 1
    ),
    folded AS (
      -- acc = [cur_start, last_ts, flag_1, ..., flag_k]; each event
      -- becomes [t, t, 1] so the FIRST event seeds the accumulator as
      -- its own session start. New session iff gap > 30min OR the
      -- current session would exceed 4h.
      SELECT user_id, ts,
        list_reduce(
          list_transform(ts, x -> [x, x, CAST(1 AS BIGINT)]),
          (acc, x) -> CASE
            WHEN x[1] - acc[2] > {_GAP_US} OR x[1] - acc[1] > {_MAX_US}
            THEN list_concat([x[1], x[1]],
                             list_append(list_slice(acc, 3, len(acc)),
                                         CAST(1 AS BIGINT)))
            ELSE list_concat([acc[1], x[1]],
                             list_append(list_slice(acc, 3, len(acc)),
                                         CAST(0 AS BIGINT)))
          END) AS st
      FROM per_user
    ),
    flags AS (
      SELECT user_id,
             unnest(list_zip(ts, list_slice(st, 3, len(st)))) AS z
      FROM folded
    ),
    marked AS (
      SELECT user_id, z[1] AS t, z[2] AS is_new,
             sum(z[2]) OVER (PARTITION BY user_id ORDER BY z[1]
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flags
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           CAST(min(t) AS BIGINT) AS session_start_us,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(t) - min(t) AS BIGINT) AS duration_us
    FROM marked GROUP BY 1, 2
    """,
)
def events_sessionize_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-OR-cap sessionization (30-min inactivity OR 4-hour max
    length): the cap makes boundaries depend on the running session
    START, a non-associative fold no window rewrite expresses — the
    lane runs it as a per-user applyInPandas fold (O(1) state, events
    streamed once after ONE user-keyed shuffle), and the oracle replays
    the IDENTICAL fold via DuckDB list_reduce with the accumulator as
    [cur_start, last_ts, flags...], so the hash certifies every
    boundary decision. Integer-microsecond arithmetic end to end —
    no float in the fold."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        "event_id",
    )
    return e.groupBy("user_id").applyInPandas(
        _fold,
        "user_id long, session_id long, session_start_us long, "
        "n_events long, duration_us long",
    )
