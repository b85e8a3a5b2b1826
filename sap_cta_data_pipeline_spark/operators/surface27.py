"""§2 round-8 batch EG — ratio-metric inference (delta method) +
impossible-travel detection.

- ``events_ab_ratio_delta_method``: the experimentation tool nobody can
  skip once their metric is a RATIO (revenue per event, CTR per
  exposure): user-level ratio metrics violate the i.i.d. assumption a
  plain t-test needs, so the standard error comes from the delta
  method — Var(X̄/Ȳ) ≈ (s²_x + R²·s²_y − 2R·s_xy)/(n·ȳ²) (Deng et al.,
  "Applying the Delta Method in Metric Analytics"). Per-arm ratio + SE
  plus the two-arm z statistic.
- ``events_impossible_travel``: the security/fraud dq staple — derive
  each event's location (city-grid fixture from the props payload),
  compute the great-circle speed between a user's consecutive events,
  and flag physically impossible transitions (> 900 km/h). One
  user-ordered window + haversine; the geo twin of events_bot_detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table as t
from ..functions.parity import bi, r6
from ..registry import query

_SPEED_LIMIT_KMH = 900.0


@query(
    "events_ab_ratio_delta_method",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
             sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
                 AS x,
             count(*) * 1.0 AS y
      FROM events GROUP BY user_id
    ), arms AS (
      SELECT arm,
             count(*) AS n,
             avg(x) AS mx, avg(y) AS my,
             var_samp(x) AS vx, var_samp(y) AS vy,
             covar_samp(x, y) AS cxy
      FROM per_user GROUP BY arm
    ), est AS (
      SELECT arm, n, mx / my AS r,
             sqrt((vx + (mx / my) * (mx / my) * vy
                   - 2 * (mx / my) * cxy) / (n * my * my)) AS se
      FROM arms
    )
    SELECT arm,
           CAST(n AS BIGINT) AS n_users,
           round(r, 6) AS ratio,
           round(se, 6) AS se,
           round((max(CASE WHEN arm = 1 THEN r END) OVER ()
                  - max(CASE WHEN arm = 0 THEN r END) OVER ())
                 / sqrt(max(CASE WHEN arm = 1 THEN se * se END) OVER ()
                        + max(CASE WHEN arm = 0 THEN se * se END) OVER ()),
                 6) AS z_diff
    FROM est
    """,
)
def events_ab_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method inference for the ratio metric purchase-revenue per
    event: per user x = purchase revenue, y = events; per arm
    (user-parity fixture) R = x̄/ȳ with
    SE² = (s²_x + R²s²_y − 2R·s_xy)/(n·ȳ²) — the user-level covariance
    term a naive per-event t-test ignores (and why it over-rejects on
    ratio metrics). Emits both arms plus the shared two-sample z. The
    SE formula is replayed in python from the same per-user frame in
    tests.

    Scale: one user-grain aggregation, then 2-row arm statistics —
    var/cov are single-pass distributed aggregates, so the whole
    analysis is one shuffle over users regardless of event volume."""
    e = t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0.0
            )
        ).alias("x"),
        (F.count(F.lit(1)) * 1.0).alias("y"),
    ).select(
        (F.col("user_id") % 2).cast("int").alias("arm"), "x", "y"
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_samp("x").alias("vx"),
        F.var_samp("y").alias("vy"),
        F.covar_samp("x", "y").alias("cxy"),
    )
    r = F.col("mx") / F.col("my")
    se = F.sqrt(
        (F.col("vx") + r * r * F.col("vy") - 2 * r * F.col("cxy"))
        / (F.col("n") * F.col("my") * F.col("my"))
    )
    est = arms.select("arm", "n", r.alias("r"), se.alias("se"))
    wall = Window.partitionBy()
    r1 = F.max(F.when(F.col("arm") == 1, F.col("r"))).over(wall)
    r0 = F.max(F.when(F.col("arm") == 0, F.col("r"))).over(wall)
    v1 = F.max(F.when(F.col("arm") == 1, F.col("se") * F.col("se"))).over(wall)
    v0 = F.max(F.when(F.col("arm") == 0, F.col("se") * F.col("se"))).over(wall)
    return est.select(
        "arm",
        bi(F.col("n")).alias("n_users"),
        r6(F.col("r")).alias("ratio"),
        r6(F.col("se")).alias("se"),
        r6((r1 - r0) / F.sqrt(v1 + v0)).alias("z_diff"),
    )


@query(
    "events_impossible_travel",
    oracle=f"""
    WITH located AS (
      SELECT user_id, ts, event_id,
             (CAST(json_extract_string(props, '$.k') AS BIGINT) % 10)
                 * 8.0 - 36.0 AS lat,
             (CAST(json_extract_string(props, '$.k') AS BIGINT) // 10)
                 * 15.0 - 70.0 AS lon
      FROM events
    ), hops AS (
      SELECT user_id, lat, lon,
             lag(lat) OVER w AS plat, lag(lon) OVER w AS plon,
             (epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 3600000000.0
                 AS dt_h
      FROM located
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), speeds AS (
      SELECT user_id,
             2 * 6371.0 * asin(sqrt(
               pow(sin(radians(lat - plat) / 2), 2)
               + cos(radians(plat)) * cos(radians(lat))
                 * pow(sin(radians(lon - plon) / 2), 2))) / dt_h AS kmh
      FROM hops WHERE plat IS NOT NULL AND dt_h > 0
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_moves,
           CAST(sum(CASE WHEN kmh > {_SPEED_LIMIT_KMH} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_impossible,
           round(max(kmh), 6) AS max_kmh
    FROM speeds GROUP BY user_id
    HAVING sum(CASE WHEN kmh > {_SPEED_LIMIT_KMH} THEN 1 ELSE 0 END) > 0
    """,
)
def events_impossible_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impossible-travel detection: each event's location is a 10×10
    city grid derived from the props payload (the deterministic stand-in
    for an IP-geo lookup), consecutive same-user events yield a
    great-circle speed, and users with any hop over 900 km/h are
    flagged with their move/violation counts and fastest hop — the
    account-compromise heuristic every auth log pipeline runs. Speed
    uses the haversine of the geo lane with the same rounding
    discipline; zero-elapsed hops are excluded (speed undefined).

    Scale: one user-partitioned window (the sessionization shuffle) and
    a user-keyed aggregation — per-event work is a few transcendentals,
    map-side after the single shuffle."""
    e = t(spark, sf_dir, "events")
    k = F.from_json("props", "k long")["k"]
    located = e.select(
        "user_id",
        "ts",
        "event_id",
        ((k % 10) * 8.0 - 36.0).alias("lat"),
        (F.floor(k / 10) * 15.0 - 70.0).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    from ..functions.parity import um

    hops = located.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
        ((um("ts") - um(F.lag("ts").over(w))) / 3600000000.0).alias("dt_h"),
    ).filter(F.col("plat").isNotNull() & (F.col("dt_h") > 0))
    rad = F.radians
    hav = (
        F.pow(F.sin(rad(F.col("lat") - F.col("plat")) / 2), 2)
        + F.cos(rad("plat"))
        * F.cos(rad("lat"))
        * F.pow(F.sin(rad(F.col("lon") - F.col("plon")) / 2), 2)
    )
    speeds = hops.select(
        "user_id",
        (2 * 6371.0 * F.asin(F.sqrt(hav)) / F.col("dt_h")).alias("kmh"),
    )
    imp = F.sum(F.when(F.col("kmh") > _SPEED_LIMIT_KMH, 1).otherwise(0))
    return (
        speeds.groupBy("user_id")
        .agg(
            bi(F.count(F.lit(1))).alias("n_moves"),
            bi(imp).alias("n_impossible"),
            r6(F.max("kmh")).alias("max_kmh"),
        )
        .filter(F.col("n_impossible") > 0)
    )
