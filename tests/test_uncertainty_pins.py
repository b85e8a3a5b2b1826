"""Batch DS pins — recurrence/procedure certification beyond engine
agreement: a Python replay of the Kalman fold, BH step-up invariants on
a planted battery, and bootstrap weight-law sanity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sap_cta_data_pipeline_spark.catalog import load_table as t
from sap_cta_data_pipeline_spark.operators.uncertainty_ops import (
    _B,
    _KF_P0,
    _KF_Q,
    _KF_R,
    _POIS1_CDF,
    stats_bootstrap_ci_poisson,
    stats_fdr_bh_adjust,
    ts_kalman_local_level,
)


def test_kalman_python_replay(spark, sf_dir):
    """Re-derive each priority's month series and run the filter in
    plain Python — the lane's fold must match to 6 dp (certifies the
    recurrence itself, not just Spark/DuckDB agreement)."""
    o = t(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "rev_c"
            )
        )
        .collect()
    )
    series: dict[str, list] = {}
    for r in m:
        series.setdefault(r.priority, []).append((r.month, r.rev_c))
    got = {
        r.priority: r
        for r in ts_kalman_local_level.__wrapped__(spark, sf_dir).collect()
    }
    for prio, pts in series.items():
        vals = [c / 100 for _, c in sorted(pts)]
        if len(vals) < 2:
            assert prio not in got
            continue
        l, p = vals[0], _KF_P0
        for y in vals[1:]:
            k = p / (p + _KF_R)
            l = l + k * (y - l)
            p = (1 - k) * p + _KF_Q
        row = got[prio]
        assert row.n_months == len(vals)
        assert math.isclose(row.level, round(l, 6), abs_tol=1e-6)
        assert math.isclose(row.p_var, round(p, 6), abs_tol=1e-6)
        # diffuse prior forgotten: gain converges toward the
        # steady-state root of p = (1-k)p + Q
        pss = (_KF_Q + math.sqrt(_KF_Q * _KF_Q + 4 * _KF_Q * _KF_R)) / 2
        if len(vals) >= 10:
            assert abs(row.gain_next - pss / (pss + _KF_R)) < 0.01


def test_bh_stepup_invariants(spark, sf_dir):
    rows = stats_fdr_bh_adjust.__wrapped__(spark, sf_dir).collect()
    by_rk = sorted(rows, key=lambda r: r.rk)
    n = len(by_rk)
    assert [r.rk for r in by_rk] == list(range(1, n + 1))
    prev_adj = 0.0
    for r in by_rk:
        assert r.p_adjusted >= r.p_value - 1e-9, "adjusted must dominate p"
        assert r.p_adjusted <= 1.0
        assert r.p_adjusted >= prev_adj - 1e-9, "step-up is monotone in rank"
        prev_adj = r.p_adjusted
        assert r.discovery == (r.p_adjusted <= 0.10)
    # python replay of the step-up on the same battery
    ps = [r.p_value for r in by_rk]
    adj, run = [], float("inf")
    for i in range(n - 1, -1, -1):
        run = min(run, ps[i] * n / (i + 1))
        adj.append(min(run, 1.0))
    adj.reverse()
    for r, a in zip(by_rk, adj):
        assert math.isclose(r.p_adjusted, round(a, 6), abs_tol=2e-6)


def test_bootstrap_weight_law_and_determinism(spark, sf_dir):
    out1 = stats_bootstrap_ci_poisson.__wrapped__(spark, sf_dir).collect()
    out2 = stats_bootstrap_ci_poisson.__wrapped__(spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    for r in out1:
        assert r.ci_lo <= r.boot_mean <= r.ci_hi
        # Poisson(1) resample means concentrate near the observed mean
        assert abs(r.boot_mean - r.obs_mean) < 6 * max(r.boot_se, 1e-9)
    # the inverse-CDF thresholds are the Poisson(1) CDF
    acc = 0.0
    for k, c in enumerate(_POIS1_CDF):
        acc += math.exp(-1) / math.factorial(k)
        assert math.isclose(float(c), acc, rel_tol=1e-12)
    assert _B == 32
