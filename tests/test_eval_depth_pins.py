"""Batch DV pins — semantics certification: isotonic monotonicity +
PAV-replay, Qini accounting identities, Mann–Kendall python replay."""

from __future__ import annotations

import math

from sap_cta_data_pipeline_spark.operators.stats_tests2 import (
    events_uplift_qini,
    ml_isotonic_calibration,
    stats_mann_kendall,
)


def test_isotonic_monotone_and_equals_pav(spark, sf_dir):
    rows = sorted(
        ml_isotonic_calibration.__wrapped__(spark, sf_dir).collect(),
        key=lambda r: r.bin,
    )
    # monotone non-decreasing
    for a, b in zip(rows, rows[1:]):
        assert a.iso_rate <= b.iso_rate + 1e-9
    # equals classic PAV (pool-adjacent-violators replay in python)
    blocks = [[r.n, r.raw_rate * r.n] for r in rows]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][1] / blocks[i][0] > blocks[i + 1][1] / blocks[i + 1][0] + 1e-12:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    # expand blocks back to per-bin fits using block sizes in bins
    sizes = []
    j = 0
    for n, s in blocks:
        acc = 0
        cnt = 0
        while acc < n - 1e-9:
            acc += rows[j].n
            j += 1
            cnt += 1
        sizes.append((cnt, s / n))
    expanded = [v for cnt, v in sizes for _ in range(cnt)]
    assert len(expanded) == len(rows)
    for r, v in zip(rows, expanded):
        assert math.isclose(r.iso_rate, round(v, 6), abs_tol=2e-6)


def test_qini_accounting(spark, sf_dir):
    rows = sorted(
        events_uplift_qini.__wrapped__(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    # cumulative counts are non-decreasing and the last row covers all
    for a, b in zip(rows, rows[1:]):
        assert b.n_treated >= a.n_treated and b.n_control >= a.n_control
    last = rows[-1]
    assert math.isclose(
        last.uplift, last.conv_treated - last.conv_control, abs_tol=2e-6
    )
    # qini(k) identity: ct - cc*nt/nc recomputed from rates
    for r in rows:
        ct = r.conv_treated * r.n_treated
        cc = r.conv_control * r.n_control
        assert math.isclose(
            r.qini, round(ct - cc * (r.n_treated / r.n_control), 6),
            abs_tol=1e-3,  # rates are rounded to 6dp, counts are exact
        )


def test_mann_kendall_python_replay(spark, sf_dir):
    from pyspark.sql import functions as F

    from sap_cta_data_pipeline_spark.catalog import load_table as t

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    m = (
        o.join(c.select("c_custkey", "c_nationkey"), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("t"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "rev_c"
            )
        )
        .collect()
    )
    series: dict[int, list] = {}
    for r in m:
        series.setdefault(r.nation, []).append((r.t, r.rev_c))
    got = {
        r.nation: r
        for r in stats_mann_kendall.__wrapped__(spark, sf_dir).collect()
    }
    for nation, pts in series.items():
        ys = [y for _, y in sorted(pts)]
        n = len(ys)
        s = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        tie = sum(
            tk * (tk - 1) * (2 * tk + 5) for tk in Counter(ys).values()
        )
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        row = got[nation]
        assert row.n == n and row.s == s
        assert math.isclose(row.var_s, round(var, 6), abs_tol=1e-6)
        z = (s - (s > 0) + (s < 0)) / math.sqrt(var)
        assert math.isclose(row.z, round(z, 6), abs_tol=1e-6)
