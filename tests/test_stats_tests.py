"""Known-value pins for the batch-CI statistics lane (the DuckDB oracles
certify cross-engine equality; these pin the MATH on hand-computable
synthetic frames)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_spearman_tie_averaged_ranks(spark):
    """y = x² on positive x is a perfect monotone map → ρ = 1 exactly;
    with a tie pair injected the tie-averaged ranks must keep ρ below 1
    but identical to scipy's published formula for this tiny case."""
    from sap_cta_data_pipeline_spark.operators import stats_tests  # noqa: F401
    from sap_cta_data_pipeline_spark.operators.stats_tests import (
        stats_spearman_rank,
    )

    # monotone: route through a temp view shaped like lineitem
    import pandas as pd

    rows = pd.DataFrame(
        {
            "l_returnflag": ["A"] * 5 + ["B"] * 4,
            "l_quantity": [1.0, 2, 3, 4, 5] + [1.0, 2, 2, 3],
            "l_extendedprice": [1.0, 4, 9, 16, 25] + [10.0, 20, 30, 5],
        }
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(os.path.join(d, "lineitem.parquet"))
        out = {
            r.l_returnflag: r.spearman_rho
            for r in stats_spearman_rank(spark, d).collect()
        }
    assert out["A"] == 1.0
    # group B: quantities (1, 2, 2, 3) → tie-averaged ranks (1, 2.5, 2.5, 4);
    # prices (10, 20, 30, 5) → ranks (2, 3, 4, 1); corr = −0.316228
    assert out["B"] == pytest.approx(-0.316228, abs=1e-6)


def test_anova_f_known_value(spark):
    """Three groups with hand-computed SSB/SSW."""
    from sap_cta_data_pipeline_spark.operators.stats_tests import (
        stats_anova_oneway,
    )
    import os
    import pandas as pd
    import tempfile

    rows = pd.DataFrame(
        {
            "event_type": ["a"] * 3 + ["b"] * 3 + ["c"] * 3,
            "value": [1.0, 2, 3, 4, 5, 6, 7, 8, 9],
            "ts": [pd.Timestamp("2024-01-01")] * 9,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(os.path.join(d, "events.parquet"))
        r = stats_anova_oneway(spark, d).collect()[0]
    # means 2,5,8; grand 5; SSB = 3*(9+0+9)=54; SSW = 3 groups * 2 = 6
    # F = (54/2)/(6/6) = 27
    assert r.k == 3 and r.n_total == 9
    assert r.ms_between == pytest.approx(27.0)
    assert r.ms_within == pytest.approx(1.0)
    assert r.f_stat == pytest.approx(27.0)


def test_mcc_and_kappa_degenerate_and_perfect(spark):
    """Perfect predictor → MCC = 1 and κ = 1 on a balanced frame."""
    import os
    import pandas as pd
    import tempfile

    from sap_cta_data_pipeline_spark.operators.stats_tests import (
        _SCORE_DIV,
        ml_cohens_kappa,
        ml_mcc,
    )

    # score ≥ 0.5*_SCORE_DIV ⇔ purchase — a perfect separable frame
    rows = pd.DataFrame(
        {
            "event_type": ["purchase"] * 4 + ["view"] * 4,
            "value": [400.0] * 4 + [10.0] * 4,
            "ts": [pd.Timestamp("2024-01-01")] * 8,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(os.path.join(d, "events.parquet"))
        m = ml_mcc(spark, d).collect()[0]
        k = ml_cohens_kappa(spark, d).collect()[0]
    assert (m.tp, m.fp, m.tn, m.fn) == (4, 0, 4, 0)
    assert m.mcc == 1.0
    assert k.kappa == 1.0 and k.po == 1.0


def test_chi2_independent_uniform_is_zero(spark):
    """A perfectly balanced type × dow table has O = E everywhere → χ²=0."""
    import os
    import pandas as pd
    import tempfile

    from sap_cta_data_pipeline_spark.operators.stats_tests import (
        stats_chi2_independence,
    )

    base = pd.Timestamp("2024-01-01")  # a Monday
    rows = []
    for t_i, et in enumerate(["click", "view"]):
        for dow in range(7):
            for _ in range(3):
                rows.append({"event_type": et, "ts": base + pd.Timedelta(days=dow)})
    pdf = pd.DataFrame(rows)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(pdf).write.parquet(os.path.join(d, "events.parquet"))
        r = stats_chi2_independence(spark, d).collect()[0]
    assert r.n_rows == 2 and r.n_cols == 7 and r.dof == 6
    assert r.chi2 == 0.0
