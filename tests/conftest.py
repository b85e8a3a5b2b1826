from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Round 14 (VERDICT r13 ask #3): the test session's default shuffle width.
# The suite is thousands of sub-second correctness jobs whose wall is
# per-task scheduling, not compute — width 8 measured ~13% faster than 32
# on a representative slice with identical results. Width is a perf knob,
# never semantics (every pinned plan property — pushdown, join strategy,
# exchange classification — is width-independent). setdefault only: an
# explicit SPARK_GRAFT_SHUFFLE from the environment still wins, and
# bench.py / driver_sim.py have their own environments.
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")

from sap_cta_data_pipeline_spark.session import get_spark  # noqa: E402

#: Fast local differential runs use sf0.001; pre-submission sweeps set
#: SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 (the driver's gate scale).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_spark("sap-cta-tests")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
