from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
