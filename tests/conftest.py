from __future__ import annotations

import os

import pytest

from event_streaming_bnpl_demo_spark.session import get_spark

#: Parity tests run at sf0.001 by default (fast inner loop); set
#: SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 to replicate the driver's gate.
SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[*]")
    yield s
    s.stop()
