from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from flink_precisely_demo_spark.session import get_spark
    s = get_spark("tests", cpus=8)
    yield s
    s.stop()
