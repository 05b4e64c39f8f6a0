from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# Markers gated OFF by default (r16, r15 verdict item 2): the default
# `pytest tests/` run must finish inside the driver's time budget
# (<10 min wall) — the r15 driver's verify cut off mid-suite because
# the default included the full 163-pair parity sweep (1h+). The
# exhaustive surfaces stay one flag away:
#   RUN_FULL=1 pytest tests/          # everything (the old default)
#   pytest tests/ -m full             # just the gated parity tail
_GATED_MARKS = ("full", "longevity", "slow")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_FULL") == "1" or config.getoption("-m"):
        # an explicit -m expression or RUN_FULL puts the user in
        # charge of selection; no implicit skips on top of it
        return
    skips = {m: pytest.mark.skip(
        reason=f"{m}-marked: run with -m {m} or RUN_FULL=1")
        for m in _GATED_MARKS}
    for item in items:
        for m, marker in skips.items():
            if m in item.keywords:
                item.add_marker(marker)


@pytest.fixture(scope="session")
def spark():
    from flink_precisely_demo_spark.session import get_spark
    s = get_spark("tests", cpus=8)
    yield s
    s.stop()
