"""Whole-board plan lint: NO queries() entry may plan a
CartesianProduct — a data×data cross join is the one plan shape that
is always a 100-TB incident. Broadcast nested-loop joins are allowed
(they appear only where a side is provably tiny: one-row stat frames,
the day grid, NULL-wildcard rule tables) and are individually
adjudicated in COVERAGE.md; a plain CartesianProduct never is.

lib_* entries execute streaming jobs on construction and are excluded
(their plans are pinned by their own harness tests); everything else
is PLANNED (not executed) at sf0.001 — construction-time control-plane
actions (count() scalars) run on the tiny tables.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

_BATCH_QUERIES = sorted(k for k in entrymod.queries() if not k.startswith("lib_"))


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_no_cartesian_product(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, (
        f"{name} plans a non-broadcast cross join — data x data at scale"
    )
