"""Registry-wide physical-plan linter.

test_plan_shapes.py pins specific queries' plans; this test sweeps EVERY
registry entry and rejects the three classes of scale-killers the
project bans (the 100 TB contract — a query that passes its oracle but
plans a per-row Python UDF or an unpartitioned window is still wrong):

1. ``BatchEvalPython`` — row-at-a-time Python UDF in the plan. Only the
   deliberate Python-surface demos (q84 SQL-registered UDF, q85 UDTF)
   may carry one; everything else must stay JVM-side or Arrow-batched.
2. ``CartesianProduct`` / non-broadcast nested loop — only q26 (the
   cross-join cardinality contract) is allowed an unbounded cross.
3. Unpartitioned window specs (ORDER BY with no PARTITION BY) — the
   single-task global sort. No exceptions; the bucketed two-phase
   rewrites exist precisely so none remain.

Runs against sf0.001 — plan analysis only; nothing executes except the
index-build collects some ANN queries do at build time.
"""

from __future__ import annotations

import re

import pytest

from hive_hw_spark.queries import all_queries

# Python-surface demos whose contract IS the row-Python path
_ROW_PYTHON_OK = {"q84", "q85", "q223"}
# deliberate unbounded cross joins
_CARTESIAN_OK = {"q26"}
# q41's ADAPTIVE cut-over picks the single-window rank below
# Q41_BUCKET_MIN_ROWS (we lint at sf0.001, far under it); the
# at-scale bucketed plan is pinned clean by test_plan_shapes.py::
# test_q41_bucketed_rank_is_distributed_and_preaggregated
_UNPARTITIONED_WINDOW_OK = {"q41"}
# queries with driver-side iteration or DML side effects: still linted,
# but their builds are the expensive ones — keep them last so a lint
# failure elsewhere reports first
_QUERIES = sorted(all_queries())


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _unpartitioned_window_specs(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(
        r"windowspecdefinition\(([^)]*?)specifiedwindowframe", plan
    )
    return [
        s
        for s in specs
        if re.match(r"\s*[^,]*\s(ASC|DESC)\sNULLS\s(FIRST|LAST),", s)
    ]


@pytest.mark.parametrize("name", _QUERIES)
def test_plan_lint(name, spark, tiny_sf_dir):
    df = all_queries()[name].fn(spark, tiny_sf_dir)
    phys = _physical(df)
    if name not in _ROW_PYTHON_OK:
        assert "BatchEvalPython" not in phys, (
            f"{name}: row-at-a-time Python UDF in physical plan"
        )
    if name not in _CARTESIAN_OK:
        assert "CartesianProduct" not in phys, (
            f"{name}: cartesian product in physical plan"
        )
    if name not in _UNPARTITIONED_WINDOW_OK:
        bad = _unpartitioned_window_specs(df)
        assert not bad, f"{name}: unpartitioned window specs: {bad}"
