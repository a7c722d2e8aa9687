"""Operational observability (Q247/Q248) — the 'is my plan what I think
it is' and 'what did that query actually do' surfaces an engine team
runs in production.

- :func:`explain_digest` compresses a DataFrame's physical plan into the
  handful of facts a plan review checks (scan columns, pushed filters,
  join strategies, exchange count, Python-batch operators) — the same
  red-flag list tests/test_plan_lint.py enforces repo-wide, exposed as a
  runtime tool so a NEW query can be audited interactively before it
  ships.
- :class:`MetricsListener` is a QueryExecutionListener recording, per
  completed action, the output row count and duration — the per-query
  telemetry a 100 TB deployment exports to its metrics store (here kept
  in-process; production swaps the sink).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def explain_digest(df) -> dict:
    """Compact audit of a DataFrame's physical plan."""
    qe = df._jdf.queryExecution()
    phys = qe.executedPlan().toString()
    jvm = df.sparkSession._jvm
    formatted = qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )

    scans = re.findall(r"FileScan parquet[^\[]*\[([^\]]*)\]", phys)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", phys)
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        phys,
    )
    return {
        "scan_columns": [s.strip() for s in scans],
        "pushed_filters": [p for p in pushed if p.strip()],
        "join_strategies": sorted(set(joins)),
        "n_exchanges": phys.count("Exchange"),
        "python_operators": sorted(
            set(re.findall(r"(BatchEvalPython\w*|ArrowEvalPython|"
                           r"MapInPandas|FlatMapGroupsInPandas\w*|"
                           r"MapInArrow)", phys))
        ),
        # only meaningful AFTER an action under AQE: "[codegen id : N]"
        # appears in the FORMATTED final plan (isFinalPlan=true), never
        # the initial one (CLAUDE.md AQE note) — digest an executed
        # DataFrame to read it
        "whole_stage_codegen": "codegen id" in formatted,
    }


@dataclass
class MetricsListener:
    """In-process QueryExecutionListener: one record per completed
    action (funcName, output rows where available, duration ns)."""

    records: list = field(default_factory=list)
    _handle: object = None

    def attach(self, spark) -> "MetricsListener":
        # PySpark exposes no Python QueryExecutionListener — implement
        # the JVM interface through the py4j callback server (the same
        # mechanism the streaming listener uses under the hood)
        from pyspark.java_gateway import ensure_callback_server_started

        ensure_callback_server_started(spark.sparkContext._gateway)
        outer = self

        class _L:
            class Java:
                implements = [
                    "org.apache.spark.sql.util.QueryExecutionListener"
                ]

            def onSuccess(self, funcName, qe, durationNs):
                outer.records.append(
                    {"func": funcName, "duration_ns": durationNs}
                )

            def onFailure(self, funcName, qe, exception):
                outer.records.append(
                    {"func": funcName, "error": str(exception)[:200]}
                )

        self._handle = _L()
        spark._jsparkSession.listenerManager().register(self._handle)
        return self

    def detach(self, spark) -> None:
        if self._handle is not None:
            spark._jsparkSession.listenerManager().unregister(self._handle)
            self._handle = None
