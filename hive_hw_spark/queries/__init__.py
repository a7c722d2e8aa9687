"""Declared-query registry (SURVEY.md §2 Part B).

Each query is registered as a ``Query`` with:
- ``name``: stable id (``q30`` …) — the key the driver sees.
- ``fn(spark, sf_dir) -> DataFrame``: the Spark-first implementation.
- ``oracle``: equivalent ANSI SQL for the DuckDB oracle, or ``None`` for
  semantics DuckDB cannot mirror (streaming/stateful/approximate) — those
  get the weaker rows-only check.

Column names of the Spark result and the oracle SQL must match exactly
(the driver sorts columns by name before hashing).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query fn to the global registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


_MODULES = (
    "scans",
    "filters",
    "joins",
    "aggregates",
    "windows",
    "sort_limit",
    "setops",
    "scalar_funcs",
    "streaming_batch",
    "udfs",
    "llm_ops",
)

_loaded = False


def _load() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(f"hive_hw_spark.queries.{mod}")
    _loaded = True


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
