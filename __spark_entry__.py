"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (Q30, TPC-H-Q1 shape) at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full declared-query registry
from ``hive_hw_spark.queries`` (SURVEY.md §2 Part B).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_hw_spark.queries import all_queries, oracle_sqls, query_fns  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q122 is the end-to-end training-corpus pipeline: MinHash/LSH
    near-dup cluster representatives -> benchmark decontamination ->
    per-language quality floor -> mixture rebalance -> sequence packing
    (every stage an individually oracle-attested operator)."""
    return all_queries()["q122"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return oracle_sqls()
