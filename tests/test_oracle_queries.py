"""Every oracle-tagged declared query hash-matches DuckDB at sf0.01.

This mirrors the driver's t2 gate (SURVEY.md §5.2 item 2): one
parameterized test per registry entry that declares an oracle.
"""

from __future__ import annotations

import pytest

from hive_hw_spark.queries import all_queries
from tests.oracle_harness import compare

_ORACLE_QUERIES = sorted(
    name for name, q in all_queries().items() if q.oracle is not None
)


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_oracle_parity(name, spark, sf_dir, oracle):
    q = all_queries()[name]
    df = q.fn(spark, sf_dir)
    compare(df, oracle, q.oracle, name=name)


def test_harness_rejects_dtype_kind_mismatch(spark, oracle):
    """The q64 class (round 3): equal values, int-vs-float dtype split.

    The driver's hash is dtype-sensitive; the local harness must fail too,
    not canonicalize the difference away.
    """
    df = spark.range(3).selectExpr("id AS k", "CAST(id AS BIGINT) AS x")
    mistyped = (
        "SELECT v AS k, CAST(v AS DOUBLE) AS x "
        "FROM (VALUES (0),(1),(2)) t(v) ORDER BY k"
    )
    with pytest.raises(AssertionError, match="dtype-kind"):
        compare(df, oracle, mistyped, name="mistyped")


def test_harness_rejects_decimal_vs_float_object_column(spark, oracle):
    """Object-dtype subkinds (round-4 brief item 6): Decimal vs float.

    Spark DECIMAL lands in pandas as object-of-Decimal; if the oracle emits
    DOUBLE instead, Decimal('1.50') and 1.5 repr differently and the driver
    hash diverges — the harness must flag the kind split, not bucket both
    as 'object'.
    """
    df = spark.range(3).selectExpr("id AS k", "CAST(id AS DECIMAL(10,2)) AS x")
    mistyped = (
        "SELECT v AS k, CAST(v AS DOUBLE) AS x "
        "FROM (VALUES (0),(1),(2)) t(v) ORDER BY k"
    )
    with pytest.raises(AssertionError, match="dtype-kind"):
        compare(df, oracle, mistyped, name="decimal_vs_float")


def test_harness_reports_row_count_before_dtype_kind(spark, oracle):
    """A zero-row side must surface as a row-count error, not a confusing
    default-dtype kind mismatch (round-4 ADVICE)."""
    df = spark.range(3).selectExpr("id AS k", "CAST(id AS BIGINT) AS x")
    empty_mistyped = (
        "SELECT v AS k, CAST(v AS DOUBLE) AS x "
        "FROM (VALUES (0),(1),(2)) t(v) WHERE v < 0"
    )
    with pytest.raises(AssertionError, match="row count"):
        compare(df, oracle, empty_mistyped, name="empty_side")
