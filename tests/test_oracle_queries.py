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
