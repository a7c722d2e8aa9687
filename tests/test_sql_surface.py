"""The engine is the full Spark SQL surface over the registered catalog —
ad-hoc multi-feature SQL (CTEs, window + join + agg combos, subqueries)
agrees with DuckDB on the same views, beyond the canned registry queries.
"""

from __future__ import annotations

import pytest

from hive_hw_spark.catalog import register_tables
from tests.oracle_harness import compare

ADHOC = {
    "cte_window_join": """
        WITH cust_orders AS (
          SELECT c_custkey, c_name, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY c_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM customer JOIN orders ON o_custkey = c_custkey
        )
        SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM cust_orders WHERE rn = 1
        ORDER BY c_custkey
    """,
    "agg_over_join_with_having": """
        SELECT n_name, COUNT(DISTINCT c_custkey) AS n_cust
        FROM nation
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey = c_custkey
        GROUP BY n_name
        HAVING COUNT(*) >= 20
        ORDER BY n_name
    """,
    "in_subquery_plus_case": """
        SELECT event_id,
               CASE WHEN user_id IN (SELECT user_id FROM events
                                     WHERE event_type = 'error'
                                     GROUP BY user_id HAVING COUNT(*) > 25)
                    THEN 'noisy' ELSE 'quiet' END AS who
        FROM events
        ORDER BY event_id
    """,
    "union_cte_arith": """
        WITH prices AS (
          SELECT 'order' AS src, o_totalprice AS p FROM orders
          UNION ALL
          SELECT 'part' AS src, p_retailprice FROM part
        )
        SELECT src, COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(p AS DECIMAL(30,10))) AS DOUBLE), 2) AS total
        FROM prices GROUP BY src ORDER BY src
    """,
}


@pytest.mark.parametrize("name", sorted(ADHOC))
def test_adhoc_sql_parity(name, spark, sf_dir, oracle):
    register_tables(spark, sf_dir)
    got = spark.sql(ADHOC[name])
    compare(got, oracle, ADHOC[name], name=name)
