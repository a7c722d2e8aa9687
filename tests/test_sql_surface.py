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


def test_q280_sql_scripting_control_flow(spark, sf_dir):
    """Q280: Spark 4 SQL scripting (BEGIN/DECLARE/WHILE/IF) — the
    procedural surface that replaces driver-side glue for multi-step
    SQL jobs. A script with local variables, a WHILE loop and a
    conditional computes the same result the declarative spelling
    does; the final SELECT is the script's result set."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    register_tables(spark, sf_dir)
    got = spark.sql(
        """
        BEGIN
          DECLARE n_priorities INT DEFAULT 0;
          DECLARE label STRING DEFAULT 'small';
          SET n_priorities = (SELECT COUNT(DISTINCT o_orderpriority)
                              FROM orders);
          IF n_priorities >= 3 THEN
            SET label = 'large';
          END IF;
          SELECT n_priorities AS n, label;
        END
        """
    ).collect()
    expect = spark.sql(
        "SELECT COUNT(DISTINCT o_orderpriority) AS n FROM orders"
    ).collect()[0].n
    assert got[0].n == expect
    assert got[0].label == ("large" if expect >= 3 else "small")
    # loop semantics: gauss sum via WHILE
    r = spark.sql(
        """
        BEGIN
          DECLARE total INT DEFAULT 0;
          DECLARE i INT DEFAULT 0;
          WHILE i < 10 DO
            SET total = total + i;
            SET i = i + 1;
          END WHILE;
          SELECT total AS t;
        END
        """
    ).collect()
    assert r[0].t == 45


def test_q281_parameterized_sql_and_identifier(spark, sf_dir):
    """Q281: parameterized SQL (named markers, injection-safe literals)
    + the IDENTIFIER() clause (safe dynamic table/column names) — the
    Spark 4 templating surface that replaces f-string SQL assembly.
    Parameters must bind as VALUES (a quote in a string parameter is
    data, not syntax); IDENTIFIER must resolve a name from a
    parameter."""
    register_tables(spark, sf_dir)
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM orders "
        "WHERE o_orderpriority = :prio AND o_totalprice > :floor",
        args={"prio": "1-URGENT", "floor": 1000.0},
    ).collect()[0].n
    expect = spark.sql(
        "SELECT COUNT(*) AS n FROM orders "
        "WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 1000.0"
    ).collect()[0].n
    assert got == expect and got > 0
    # a malicious string binds as a harmless literal
    inj = spark.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_orderpriority = :prio",
        args={"prio": "x' OR '1'='1"},
    ).collect()[0].n
    assert inj == 0
    # IDENTIFIER: table name arrives as a parameter, not via string paste
    for t, key in (("orders", "o_orderkey"), ("customer", "c_custkey")):
        n = spark.sql(
            "SELECT COUNT(IDENTIFIER(:k)) AS n FROM IDENTIFIER(:t)",
            args={"t": t, "k": key},
        ).collect()[0].n
        assert n == spark.table(t).count()


def test_q327_tablesample_repeatable(spark, sf_dir):
    """Q327: TABLESAMPLE surface — REPEATABLE seeding is deterministic
    (same seed -> identical row set, different seed -> different draw is
    overwhelmingly likely), the sampled fraction lands near the request,
    and BUCKET x OUT OF y sampling parses and bounds the draw.  Sampling
    is engine-native Bernoulli (no oracle: DuckDB's sampler is a
    different RNG by design — the contract is Spark-internal
    determinism, which is what reproducible pipelines rely on)."""
    import os

    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).createOrReplaceTempView(
        "q327_events"
    )
    a = spark.sql(
        "SELECT event_id FROM q327_events TABLESAMPLE (10 PERCENT) REPEATABLE (42)"
    )
    b = spark.sql(
        "SELECT event_id FROM q327_events TABLESAMPLE (10 PERCENT) REPEATABLE (42)"
    )
    ids_a = sorted(r.event_id for r in a.collect())
    ids_b = sorted(r.event_id for r in b.collect())
    assert ids_a == ids_b, "same REPEATABLE seed must reproduce the draw"

    c = spark.sql(
        "SELECT event_id FROM q327_events TABLESAMPLE (10 PERCENT) REPEATABLE (7)"
    )
    ids_c = sorted(r.event_id for r in c.collect())
    assert ids_a != ids_c, "different seed should change the draw"

    n = spark.table("q327_events").count()
    assert 0.05 * n < len(ids_a) < 0.15 * n, "Bernoulli fraction far off"

    bucket = spark.sql(
        "SELECT COUNT(*) AS c FROM q327_events TABLESAMPLE (BUCKET 1 OUT OF 10)"
    ).collect()[0].c
    assert 0 < bucket < n

    # DataFrame API twin — fraction/seed must be KWARGS: positional
    # sample(0.1, seed=42) binds 0.1 to the withReplacement overload slot
    # and the seed is silently dropped (probed: two runs differ), the
    # q275 wholetext-option class of trap.
    d1 = spark.table("q327_events").sample(fraction=0.1, seed=42).count()
    d2 = spark.table("q327_events").sample(fraction=0.1, seed=42).count()
    assert d1 == d2
