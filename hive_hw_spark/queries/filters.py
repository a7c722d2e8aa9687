"""B-B Projection / filter / predicates (SURVEY.md §2 Q10–Q15).

Grounding: the reference's linear calibration transform (A11,
slave.ino:22,141), command dispatch (A20, gateway.ino:69-75), budget
predicates (A28, master.ino:33), and — critically — the sentinel-zero
missing-value convention (A24, master.ino:162): ``0.0`` means "no reading",
so ingestion maps it to real NULL via ``nullif`` before any aggregate
touches it.

Scale notes: every predicate here compiles to a parquet row-group filter
(PushedFilters) — verified in tests/test_plan_shapes.py. No shuffles in
this family at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_hw_spark.catalog import load_table
from hive_hw_spark.queries import register


@register(
    "q10",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    doc="Projection + per-row arithmetic (IEEE-deterministic, no rounding needed).",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q11",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE o_orderstatus IN ('F', 'O') ORDER BY o_orderkey
    """,
    doc="IN-list filter (pushed to parquet).",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("F", "O"))
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


@register(
    "q12",
    oracle="""
    SELECT event_id FROM events
    WHERE value BETWEEN 50 AND 100 ORDER BY event_id
    """,
    doc="Range/BETWEEN predicate (A28 budget-predicate analog).",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").between(50, 100))
        .select("event_id")
        .orderBy("event_id")
    )


@register(
    "q13",
    oracle="""
    SELECT p_partkey FROM part
    WHERE p_name LIKE '%ol%' ORDER BY p_partkey
    """,
    doc="LIKE / substring-search predicate (A22 strstr analog). Pattern "
    "'%ol%' matches real corpus rows ('bolt', …) so the oracle row is "
    "non-vacuous at sf0.01.",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%ol%"))
        .select("p_partkey")
        .orderBy("p_partkey")
    )


@register(
    "q14",
    oracle="""
    SELECT event_id FROM events
    WHERE (event_type = 'error' OR value > 150) AND NOT user_id = 13
    ORDER BY event_id
    """,
    doc="Boolean combination with NOT (A25 flag-logic analog).",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            ((F.col("event_type") == "error") | (F.col("value") > 150))
            & ~(F.col("user_id") == 13)
        )
        .select("event_id")
        .orderBy("event_id")
    )


@register(
    "q15",
    oracle="""
    SELECT event_id, coalesce(nullif(value, 0), -1) AS v
    FROM events ORDER BY event_id
    """,
    doc="Sentinel-zero → NULL ingestion rule (A24, master.ino:162): the "
    "reference cannot distinguish a true 0.0 reading from 'missing'; the "
    "engine maps the sentinel to NULL at ingest so aggregates stay honest.",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.nullif(F.col("value"), F.lit(0)), F.lit(-1.0)).alias("v"),
    ).orderBy("event_id")


@register(
    "q48",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(30,10)) * (SELECT COUNT(*) FROM orders)
          > 1.5 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(30,10))) FROM orders)
    ORDER BY o_orderkey
    """,
    doc="Scalar subquery (B-B extension): orders above 1.5x the global "
    "average price. The subqueries compute once (tiny aggregates) and "
    "broadcast as literals into the scan filter - no per-row "
    "re-evaluation at any scale. The comparison is cross-multiplied in "
    "exact DECIMAL (price*n > 1.5*sum) so membership near the boundary "
    "never depends on float summation order in either engine; 1.5x (not "
    "2x) keeps the oracle row non-vacuous on this corpus.",
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("hive_hw_q48_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM hive_hw_q48_orders
        WHERE CAST(o_totalprice AS DECIMAL(30,10))
              * (SELECT COUNT(*) FROM hive_hw_q48_orders)
              > 1.5 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                       FROM hive_hw_q48_orders)
        ORDER BY o_orderkey
        """
    )


@register(
    "q49",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 200000)
    ORDER BY c_custkey
    """,
    doc="Correlated EXISTS via SQL text (B-B extension): Catalyst "
    "decorrelates the subquery into a left-semi join (SURVEY 4.2) - "
    "verified in tests/test_plan_shapes.py - so the correlated predicate "
    "never executes per outer row.",
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "hive_hw_q49_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "hive_hw_q49_orders"
    )
    return spark.sql(
        """
        SELECT c_custkey FROM hive_hw_q49_customer c
        WHERE EXISTS (SELECT 1 FROM hive_hw_q49_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)
        ORDER BY c_custkey
        """
    )


@register(
    "q144",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    WHERE CAST(l.l_quantity * 5 * (SELECT COUNT(*) FROM lineitem l2
                                   WHERE l2.l_partkey = l.l_partkey)
               AS DECIMAL(30,10))
          < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(30,10)))
             FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    ORDER BY n_small
    """,
    doc="TPC-H Q17 shape — small-quantity-order revenue: lines whose "
    "quantity is below 1/5 of their part's average quantity (the "
    "correlated AVG-subquery classic). The oracle keeps the textbook "
    "correlated form; the engine plans the decorrelated rewrite: one "
    "partial+final (count, decimal-sum) agg per part, joined back to "
    "the fact ON THE SAME KEY — agg shuffle and join shuffle both "
    "hash on l_partkey, co-partitioned under AQE, no second fact "
    "scan shuffle. Float discipline: q < sum/(5n) is evaluated as the "
    "cross-multiplied 5·q·n < Σq with the sum kept in exact DECIMAL "
    "and the product cast to it (q48's threshold idiom) — no decimal "
    "division, whose rounding scale differs between engines. The "
    "5·q·n product is integer-valued and far inside double's exact "
    "range at any corpus size.",
)
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(30,10)"
    stats = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("l_quantity").cast(dec)).alias("psum"),
    )
    return (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(stats, "l_partkey")
        .filter(
            (F.col("l_quantity") * 5 * F.col("pn")).cast(dec)
            < F.col("psum")
        )
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.sum(F.col("l_extendedprice").cast(dec))
            .cast("double")
            .alias("revenue"),
        )
    )
