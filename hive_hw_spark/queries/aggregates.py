"""B-D Aggregations (SURVEY.md §2 Q30–Q39).

Grounding: the reference's per-node sample averaging (slave.ino:141) and
master-side fan-in gather (master.ino:151-169) are the partial/final
aggregation pattern; everything else generalizes it to the OLAP surface.

Scale notes: all of these are hash aggregations with map-side partial
combine — the shuffle carries one row per (group × partition), not per
input row. ``count(distinct)`` expands then de-dups (two shuffles via
expand); at 100 TB prefer ``approx_count_distinct`` (Q32) unless exactness
is contractual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_hw_spark.catalog import load_table
from hive_hw_spark.queries import register
from hive_hw_spark.queries._util import davg, dsum, sql_davg, sql_dsum


@register(
    "q30",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped hash aggregate (partial+final combine).",
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
