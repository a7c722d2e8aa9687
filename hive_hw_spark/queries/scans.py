"""B-A Scans / sources (SURVEY.md §2 Q01–Q06).

Grounding: the reference's sources are sensor/radio scans (A1–A6,
slave.ino:141, master.ino:234-257); here the engine-side equivalents are
columnar parquet scans with pushdown. Q03–Q05 (format round-trips,
partitioned writes) are unit-tested in tests/test_sources.py; the
oracle-checkable scans live here.

Scale notes: Q02's projection reaches the parquet reader as ReadSchema
(column pruning) — at 100 TB that is the difference between reading 3
columns and reading 11. Verified by a plan assertion in
tests/test_plan_shapes.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_hw_spark.catalog import load_table
from hive_hw_spark.queries import register


@register(
    "q01",
    oracle="SELECT COUNT(*) AS n FROM lineitem",
    doc="Full parquet scan count (metadata-only count via parquet footers).",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q02",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    doc="Column-pruned scan: ReadSchema carries only 3 of 11 columns.",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "q06",
    oracle="SELECT * FROM region ORDER BY r_regionkey",
    doc="Catalog-registered table: saveAsTable persists region into the "
    "session catalog's warehouse and spark.table() reads it back — the "
    "Hive-metastore-compatible registration path (same saveAsTable call "
    "against an enableHiveSupport() session writes a real metastore "
    "entry). Not a temp view.",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.catalog import save_as_catalog_table

    name = save_as_catalog_table(spark, sf_dir, "region")
    return spark.table(name).orderBy("r_regionkey")
