"""B-G Set operations (SURVEY.md §2 Q55–Q57).

Scale notes: UNION ALL is a zero-shuffle concatenation; DISTINCT /
INTERSECT / EXCEPT each shuffle once on the full row as key. At 100 TB,
INTERSECT/EXCEPT over low-cardinality key columns (nationkeys here) should
be pre-aggregated (distinct per side first) so the shuffle carries
distinct keys, not raw rows — the queries below operate on key projections
so Catalyst's aggregate pushdown keeps the exchanged data minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_hw_spark.catalog import load_table
from hive_hw_spark.queries import register


@register(
    "q55",
    oracle="""
    WITH u AS (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey FROM supplier
    )
    SELECT 'all' AS variant, nationkey, COUNT(*) AS n
    FROM u GROUP BY nationkey
    UNION ALL
    SELECT 'distinct' AS variant, nationkey, 1 AS n
    FROM (SELECT DISTINCT nationkey FROM u)
    ORDER BY variant, nationkey
    """,
    doc="UNION ALL (bag) vs UNION DISTINCT (set) of customer∪supplier "
    "nationkeys, both variants in one result.",
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    u = c.unionAll(s)
    bag = (
        u.groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("all").alias("variant"), "nationkey", "n")
    )
    dset = u.distinct().select(
        F.lit("distinct").alias("variant"),
        "nationkey",
        F.lit(1).cast("long").alias("n"),
    )
    return bag.unionAll(dset).orderBy("variant", "nationkey")


@register(
    "q56",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    ORDER BY nationkey
    """,
    doc="INTERSECT (distinct semantics): nationkeys present on both sides.",
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s).orderBy("nationkey")


@register(
    "q57",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
    ORDER BY nationkey
    """,
    doc="EXCEPT (distinct semantics): nations with a high-balance customer "
    "but no high-balance supplier. The reference's 'nodes that never "
    "reported' set (A24/A28) as a set op. The balance filters make the "
    "difference non-empty on this corpus (every nation has both customers "
    "and suppliers, so the unfiltered difference is vacuous).",
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s).orderBy("nationkey")
