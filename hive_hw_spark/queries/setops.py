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
    # r14 dup-scan fix (v2 probe: customer and supplier each scanned
    # twice — bag and dset both re-read the union): the distinct key
    # set IS the bag's key set, so derive both variants from ONE
    # grouped fold.
    from hive_hw_spark.queries.llm_ops import _managed_persist

    counts = _managed_persist(
        "q55_counts",
        u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")),
    )
    bag = counts.select(F.lit("all").alias("variant"), "nationkey", "n")
    dset = counts.select(
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


@register(
    "q200",
    oracle="""
    WITH f AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
         o AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'),
         i AS (SELECT custkey FROM f INTERSECT ALL SELECT custkey FROM o),
         e AS (SELECT custkey FROM f EXCEPT ALL SELECT custkey FROM o)
    SELECT 'intersect_all' AS variant, custkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM i GROUP BY custkey
    UNION ALL
    SELECT 'except_all' AS variant, custkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM e GROUP BY custkey
    ORDER BY variant, custkey
    """,
    doc="INTERSECT ALL / EXCEPT ALL — the BAG-semantics set ops (B-G "
    "completion next to q55-q57's distinct forms): the multiset of "
    "custkeys with finished ('F') orders intersected with / minus the "
    "multiset with open ('O') orders. Multiplicity rules (min(a,b) "
    "for intersect, max(0, a-b) for except) are what distinct set ops "
    "silently lose — e.g. 'how many REPEAT finished-order customers "
    "also have that many open orders'. Scale shape: Spark plans both "
    "as a per-side count aggregate + join on the value (the Expand-"
    "free rewrite), so the shuffle carries one (key, count) row per "
    "distinct key and side — never the raw bags. The result is "
    "re-counted per key so the oracle compare is order-free.",
)
def q200(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    orders = load_table(spark, sf_dir, "orders")
    # Both bag set-ops consume both legs — each leg's scan re-ran
    # twice (4 orders scans in the plan probe).
    f = _managed_persist(
        "q200_f",
        orders.where(F.col("o_orderstatus") == "F").select(
            F.col("o_custkey").alias("custkey")
        ),
    )
    o = _managed_persist(
        "q200_o",
        orders.where(F.col("o_orderstatus") == "O").select(
            F.col("o_custkey").alias("custkey")
        ),
    )
    inter = (
        f.intersectAll(o)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("variant"), "custkey", "n")
    )
    exc = (
        f.exceptAll(o)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("variant"), "custkey", "n")
    )
    return inter.unionAll(exc).orderBy("variant", "custkey")


@register(
    "q201",
    oracle="""
    SELECT 'c' AS entity, c_custkey AS key, c_acctbal AS acctbal,
           CAST(NULL AS VARCHAR) AS name
    FROM customer
    UNION ALL
    SELECT 's' AS entity, s_suppkey AS key, CAST(NULL AS DOUBLE) AS acctbal,
           s_name AS name
    FROM supplier
    ORDER BY entity, key
    """,
    doc="Schema-evolving union — unionByName(allowMissingColumns=True) "
    "(B-G extension): customer rows carry acctbal but no name, "
    "supplier rows the reverse; the union aligns columns BY NAME and "
    "null-fills each side's missing column. This is the schema-drift "
    "staple of long-lived ingest pipelines (a field added in v2 must "
    "not break the union with v1 history); positional unionAll would "
    "silently cross-wire the columns instead. Zero-shuffle "
    "concatenation, same as UNION ALL.",
)
def q201(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("c").alias("entity"),
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("s").alias("entity"),
        F.col("s_suppkey").alias("key"),
        F.col("s_name").alias("name"),
    )
    return (
        c.unionByName(s, allowMissingColumns=True)
        .select("entity", "key", "acctbal", "name")
        .orderBy("entity", "key")
    )
