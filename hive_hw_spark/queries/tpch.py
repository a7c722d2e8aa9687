"""TPC-H shape completion (SURVEY.md §2 Part B wave 16).

The classic decision-support shapes not yet in the registry: Q7 volume
shipping, Q8 market share, Q10 returned items, Q13 customer distribution,
Q14 promo effect, Q15 top supplier, Q18 large-volume customers, Q19
disjunctive-predicate revenue. Together with the existing
Q1/Q2/Q3/Q4/Q5/Q9/Q16/Q17/Q21/Q22 shapes (q30, q138, q151, q172, q152,
q153, q176, q144, q134, q177) this closes the TPC-H analytic surface a
reference user would expect to run unchanged (reference analog: the
master's hourly fan-in report family, master.ino:151-169,552-599 — these
are its corpus-scale generalizations).

Scale discipline shared by the wave: KB-sized dims (region, nation,
supplier) always broadcast; part broadcasts after its selective filter;
the only real shuffles are fact⋈fact on keys both sides already share
(orderkey / custkey); every revenue aggregate uses the exact DECIMAL
accumulator (_util.dsum) so partial/final combine order never moves a
bit; every oracle ends in a total ORDER BY on a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_hw_spark.catalog import load_table

from . import plan_cache, register
from ._util import dsum, dsum4, sql_dsum, sql_dsum4


@register(
    "q192",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           {rev} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """.format(rev=sql_dsum("l_extendedprice * (1 - l_discount)")),
    doc="TPC-H Q7 shape — volume shipping between two nations by ship "
    "year (the bilateral-trade report). Scale shape: nation (25 rows) "
    "and supplier (100s) broadcast; the two-nation filter prunes BOTH "
    "fact sides before any shuffle (suppliers via the broadcast join, "
    "customers via theirs — each side keeps ~2/25 of its rows), so the "
    "orders⋈customer (custkey) and lineitem⋈orders (orderkey) shuffles "
    "move only the surviving slice. The cross-pair residual "
    "(supp≠cust within the 2-nation set) rides the joined rows — no "
    "extra shuffle. Exact DECIMAL revenue; 3-key group is its own "
    "total order.",
)
@plan_cache
def q192(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q193",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           ROUND(
             CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_3'
                           THEN l_extendedprice * (1 - l_discount)
                           ELSE 0 END AS DECIMAL(30,10))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(30,10))) AS DOUBLE),
             4) AS mkt_share
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n2.n_regionkey = 1
      AND p_type = 'PROMO'
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape — NATION_3's market share of the AMERICA-region "
    "PROMO-part market per order year (conditional-share agg over a "
    "snowflake join). Scale shape: part's selective type filter prunes "
    "1/6 of the dim BEFORE broadcast; supplier⋈nation pre-joins to a "
    "100-row broadcast carrying supp_nation; the customer region "
    "filter prunes the custkey shuffle to 1/5. Share = exact-DECIMAL "
    "numerator / exact-DECIMAL denominator, divided as ONE IEEE "
    "double op then round(4) — bit-stable in both engines (the "
    "ratio-of-sums discipline, CLAUDE.md float rule).",
)
@plan_cache
def q193(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_am = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.where(F.col("n_regionkey") == 1)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").join(
        cust_am, F.col("o_custkey") == F.col("c_custkey")
    )
    part_promo = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "PROMO"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part_promo.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        F.lit(0).cast("decimal(30,10)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q194",
    oracle="""
    SELECT c_custkey, c_name,
           {rev} AS revenue,
           c_acctbal, n_name
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """.format(rev=sql_dsum("l_extendedprice * (1 - l_discount)")),
    doc="TPC-H Q10 shape — top-20 customers by returned-item revenue in "
    "one quarter (the churn-risk report). Scale shape: the quarter "
    "filter prunes orders at the scan (parquet min/max skips ~24/27 "
    "of the files on a date-sorted layout, q159), the returnflag "
    "filter prunes lineitem the same way; the two surviving slices "
    "shuffle on orderkey, the result on custkey; nation broadcasts. "
    "Top-20 is TakeOrderedAndProject — per-partition heaps, 20 rows "
    "per task to the driver, never a global sort. Unique-custkey "
    "tie-break makes the LIMIT deterministic.",
)
@plan_cache
def q194(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q195",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape — distribution of customers by order count, "
    "zero-order customers included (the engagement histogram). Scale "
    "shape: orders is pre-aggregated to one (custkey, count) row per "
    "customer BEFORE touching the customer table, so the left join "
    "probes an input already reduced ~10×; the priority exclusion "
    "rides the pre-agg as a scan filter (it must live in the join/"
    "pre-agg, not a WHERE after the left join, or zero-order "
    "customers vanish — the classic Q13 trap). The second agg's "
    "input is one row per customer; its shuffle is trivial. "
    "(custdist, c_count) is a total order because c_count is the "
    "group key.",
)
@plan_cache
def q195(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        cust.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count")
        )
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q196",
    oracle="""
    SELECT ROUND(
             100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                           THEN l_extendedprice * (1 - l_discount)
                           ELSE 0 END AS DECIMAL(30,10))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(30,10))) AS DOUBLE),
             4) AS promo_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-06-01'
      AND l_shipdate <  TIMESTAMP '1996-07-01'
    ORDER BY promo_revenue
    """,
    doc="TPC-H Q14 shape — PROMO parts' share of one month's revenue "
    "(the campaign-effect metric). Scale shape: the month filter "
    "prunes lineitem at the scan; part broadcasts (the ONLY join) and "
    "contributes one boolean per probe; the whole query is one "
    "map-side-combinable agg — a single shuffle of one partial row "
    "per task. Ratio-of-exact-DECIMAL-sums divided as one double op, "
    "round(4) (q193's discipline).",
)
@plan_cache
def q196(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-06-01")
        & (F.col("l_shipdate") < "1996-07-01")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,10)"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol).otherwise(
                        F.lit(0).cast("decimal(30,10)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("promo_revenue")
    )


@register(
    "q197",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {rev} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """.format(rev=sql_dsum("l_extendedprice * (1 - l_discount)")),
    doc="TPC-H Q15 shape — the top supplier(s) by one quarter's revenue "
    "(the view + scalar-MAX-subquery classic). Scale shape: the "
    "quarter filter prunes at the scan; per-supplier revenue is one "
    "map-side-combinable agg (|suppliers| rows out); the MAX is an "
    "agg over THAT tiny frame, broadcast back as a 1-row cross join — "
    "the revenue subtree is computed once and persisted, not once "
    "per consumer (CLAUDE.md multi-branch rule: two plan branches "
    "over one frame re-run its subtree without an explicit persist). "
    "Equality on exact-DECIMAL-derived doubles is bit-stable in both "
    "engines, so ties (all max-revenue suppliers) surface "
    "identically.",
)
def q197(spark: SparkSession, sf_dir: str) -> DataFrame:
    revenue = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    from pyspark import StorageLevel

    revenue = revenue.persist(StorageLevel.MEMORY_AND_DISK)
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(revenue.crossJoin(F.broadcast(top)).where(
                F.col("total_revenue") == F.col("max_revenue")
            )),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q198",
    oracle="""
    WITH big AS (
      SELECT l_orderkey AS k,
             {qty} AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum_qty > 300
    )
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = k
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey
    """.format(qty=sql_dsum("l_quantity")),
    doc="TPC-H Q18 shape — large-volume orders (sum of line quantities "
    "over 300) with their customers. Scale shape: the quantity rollup "
    "is one map-side-combinable agg on the key lineitem already "
    "shares with orders; the HAVING survivor set is tiny (46 of 15k "
    "orders at sf0.01) and BROADCASTS into orders and then customer — "
    "the classic agg-then-broadcast-semi pattern that replaces "
    "TPC-H's IN (GROUP BY … HAVING) subquery without shuffling either "
    "fact a second time. Quantity sums use the exact accumulator so "
    "the >300 cut is bit-stable. Unique orderkey = total order.",
)
@plan_cache
def q198(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(dsum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("k"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy("o_orderkey")
    )


@register(
    "q199",
    oracle="""
    SELECT {rev} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    ORDER BY revenue
    """.format(rev=sql_dsum("l_extendedprice * (1 - l_discount)")),
    doc="TPC-H Q19 shape — revenue under an OR-of-ANDs predicate (three "
    "brand/size/quantity conjunction branches; the disjunctive-"
    "pushdown stress test). Scale shape: the disjunction's convex "
    "hull on the FACT side (l_quantity BETWEEN 1 AND 30) is factored "
    "out explicitly and reaches the parquet scan as a pushable "
    "min/max filter — the branch-local bounds alone are join-side "
    "residuals Catalyst cannot push; part broadcasts with its own "
    "hull (p_size <= 35) prefiltered; the full disjunction evaluates "
    "as the broadcast join's residual inside whole-stage codegen. "
    "One agg row out — shuffle is one partial per task.",
)
@plan_cache
def q199(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").between(1, 30)
    )
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size").between(1, 35))
        .select("p_partkey", "p_brand", "p_size")
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(
            F.broadcast(part),
            (F.col("l_partkey") == F.col("p_partkey")) & branch,
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("revenue")
    )


@register(
    "q213",
    oracle="""
    SELECT {rev} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    ORDER BY revenue
    """.format(rev=sql_dsum("l_extendedprice * l_discount")),
    doc="TPC-H Q6 shape — the forecast-revenue-change scan: pure "
    "predicate + aggregate, zero joins. This is the PUSHDOWN "
    "microbenchmark of the suite: all three filters are scan-level "
    "parquet predicates (shipdate range prunes row groups on a "
    "date-sorted layout, q159; discount/quantity prune via min/max "
    "stats), the projection reads exactly 4 of 11 columns, and the "
    "whole query is one map-side-combinable agg emitting one partial "
    "row per task. On 100 TB this query's cost IS its scan "
    "efficiency — any engine overhead beyond the I/O shows "
    "immediately. Exact DECIMAL revenue.",
)
@plan_cache
def q213(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return (
        li.agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("revenue")
    )


@register(
    "q249",
    oracle="""
    WITH ps AS (
      SELECT l_partkey,
             {val} AS v
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey = 0
      GROUP BY l_partkey
    ),
    tot AS (
      SELECT CAST(SUM(CAST(v AS DECIMAL(30,4))) AS DOUBLE) AS t FROM ps
    )
    SELECT l_partkey, v
    FROM ps CROSS JOIN tot
    WHERE v > t * 0.002
    ORDER BY v DESC, l_partkey
    """.format(val=sql_dsum4("l_extendedprice * l_quantity")),
    doc="TPC-H Q11 shape — 'important stock': parts whose shipped-value "
    "from one nation's suppliers exceeds a FRACTION of that nation's "
    "total (the group-vs-global-share HAVING pattern; this schema has "
    "no partsupp, so shipped value = extendedprice × quantity stands "
    "in for availqty × supplycost, preserving the plan shape "
    "exactly). Scale shape: the nation filter rides the 100-row "
    "broadcast supplier join; per-part values are ONE "
    "map-side-combinable agg; the global total re-aggregates THAT "
    "tiny frame (never a second fact scan) and broadcasts back as a "
    "1-row cross join; the fraction compare is one IEEE multiply on "
    "exact-DECIMAL-derived doubles. The per-part frame is persisted "
    "for its two consumers (total + filter — CLAUDE.md multi-branch "
    "rule). Total order: value desc, unique partkey.",
)
def q249(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    sup0 = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") == 0)
        .select("s_suppkey")
    )
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(sup0), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            dsum4(F.col("l_extendedprice") * F.col("l_quantity")).alias(
                "v"
            )
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = ps.agg(dsum4("v").alias("t"))
    return (
        ps.crossJoin(F.broadcast(tot))
        .where(F.col("v") > F.col("t") * 0.002)
        .select("l_partkey", "v")
        .orderBy(F.col("v").desc(), "l_partkey")
    )


@register(
    "q250",
    oracle="""
    SELECT l_returnflag AS shipmode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('A', 'R')
      AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY shipmode
    ORDER BY shipmode
    """,
    doc="TPC-H Q12 shape — shipping-mode service audit: for each mode, "
    "how many critical vs non-critical orders shipped LATE (this "
    "schema has no l_shipmode/l_commitdate/l_receiptdate, so the mode "
    "is l_returnflag restricted to two values and 'late' is shipped "
    ">=30 days after o_orderdate — same join + cross-table date "
    "predicate + two conditional counts signature). Scale shape: the "
    "mode/date filters push into the lineitem scan, orders is "
    "projected to 3 columns before its one orderkey shuffle, the "
    "cross-table date predicate rides the joined row (no extra pass), "
    "and the final 2-group conditional agg is map-side combinable. "
    "Reference analog: master.ino:552-599 per-class fan-in counters.",
)
@plan_cache
def q250(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            F.col("l_returnflag").isin("A", "R")
            & (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .select("l_orderkey", "l_returnflag", "l_shipdate")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .groupBy(F.col("l_returnflag").alias("shipmode"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("shipmode")
    )


@register(
    "q251",
    oracle="""
    SELECT s_name FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
        SELECT f.l_suppkey FROM (
          SELECT l_suppkey, l_partkey,
                 SUM(CAST(l_quantity AS DECIMAL(30,10))) AS qty
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'small%')
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey, l_partkey) f
        WHERE 2 * f.qty > (
          SELECT SUM(CAST(l2.l_quantity AS DECIMAL(30,10)))
          FROM lineitem l2
          WHERE l2.l_partkey = f.l_partkey
            AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
            AND l2.l_shipdate <  TIMESTAMP '1998-01-01'))
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape — dominant suppliers of a part family in one "
    "region: suppliers who shipped the MAJORITY of a 'small%' part's "
    "1997 volume (this schema has no partsupp, so the supplier-part "
    "link and the availqty>half-demand correlated threshold both "
    "derive from lineitem — same nested-IN + correlated scalar-SUM "
    "signature). The oracle keeps the textbook correlated form; the "
    "engine plans the decorrelated rewrite a 100 TB optimizer wants: "
    "the part filter broadcasts into the scan, ONE partial+final "
    "decimal agg builds per-(supplier,part) volumes, per-part totals "
    "re-aggregate THAT small frame (exact decimal partials are "
    "associative, so re-agg == direct sum bit-for-bit — no second "
    "fact-table pass, unlike the correlated subquery's letter), and "
    "the threshold compare stays in exact DECIMAL (2*qty > total, "
    "never 0.5*float). The pair frame feeds two branches (totals + "
    "the compare join) so it is persisted, not recomputed. Supplier "
    "dim + nation/region broadcast; unique s_name is the total order.",
)
@plan_cache
def q251(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from ._util import DEC

    parts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    flt = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = flt.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    cand = (
        flt.join(tot, "l_partkey")
        .where(F.col("qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nat = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").where(
                    F.col("r_name") == "EUROPE"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(cand), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name")
        .orderBy("s_name")
    )
