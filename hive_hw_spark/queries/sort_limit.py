"""B-F Sort / limit / top-k (SURVEY.md §2 Q50–Q52).

Scale notes: Q51's global top-k is orderBy().limit(k) — Spark plans this
as TakeOrderedAndProject: each partition keeps its local top-k and only k
rows per partition reach the driver-side merge, no global sort. Q52's
top-k per group is the window + rank≤k filter — one shuffle on the group
key; at 100 TB this beats a self-join-based top-k by orders of magnitude.
Q50 is a genuine global sort (range partitioned), which is what the
contract asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_hw_spark.catalog import load_table
from hive_hw_spark.queries import register


@register(
    "q50",
    oracle="""
    SELECT event_id, nullif(value, 0) AS v
    FROM events
    ORDER BY v ASC NULLS LAST, event_id
    """,
    doc="Multi-key sort with NULLS LAST over the sentinel→NULL column "
    "(A24): missing readings sort after every real value.",
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", F.nullif(F.col("value"), F.lit(0)).alias("v"))
        .orderBy(F.col("v").asc_nulls_last(), F.col("event_id"))
    )


@register(
    "q51",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="Global top-k (TakeOrderedAndProject — per-partition local top-k, "
    "no global sort), deterministic tie-break on orderkey.",
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q52",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
    doc="Top-3 orders per customer: window rank + filter — single shuffle "
    "on the group key, the scalable per-group top-k pattern.",
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("o_custkey", F.col("o_totalprice").desc(), "o_orderkey")
    )


@register(
    "q53",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice AS price, p.p_size AS size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    ORDER BY p.p_partkey
    """,
    doc="2-D skyline / Pareto frontier (B-F extension; cf. 'Integration "
    "of Skyline Queries into Spark SQL', EDBT 2023): parts not dominated "
    "on (min price, max size). The naive formulation is an O(n^2) "
    "dominance anti-join (the DuckDB oracle); this implementation is the "
    "scalable sort-based rewrite - per-price-group max, one prefix-max "
    "window over price order, one join back: O(n log n), two shuffles, "
    "no pair expansion. A point is dominated iff a strictly cheaper "
    "group reaches its size, or its own price group exceeds it. The "
    "prefix-max is computed DISTRIBUTED even over the distinct-price "
    "domain: q45's percentile-bucket two-phase pattern — within-bucket "
    "prefix max (window partitioned by a pure-function-of-price bucket) "
    "plus a strictly-earlier-bucket carry-in from the tiny per-bucket "
    "summary — so no unbounded global window exists even if the "
    "measure's distinct domain is fact-sized.",
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").alias("size"),
    )
    grp = p.groupBy("price").agg(F.max("size").alias("grp_max"))
    # bucket bounds: exact percentiles of a deterministic hash sample —
    # bucket is a pure function of price, so every plan branch agrees
    # (q45's rationale; repartitionByRange boundaries are not
    # replay-stable). Empty sample → bkt 0 everywhere → one bucket,
    # which degrades to the single-window case, still correct.
    qs = ", ".join(str(round((i + 1) / 8, 6)) for i in range(7))
    bounds = (
        p.filter(F.pmod(F.xxhash64("p_partkey"), F.lit(100)) < 10)
        .agg(F.expr(f"percentile(price, array({qs}))").alias("bs"))
    )
    loc = (
        grp.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bkt",
            F.expr("size(filter(coalesce(bs, array()), x -> x < price))"),
        )
        .drop("bs")
    )
    # within-bucket prefix max over strictly-lower prices (prices are
    # unique rows here, so ROWS ... -1 == strictly lower)
    wb = (
        Window.partitionBy("bkt")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # loc feeds the carry-in summary AND the prefix-max join — without
    # materialization the group fold + bucket window re-ran for each
    # (5 part scans in the plan probe).
    loc = _managed_persist(
        "q53_loc", loc.withColumn("local_prefix", F.max("grp_max").over(wb))
    )
    # carry-in: max over all strictly earlier buckets (per-bucket summary
    # is <= 8 rows; non-foldable constant partition key, q45's idiom)
    wall = (
        Window.partitionBy(F.pmod(F.col("bkt"), F.lit(1)))
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        loc.groupBy("bkt")
        .agg(F.max("grp_max").alias("bmax"))
        .withColumn("carry", F.max("bmax").over(wall))
        .select("bkt", "carry")
    )
    grp2 = loc.join(F.broadcast(carry), "bkt").withColumn(
        "prefix_max",
        F.greatest(
            F.coalesce(F.col("local_prefix"), F.lit(-1)),
            F.coalesce(F.col("carry"), F.lit(-1)),
        ),
    )
    return (
        p.join(grp2, "price")
        .filter(
            ~(
                (F.coalesce(F.col("prefix_max"), F.lit(-1)) >= F.col("size"))
                | (F.col("grp_max") > F.col("size"))
            )
        )
        .select("p_partkey", "price", "size")
        .orderBy("p_partkey")
    )


@register(
    "q187",
    oracle="""
    WITH anchor AS (
      SELECT o_totalprice AS ap, o_orderkey AS ak
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 1 OFFSET 39
    )
    SELECT o_orderkey, o_totalprice
    FROM orders, anchor
    WHERE o_totalprice < ap
       OR (o_totalprice = ap AND o_orderkey > ak)
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="Keyset (seek) pagination — page 3 of the price-ranked order "
    "list WITHOUT OFFSET (the deep-pagination discipline: OFFSET n "
    "scans and sorts n rows to throw them away, so page depth costs "
    "grow linearly and a 100 TB 'page 10000' is a cluster-sized "
    "sort; the keyset form seeks PAST the last row of the previous "
    "page with a composite (price, key) predicate, so every page "
    "costs one pushed-down filter + TakeOrderedAndProject top-20, "
    "independent of depth). The anchor (last row of page 2) arrives "
    "via a broadcast 1-row frame here so the whole query is "
    "self-contained; a real pager passes it as literals, which "
    "reach the parquet scan as PushedFilters. Strict total order on "
    "(price DESC, unique orderkey) makes pages gap- and overlap-"
    "free under ties.",
)
def q187(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    anchor = (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(40)
        .orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").desc())
        .limit(1)
        .select(
            F.col("o_totalprice").alias("ap"), F.col("o_orderkey").alias("ak")
        )
    )
    return (
        orders.crossJoin(F.broadcast(anchor))
        .where(
            (F.col("o_totalprice") < F.col("ap"))
            | (
                (F.col("o_totalprice") == F.col("ap"))
                & (F.col("o_orderkey") > F.col("ak"))
            )
        )
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )
