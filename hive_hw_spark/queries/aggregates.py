"""B-D Aggregations (SURVEY.md §2 Q30–Q39).

Grounding: the reference's per-node sample averaging (slave.ino:141) and
master-side fan-in gather (master.ino:151-169) are the partial/final
aggregation pattern; the ALL()-completeness reduction (A25,
master.ino:158-168) is Q36's filtered-agg + bool_and.

Scale notes: all hash aggregations with map-side partial combine — the
shuffle carries one row per (group × partition), not per input row.
``count(distinct)`` expands the plan (two shuffles); at 100 TB prefer
``approx_count_distinct`` (Q32, HLL sketch, one shuffle) unless exactness
is contractual. Float sums go through exact DECIMAL accumulators for
oracle parity AND for order-independence under AQE re-partitioning —
see queries/_util.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_hw_spark.catalog import load_table
from hive_hw_spark.queries import plan_cache, register
from hive_hw_spark.queries._util import (
    DEC,
    DECZ,
    davg,
    dec_ratio,
    dratio_round,
    dsum,
    dsum4,
    sql_davg,
    sql_dec_ratio,
    sql_dratio_round,
    sql_dsum,
    sql_dsum4,
    sql_units2,
    sql_units4,
    sql_usum4,
    units2,
    units4,
    usum4,
)


@register(
    "q30",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_usum4('l_quantity')} AS sum_qty,
           {sql_usum4('l_extendedprice')} AS sum_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped hash aggregate (partial+final combine). Money "
    "sums ride the usum4 fixed-point fast path (1e-4 integer units "
    "quantized at ingest — lossless, LONG sums in codegen, scale-0 "
    "casts correctly rounded both engines; r13).",
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            usum4("l_quantity").alias("sum_qty"),
            usum4("l_extendedprice").alias("sum_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q31",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Exact distinct count (expand + two-phase agg).",
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


@register(
    "q32",
    oracle=None,  # HLL sketch ≠ DuckDB's algorithm; unit test asserts ≤5% error
    doc="Approximate distinct count (HyperLogLog++): one shuffle instead of "
    "Q31's two — the 100 TB default.",
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"))
        .orderBy("event_type")
    )


@register(
    "q33",
    oracle="""
    SELECT r_name, n_name, GROUPING(r_name) AS g_r, GROUPING(n_name) AS g_n,
           COUNT(c_custkey) AS n
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY g_r, g_n, r_name, n_name
    """,
    doc="ROLLUP with GROUPING() indicator columns.",
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.grouping("r_name").cast("int").alias("g_r"),
            F.grouping("n_name").cast("int").alias("g_n"),
            F.count("c_custkey").alias("n"),
        )
        .select("r_name", "n_name", "g_r", "g_n", "n")
        .orderBy("g_r", "g_n", "r_name", "n_name")
    )


@register(
    "q34",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_s, GROUPING(o_orderpriority) AS g_p,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY g_s, g_p, o_orderstatus, o_orderpriority
    """,
    doc="CUBE / grouping sets.",
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_s"),
            F.grouping("o_orderpriority").cast("int").alias("g_p"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_s", "g_p", "n")
        .orderBy("g_s", "g_p", "o_orderstatus", "o_orderpriority")
    )


@register(
    "q35",
    oracle="""
    SELECT user_id, COUNT(*) AS n FROM events
    GROUP BY user_id HAVING COUNT(*) >= 10 ORDER BY user_id
    """,
    doc="HAVING (post-aggregation filter).",
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
        .orderBy("user_id")
    )


@register(
    "q36",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
           bool_and(value > 0) AS all_positive
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="Filtered aggregates + ALL()-completeness reduction (A25, "
    "master.ino:158-168): 'done iff every node reported' becomes bool_and.",
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
            F.bool_and(F.col("value") > 0).alias("all_positive"),
        )
        .orderBy("user_id")
    )


@register(
    "q37",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(event_type)), ',') AS types
    FROM events WHERE event_type IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
    doc="collect_list canonicalized (sorted, joined) — A33 gather: the "
    "master's per-round reading set as one record per node. NULLs are "
    "filtered explicitly on both sides: Spark collect_list drops them, "
    "DuckDB list() keeps them, so unfiltered parity is data-dependent.",
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("user_id")
        .agg(
            F.array_join(F.sort_array(F.collect_list("event_type")), ",").alias("types")
        )
        .orderBy("user_id")
    )


@register(
    "q38",
    oracle="""
    WITH s AS (
      SELECT l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(30,10))) AS qty
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(CAST(MIN(qty) AS DOUBLE), 2) AS min_qty,
           ROUND(CAST(MAX(qty) AS DOUBLE), 2) AS max_qty,
           ROUND(CAST(SUM(qty) AS DOUBLE), 2) AS sum_qty,
           ROUND(CAST(SUM(qty) / COUNT(*) AS DOUBLE), 4) AS avg_qty
    FROM s ORDER BY n_supp
    """,
    doc="Aggregate-of-aggregate: per-supplier exact-decimal quantity "
    "sums re-aggregated into corpus stats. This is the rows-checkable "
    "twin of the q38 plan assertion (tests/test_plan_shapes.py::"
    "test_q38_partial_final_agg): a high-cardinality inner group-by "
    "whose partial/final combine is load-bearing — a wrong map-side "
    "combine shifts every output value — followed by a single-row "
    "reduction, the slave-side pre-average / master-side gather split "
    "(A13, slave.ino:141, master.ino:151-169) as a checkable result "
    "rather than a plan grep.",
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries._util import DEC

    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("qty")
    )
    return (
        s.agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.round(F.min("qty").cast("double"), 2).alias("min_qty"),
            F.round(F.max("qty").cast("double"), 2).alias("max_qty"),
            F.round(F.sum("qty").cast("double"), 2).alias("sum_qty"),
            F.round(
                (F.sum("qty") / F.count(F.lit(1))).cast("double"), 4
            ).alias("avg_qty"),
        )
        .orderBy("n_supp")
    )


@register(
    "q39",
    oracle=f"""
    SELECT n_name, {sql_usum4('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
    doc="Multi-join + aggregate: revenue per nation (TPC-H Q5 shape). "
    "nation broadcasts; lineitem⋈orders is the big shuffle, co-locatable "
    "by bucketing both on orderkey at scale. Revenue rides the usum4 "
    "fixed-point fast path (1e-4 units at ingest — lossless for "
    "price*(1-disc), LONG sums in codegen; r13).",
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            usum4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy("n_name")
    )


@register(
    "q46",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="PIVOT (B-D extension): order counts by priority × status. The "
    "explicit value list keeps the plan a single pass (no "
    "distinct-values pre-query); missing cells coalesce to 0 to match "
    "SQL's FILTER counts.",
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    ).orderBy("o_orderpriority")


@register(
    "q47",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Exact percentiles (B-D extension): linear-interpolated p50/p90 "
    "per group — Spark percentile() ≡ DuckDB quantile_cont. Exact "
    "percentile sorts within each group; at 100 TB use "
    "approx_percentile (t-digest sketch, map-side combinable) unless "
    "exactness is contractual — the same trade as Q31/Q32.",
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        )
        .orderBy("event_type")
    )


@register(
    "q47b",
    oracle=None,  # t-digest sketch != DuckDB's exact quantile; bound-tested in tests/test_plan_shapes.py
    doc="Approximate percentiles (B-D extension): approx_percentile's "
    "t-digest sketch is map-side combinable - one shuffle of fixed-size "
    "sketches instead of q47's per-group sort. The 100 TB default; the "
    "unit test bounds its error against exact q47.",
)
def q47b(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(
                F.approx_percentile("value", F.lit(0.5), F.lit(10000)), 4
            ).alias("p50_approx"),
            F.round(
                F.approx_percentile("value", F.lit(0.9), F.lit(10000)), 4
            ).alias("p90_approx"),
        )
        .orderBy("event_type")
    )


@register(
    "q54",
    oracle="""
    WITH wide AS (
      SELECT o_orderpriority,
             COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
             COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, n FROM (
      SELECT o_orderpriority, 'F' AS status, n_f AS n FROM wide
      UNION ALL SELECT o_orderpriority, 'O', n_o FROM wide
      UNION ALL SELECT o_orderpriority, 'P', n_p FROM wide
    ) ORDER BY o_orderpriority, status
    """,
    doc="UNPIVOT / melt (B-D extension, the inverse of q46): the wide "
    "per-priority status counts back to (priority, status, n) rows via "
    "DataFrame.unpivot - a zero-shuffle per-row expansion. DuckDB mirror "
    "is the UNION ALL rewrite.",
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("F"),
            F.coalesce(F.col("O"), F.lit(0)).alias("O"),
            F.coalesce(F.col("P"), F.lit(0)).alias("P"),
        )
    )
    return (
        wide.unpivot(
            "o_orderpriority", ["F", "O", "P"], "status", "n"
        )
        .orderBy("o_orderpriority", "status")
    )


@register(
    "q58",
    oracle=f"""
    WITH s AS (
      SELECT 'l_quantity' AS col, COUNT(l_quantity) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS sm,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))) * 10000000000
                  AS HUGEINT) AS sm_u,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))
                      * CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) AS sq,
             MIN(l_quantity) AS mn, MAX(l_quantity) AS mx
      FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', COUNT(l_extendedprice),
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE),
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10)))
                  * 10000000000 AS HUGEINT),
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))
                      * CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE),
             MIN(l_extendedprice), MAX(l_extendedprice)
      FROM lineitem
    )
    SELECT col, n,
           {sql_dratio_round('sm_u', 'n * 10000000000')} AS mean,
           ROUND(sqrt(sq / n - (sm / n) * (sm / n)), 4) AS stddev_pop,
           mn, mx
    FROM s ORDER BY col
    """,
    doc="Column profiling / SUMMARIZE (B-D extension): per-column count/"
    "mean/stddev/min/max in ONE scan per column set - the df.summary() "
    "analog every warehouse exposes. Moments use exact DECIMAL sums "
    "(sum, sum-of-squares), so the profile is partition-order "
    "independent; stddev = sqrt(E[x^2] - E[x]^2) on exact inputs.",
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    # r14 dup-scan fix (v2 probe: 2 lineitem scans — one agg pass per
    # column, unioned): fold BOTH columns' moments in ONE pass, then
    # stack the single wide row into the two output rows.
    def moments(col: str, tag: str):
        c = F.col(col).cast("decimal(30,10)")
        scale10 = F.lit(10**10).cast("decimal(11,0)")
        return [
            F.count(col).alias(f"n_{tag}"),
            F.sum(c).cast("double").alias(f"sm_{tag}"),
            (F.sum(c) * scale10).cast(DECZ).alias(f"smu_{tag}"),
            F.sum(c * c).cast("double").alias(f"sq_{tag}"),
            F.min(col).alias(f"mn_{tag}"),
            F.max(col).alias(f"mx_{tag}"),
        ]

    wide = li.agg(
        *moments("l_quantity", "q"), *moments("l_extendedprice", "p")
    )
    s = wide.select(
        F.expr(
            "stack(2,"
            " 'l_quantity', n_q, sm_q, smu_q, sq_q, mn_q, mx_q,"
            " 'l_extendedprice', n_p, sm_p, smu_p, sq_p, mn_p, mx_p"
            ") AS (col, n, sm, sm_u, sq, mn, mx)"
        )
    )
    mean = F.col("sm") / F.col("n")
    scale10 = F.lit(10**10).cast("decimal(11,0)")
    return (
        s.select(
            "col",
            "n",
            dratio_round(
                F.col("sm_u"),
                (F.col("n").cast(DECZ) * scale10).cast(DECZ),
            ).alias("mean"),
            F.round(F.sqrt(F.col("sq") / F.col("n") - mean * mean), 4).alias(
                "stddev_pop"
            ),
            "mn",
            "mx",
        )
        .orderBy("col")
    )


@register(
    "q128",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
           COUNT(*) AS n,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
    """,
    doc="Arbitrary GROUPING SETS (B-C extension; the general form Q33's "
    "ROLLUP and Q34's CUBE specialize): an explicit set list — "
    "(rf, ls), (rf), () — via Spark 4's DataFrame groupingSets API, "
    "GROUPING() disambiguating real NULLs from set placeholders, exact "
    "DECIMAL quantity sums. Same partial+final hash-agg shape as "
    "ROLLUP: one scan, the expand node fans each row into its member "
    "sets map-side.",
)
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count(F.lit(1)).alias("n"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .select(
            "l_returnflag", "l_linestatus", "g_rf", "g_ls", "n", "sum_qty"
        )
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")
    )


@register(
    "q130",
    oracle="""
    WITH c AS (
      SELECT user_id,
             date_trunc('week', MIN(ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT CAST(c.cohort AS VARCHAR) AS cohort_week,
           CAST(date_diff('day', c.cohort, a.wk) // 7 AS BIGINT)
             AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM a JOIN c USING (user_id)
    GROUP BY c.cohort, week_offset
    ORDER BY cohort_week, week_offset
    """,
    doc="Weekly retention cohorts (B-C extension; the second "
    "behavioral-analytics staple): cohort = ISO week of each user's "
    "first event, cells = distinct users from that cohort active in "
    "each later week. Scale shape: both the first-event agg and the "
    "distinct (user, week) set shuffle on user_id — the SAME key, so "
    "the cohort join is co-partitioned (no third shuffle of the fact "
    "data); the output is |cohorts| x |weeks|, tiny by construction. "
    "Cohort emitted as a string (DATE-typed outputs diverge between "
    "pandas engines — contract rule).",
)
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 2 events scans): the cohort fold and
    # the distinct (user, week) pass collapse to one scan — persist the
    # distinct frame and derive the cohort from it (week-truncation is
    # monotone, so week(min ts) == min week, and min over the distinct
    # weeks == min over all rows).
    a = _managed_persist(
        "q130_a",
        ev.select(
            "user_id", F.date_trunc("week", "ts").alias("wk")
        ).distinct(),
    )
    c = a.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        a.join(c, "user_id")
        .select(
            F.col("cohort").cast("date").cast("string").alias(
                "cohort_week"
            ),
            (F.datediff("wk", "cohort") / 7).cast("bigint").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q133",
    oracle=f"""
    WITH u AS (
      SELECT l_returnflag,
             {sql_units2('l_quantity')} AS xu,
             {sql_units2('l_extendedprice')} AS yu
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xu) AS DOUBLE) AS sx,
             CAST(SUM(yu) AS DOUBLE) AS sy,
             CAST(SUM(xu * xu) AS DOUBLE) AS sxx,
             CAST(SUM(yu * yu) AS DOUBLE) AS syy,
             CAST(SUM(xu * yu) AS DOUBLE) AS sxy
      FROM u GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CASE WHEN (n * sxx - sx * sx) <> 0
                THEN ROUND((n * sxy - sx * sy)
                           / (n * sxx - sx * sx), 4)
                ELSE NULL END AS slope,
           CASE WHEN (n * sxx - sx * sx) <> 0
                THEN ROUND((sy - ((n * sxy - sx * sy)
                           / (n * sxx - sx * sx)) * sx) / n / 100.0, 4)
                ELSE NULL END AS intercept,
           CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <> 0
                THEN ROUND((n * sxy - sx * sy)
                      / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 4)
                ELSE NULL END AS corr_r
    FROM s ORDER BY l_returnflag
    """,
    doc="Statistical aggregate family — per-group least-squares slope/"
    "intercept and Pearson correlation (quantity vs extendedprice per "
    "returnflag) from EXACT integer-unit sufficient statistics "
    "(n, Sx, Sy, Sxx, Syy, Sxy) rather than the built-in "
    "regr_slope/corr: float-accumulator aggregates are partition-order-"
    "dependent (bit instability under AQE re-plans). Declared "
    "semantics: both measures are QUANTIZED AT INGEST to 1e-2 units "
    "(units2 — lossless here, lineitem money/qty are exact at 2 dp); "
    "per-row unit products are LONG multiplies inside codegen "
    "(<= ~1.2e14 << 2^63) accumulating in DECIMAL(38,0) — the r12 "
    "q44/q289 fixed-point discipline ported to moment folds (r13): "
    "the long->decimal cast is integer-cheap where the old "
    "double->DECIMAL(30,10) cast paid a per-row Double.toString, and "
    "the scale-0 sum->double cast is correctly rounded in BOTH "
    "engines at any magnitude (the scale-10 cast diverged sub-ulp "
    "above ~9e5). Unit scales cancel in slope/corr; the intercept "
    "unscales by /100 with the identical op order in both engines. "
    "Still one partial+final map-side-combinable hash-agg pass; the "
    "closed forms run on the 3-row result.",
)
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    u = li.select(
        "l_returnflag",
        units2(F.col("l_quantity")).alias("xu"),
        units2(F.col("l_extendedprice")).alias("yu"),
    )
    s = u.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xu").cast(DECZ)).cast("double").alias("sx"),
        F.sum(F.col("yu").cast(DECZ)).cast("double").alias("sy"),
        F.sum((F.col("xu") * F.col("xu")).cast(DECZ))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("yu") * F.col("yu")).cast(DECZ))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("xu") * F.col("yu")).cast(DECZ))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    # Constant-column guard (q330/q372 class, extended r12): zero
    # variance zeroes the divisors — Spark ANSI raises where DuckDB
    # yields NaN/inf, so both engines agree on NULL first.
    slope = F.when(var_x != 0, cov_n / var_x)
    return s.select(
        "l_returnflag",
        "n",
        F.round(slope, 4).alias("slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / n / F.lit(100.0), 4
        ).alias("intercept"),
        F.when(
            var_x * var_y != 0, F.round(cov_n / F.sqrt(var_x * var_y), 4)
        ).alias("corr_r"),
    ).orderBy("l_returnflag")


@register(
    "q139",
    oracle="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT d1.l_partkey AS a, d2.l_partkey AS b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM d d1 JOIN d d2
      ON d1.l_orderkey = d2.l_orderkey AND d1.l_partkey < d2.l_partkey
    GROUP BY a, b HAVING COUNT(*) >= 2
    ORDER BY support DESC, a, b
    """,
    doc="Market-basket co-occurrence (frequent itemset support counting, "
    "the association-rule building block): unordered part pairs bought "
    "in the same order, kept at support >= 2. The oracle states it as "
    "the textbook fact self-join; the engine NEVER self-joins the fact "
    "— one shuffle groups each order's distinct parts into a sorted "
    "array (collect_set dedups per basket, so no separate distinct "
    "pass: the r13 form pre-distincted into its OWN full-fact "
    "exchange, doubling fact shuffle bytes for a dedup the set agg "
    "already does — r14 plan diff: 2 fact Exchanges -> 1), pairs are "
    "generated per basket with an index-aware "
    "transform over slice() (expansion bounded by basket_size^2, ~4 "
    "items/order here, and the lambdas touch only basket-sized arrays "
    "— the interpreted-HOF concern applies to corpus-sized streams, "
    "not 4-element baskets), and the pair counts reduce in a second "
    "map-side-combinable hash agg. A self-join shuffles the fact "
    "TWICE and replays per-order candidate pairs through the "
    "exchange; this shape shuffles it once and ships only (pair, "
    "partial-count) rows. Total order: support desc, then the unique "
    "(a, b) pair.",
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("items"))
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (x, i) -> "
                "transform(slice(items, i + 2, size(items)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .orderBy(F.col("support").desc(), "a", "b")
    )


@register(
    "q140",
    oracle=None,  # HLL sketch internals are engine-specific; the driver
    # records the rows-only check and the REAL evidence is the unit
    # test: shard-merged and direct estimates each within 5% of the
    # exact distinct count (union targets a different HLL storage
    # type than a direct sketch, so the two estimates may differ by
    # a few counts — both are bounded, neither is privileged).
    doc="HyperLogLog sketch build + merge (the second mergeable-sketch "
    "family next to q111's count-min; the algebra behind q32's "
    "approx_count_distinct, exposed as a REUSABLE artifact instead of "
    "a scalar): per-shard HLL sketches of o_custkey are built with "
    "one hll_sketch_agg pass (map-side combinable, lgK=12 → 4 KB per "
    "sketch regardless of input size), then hll_union_agg folds the "
    "shard sketches into the corpus sketch. This is the 1000-executor "
    "/ streaming-increment cardinality pattern: each executor (or "
    "micro-batch, or daily partition) emits its 4 KB sketch and the "
    "union is associative+commutative — re-aggregation without "
    "rescanning. Output row carries shard-merged vs direct vs exact "
    "counts; the unit test bounds BOTH estimates within 5% relative "
    "error of the exact count (union storage-type promotion means the "
    "merged estimate can differ from the direct one by a few counts).",
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    shard_sketches = orders.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = shard_sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    direct = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias(
            "direct_est"
        ),
        F.countDistinct("o_custkey").alias("exact"),
    )
    return merged.crossJoin(direct).select(
        "merged_est",
        "direct_est",
        "exact",
        F.round(
            F.abs(F.col("merged_est") - F.col("exact"))
            / F.col("exact")
            * 100,
            2,
        ).alias("rel_err_pct"),
    )


@register(
    "q143",
    oracle=f"""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value')} AS total
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Skew-resilient salted two-phase aggregation (the low-cardinality/"
    "hot-key agg discipline; the agg twin of tests/test_skew.py's "
    "salted join): events has only a handful of event_type groups, so "
    "a direct groupBy funnels every row of a hot group through ONE "
    "reducer task. Phase 1 groups by (event_type, salt16) — salt is a "
    "pure hash of the unique event_id, so the hot key fans across 16 "
    "reducers; phase 2 re-reduces the 16 partials per group. Decimal "
    "partial sums make the two-level reduction associative-EXACT, so "
    "the result is bit-identical to the one-phase plan (the oracle "
    "states the plain agg). Note Spark's map-side partial combine "
    "already does this for COUNT/SUM — the explicit salt is the "
    "pattern for the cases partial combine can't save: collect_list, "
    "exact percentile, or any holistic agg over a hot key.",
)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(30,10)"
    phase1 = (
        ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast(dec)).alias("ps"),
        )
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("ps").cast("double").alias("total"),
        )
        .orderBy("event_type")
    )


@register(
    "q155",
    oracle=f"""
    WITH lc AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY source, lang
    ),
    t AS (SELECT source, SUM(c) AS n FROM lc GROUP BY source)
    SELECT lc.source,
           CAST(t.n AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           ROUND(CAST(SUM(CAST(
               -(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                 * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               AS DECIMAL(30,10))) AS DOUBLE), 6) AS lang_entropy,
           {sql_dratio_round('MAX(c)', 't.n', 6)}
             AS top_lang_share
    FROM lc JOIN t USING (source)
    GROUP BY lc.source, t.n
    ORDER BY lc.source
    """,
    doc="Corpus diversity audit — per-source language-distribution "
    "Shannon entropy + dominance (the mixture-health metric a "
    "training-data pipeline reads before q120 rebalances: entropy "
    "near 0 means a source is monolingual, top_lang_share flags "
    "collapse onto one language). Two stacked hash aggs over one "
    "scan: (source, lang) counts, then per-source reduction — both "
    "map-side combinable, grouped on the SAME leading key so the "
    "second agg needs no extra exchange. The -p*ln(p) terms are "
    "deterministic per-row double math on exact integer counts; "
    "only the cross-term SUM takes the DECIMAL accumulator; "
    "round(6) seals the hash parity. At 100 TB the intermediate "
    "is |sources| x |langs| rows - nothing.",
)
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lc = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    return (
        lc.withColumn(
            "n", F.sum("c").over(Window.partitionBy("source"))
        )
        .groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.round(
                F.sum((-p * F.log(p)).cast("decimal(30,10)")).cast(
                    "double"
                ),
                6,
            ).alias("lang_entropy"),
            dratio_round(
                F.max("c").cast(DECZ), F.col("n").cast(DECZ), 6
            ).alias("top_lang_share"),
        )
        .select(
            "source",
            F.col("n").alias("n_docs"),
            "n_langs",
            "lang_entropy",
            "top_lang_share",
        )
        .orderBy("source")
    )


@register(
    "q157",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           CAST(COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS BIGINT)
             AS n_months
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Multiple DISTINCT aggregates in one query (B-extension next to "
    "q31's single count-distinct): two distinct counters over "
    "DIFFERENT columns plus a plain count force Catalyst's Expand-"
    "based rewrite — each input row is replicated once per distinct "
    "group with a gid, one hash agg dedups (gid, key) pairs, a "
    "second reassembles the per-priority row. That plan is the "
    "scalable shape: no per-group hash-set state (which OOMs on a "
    "hot group at 100 TB), both shuffles hash-partitioned, and the "
    "plain COUNT(*) rides the same Expand. approx_count_distinct "
    "(q32) is the documented swap when exactness is negotiable.",
)
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
            F.countDistinct(
                F.date_format("o_orderdate", "yyyy-MM")
            ).alias("n_months"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q158",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
      FROM events
    ),
    f AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY user_id)
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN day <> first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users
    FROM d JOIN f USING (user_id)
    GROUP BY day
    ORDER BY day
    """,
    doc="New-vs-returning daily active users (the third behavioral-"
    "analytics staple next to q129 funnel / q130 retention): each "
    "day's actives split by whether it is the user's FIRST day. "
    "Scale shape: the distinct (user, day) set and the per-user "
    "first-day agg both shuffle on user_id — the SAME key, so the "
    "classification join is co-partitioned (no extra exchange of "
    "the fact data; q130's cohort discipline). The day string is "
    "derived once, UTC-pinned by the events read, and the final "
    "per-day agg is a few hundred groups — map-side combine "
    "collapses it. Counts are additive, so the whole query is "
    "incrementally maintainable as a streaming rollup (q78 serve "
    "pattern) with first_day as the only stateful piece.",
)
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    # the distinct (user, day) set feeds BOTH the classification join
    # and the first-day agg — persist it so events is scanned once
    d = _managed_persist(
        "q158_user_days",
        ev.select(
            "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
        ).distinct(),
    )
    f = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        d.join(f, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).cast("bigint").alias("new_users"),
            F.sum(
                F.when(F.col("day") != F.col("first_day"), 1).otherwise(0)
            ).cast("bigint").alias("returning_users"),
        )
        .orderBy("day")
    )


@register(
    "q162",
    oracle="""
    WITH o AS (
      SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS obs
      FROM documents GROUP BY lang, source
    ),
    r AS (SELECT lang, SUM(obs) AS rt FROM o GROUP BY lang),
    c AS (SELECT source, SUM(obs) AS ct FROM o GROUP BY source),
    n AS (SELECT SUM(obs) AS nt FROM o),
    cells AS (
      SELECT (obs - rt * ct / nt) * (obs - rt * ct / nt)
             / (rt * ct / nt) AS term
      FROM o JOIN r USING (lang) JOIN c USING (source), n
    )
    SELECT ROUND(CAST(SUM(CAST(term AS DECIMAL(30,10))) AS DOUBLE), 4)
             AS chi2,
           (SELECT CAST((COUNT(DISTINCT lang) - 1) AS BIGINT)
                   * (COUNT(DISTINCT source) - 1) FROM documents) AS dof
    FROM cells
    """,
    doc="Chi-square independence test on the lang x source contingency "
    "table (statistical-audit family next to q133's regression and "
    "q155's entropy: does document language depend on source? — the "
    "drift test a corpus pipeline runs when a new crawl lands). One "
    "scan builds the observed cell counts; row totals, column totals "
    "and N re-aggregate from those CELLS, not the fact table (three "
    "tiny aggs over |langs|x|sources| rows); expected counts and the "
    "(O-E)^2/E terms are deterministic double math on exact integer "
    "counts, and the final reduction over cells takes the DECIMAL "
    "accumulator. Output is one (chi2, dof) row — the 100 TB cost "
    "is exactly one combinable groupBy of the fact table.",
)
def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 5 documents scans): r/c/n each re-ran
    # the corpus fold and dof did its own full scan. Persist the tiny
    # cell frame and derive dof from it (distinct langs/sources among
    # group keys == among docs) — exactly the one-fold shape the doc
    # declares.
    o = _managed_persist(
        "q162_o",
        docs.groupBy("lang", "source").agg(
            F.count(F.lit(1)).cast("double").alias("obs")
        ),
    )
    r = o.groupBy("lang").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("source").agg(F.sum("obs").alias("ct"))
    n = o.agg(F.sum("obs").alias("nt"))
    exp = F.col("rt") * F.col("ct") / F.col("nt")
    cells = (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(n))
        .select(
            ((F.col("obs") - exp) * (F.col("obs") - exp) / exp).alias(
                "term"
            )
        )
    )
    dof = o.agg(
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        ).cast("bigint").alias("dof")
    )
    return cells.agg(
        F.round(
            F.sum(F.col("term").cast("decimal(30,10)")).cast("double"), 4
        ).alias("chi2")
    ).crossJoin(F.broadcast(dof))


@register(
    "q164",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS day_num
      FROM events
    ),
    mx AS (SELECT MAX(day_num) AS max_day FROM d),
    expanded AS (
      SELECT user_id, d.day_num + g.offs AS tgt
      FROM d, (SELECT unnest(generate_series(0, 6)) AS offs) g, mx
      WHERE d.day_num + g.offs <= mx.max_day
    )
    SELECT strftime(DATE '1970-01-01' + tgt * INTERVAL 1 DAY,
                    '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_7d
    FROM expanded
    GROUP BY tgt ORDER BY day
    """,
    doc="Rolling 7-day active users (the WAU staple; completes the "
    "behavioral set q129/q130/q158). Sliding DISTINCT cannot ride a "
    "window frame (no distinct-in-window), so the scalable rewrite "
    "is the bounded EXPLODE: each distinct (user, day) contributes "
    "itself to the 7 target days it keeps the user 'active' for "
    "(sequence + explode, fan-out exactly 7), then one "
    "count-distinct per target day. The fan-out happens AFTER the "
    "per-day dedup, so it is 7x the distinct pairs, not 7x the "
    "events; the count-distinct shuffles (day, user) pairs once. "
    "Day arithmetic runs on integer day numbers (UTC-pinned read), "
    "converted to strings only at the edges; trailing days beyond "
    "the data's max day are clipped via a broadcast 1-row max frame.",
)
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    ev = load_table(spark, sf_dir, "events")
    # persisted: the explode AND the max-day broadcast both read it —
    # without the persist each branch re-scans and re-dedups events
    d = _managed_persist(
        "q164_user_days",
        ev.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("day_num"),
        ).distinct(),
    )
    mx = d.agg(F.max("day_num").alias("max_day"))
    expanded = (
        d.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day_num"), F.col("day_num") + 6)
            ).alias("tgt"),
        )
        .crossJoin(F.broadcast(mx))
        .where(F.col("tgt") <= F.col("max_day"))
    )
    return (
        expanded.groupBy("tgt")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .select(
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("tgt")),
                "yyyy-MM-dd",
            ).alias("day"),
            "active_7d",
        )
        .orderBy("day")
    )


@register(
    "q167",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(30,10))) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT SUM(rev) AS tot FROM pr),
    c AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS crev
      FROM pr
    ),
    cls AS (
      SELECT CASE
               WHEN CAST(crev AS DOUBLE)
                    <= CAST(0.80 AS DOUBLE) * CAST(tot AS DOUBLE) THEN 'A'
               WHEN CAST(crev AS DOUBLE)
                    <= CAST(0.95 AS DOUBLE) * CAST(tot AS DOUBLE) THEN 'B'
               ELSE 'C'
             END AS abc_class,
             rev, tot
      FROM c, t
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS class_rev,
           ROUND(CAST(SUM(rev) AS DOUBLE) / CAST(ANY_VALUE(tot) AS DOUBLE),
                 4) AS rev_share
    FROM cls GROUP BY abc_class ORDER BY abc_class
    """,
    doc="Pareto / ABC revenue classification (the inventory-analytics "
    "staple: class A = parts covering the first 80% of cumulative "
    "revenue, B to 95%, C the tail). The oracle states the naive "
    "global running sum; the engine computes the SAME cumulative "
    "ordering distributed, with the q45/q53 two-phase discipline — "
    "no unpartitioned window over the fact: (1) per-part revenue "
    "agg (DECIMAL), (2) exact revenue percentile bounds (one tiny "
    "agg, broadcast) define ~8 value-range buckets as a PURE "
    "function of revenue, (3) per-bucket totals cumulate via a "
    "triangular self-join over 8 rows (no window at all), (4) the "
    "within-bucket running sum windows PARTITIONED BY bucket, "
    "offset by the bucket prefix. Classification compares doubles "
    "cast from identical decimals — cross-engine exact; boundary "
    "ties are impossible to split differently because the cumulative "
    "order carries the unique partkey tie-break.",
)
def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(30,10)"
    # per-part revenue feeds FOUR branches (bounds, buckets, offsets,
    # total) — persist it so the lineitem scan+agg runs once
    pr = _managed_persist(
        "q167_part_rev",
        li.groupBy("l_partkey").agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    dec
                )
            ).alias("rev")
        ),
    )
    # exact percentile bounds -> value-range buckets (pure fn of rev)
    bounds = pr.agg(
        F.expr(
            "percentile(CAST(rev AS DOUBLE), "
            "array(0.125,0.25,0.375,0.5,0.625,0.75,0.875))"
        ).alias("bs")
    )
    bucketed = pr.crossJoin(F.broadcast(bounds)).select(
        "l_partkey",
        "rev",
        # bucket = #bounds strictly above rev: the top-revenue band gets
        # bk=0, so ascending bk follows the rev-DESC cumulative order
        F.expr(
            "size(filter(bs, b -> b > CAST(rev AS DOUBLE)))"
        ).alias("bk"),
    )
    btot = bucketed.groupBy("bk").agg(F.sum("rev").alias("brev"))
    # cumulative revenue of all STRICTLY EARLIER buckets (triangular
    # self-join over <= 8 rows — no window, no single-task stage)
    b2 = btot.select(
        F.col("bk").alias("bk2"), F.col("brev").alias("brev2")
    )
    offsets = (
        btot.join(b2, F.col("bk2") < F.col("bk"), "left")
        .groupBy("bk")
        .agg(F.sum("brev2").alias("offset"))
        .na.fill({"offset": 0})
    )
    tot = pr.agg(F.sum("rev").alias("tot"))
    w = Window.partitionBy("bk").orderBy(
        F.col("rev").desc(), F.col("l_partkey")
    )
    crev = (
        bucketed.join(F.broadcast(offsets), "bk")
        .withColumn("wsum", F.sum("rev").over(w))
        .select(
            "l_partkey",
            "rev",
            (F.col("wsum") + F.col("offset")).alias("crev"),
        )
    )
    cls = crev.crossJoin(F.broadcast(tot)).select(
        "rev",
        "tot",
        F.when(
            F.col("crev").cast("double")
            <= F.lit(0.80) * F.col("tot").cast("double"),
            "A",
        )
        .when(
            F.col("crev").cast("double")
            <= F.lit(0.95) * F.col("tot").cast("double"),
            "B",
        )
        .otherwise("C")
        .alias("abc_class"),
    )
    return (
        cls.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("rev").cast("double"), 2).alias("class_rev"),
            F.round(
                F.sum("rev").cast("double")
                / F.any_value(F.col("tot")).cast("double"),
                4,
            ).alias("rev_share"),
        )
        .orderBy("abc_class")
    )


@register(
    "q174",
    oracle="""
    WITH mn AS (
      SELECT MIN(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
               AS min_day
      FROM events
    ),
    offs AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               - min_day AS off
      FROM events, mn
      WHERE date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
            - min_day < 64
    )
    SELECT user_id,
           CAST(bit_or(CAST(1 AS BIGINT) << CAST(off AS INT)) AS BIGINT)
             AS activity_mask,
           CAST(bit_count(bit_or(CAST(1 AS BIGINT) << CAST(off AS INT)))
                AS BIGINT) AS active_days
    FROM offs GROUP BY user_id ORDER BY user_id
    """,
    doc="Per-user activity BITMAP over the corpus's first 64 days — the "
    "third mergeable-sketch family (bitmaps, next to q111 count-min "
    "and q140 HLL): day-presence packs into one BIGINT via "
    "bit_or(1<<offset), a commutative+associative agg whose partials "
    "combine map-side, fold across micro-batches, and AND/OR across "
    "periods (retention = popcount(week1_mask & week2_mask) with NO "
    "distinct or join — the roaring-bitmap idea at word size). "
    "active_days = bit_count(mask). The q97 ANSI lesson applies: "
    "1<<off on a 64-bit lane, never the multiply-accumulate form. "
    "A real deployment shards (user, epoch-week) masks — this keeps "
    "the 64-day cohort window so one BIGINT is the whole sketch; "
    "the global min-day arrives via a broadcast 1-row frame.",
)
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day_num"),
    )
    mn = ev.agg(F.min("day_num").alias("min_day"))
    offs = (
        ev.crossJoin(F.broadcast(mn))
        .select(
            "user_id", (F.col("day_num") - F.col("min_day")).alias("off")
        )
        .where(F.col("off") < 64)
    )
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(off AS INT))")
    return (
        offs.groupBy("user_id")
        .agg(
            F.bit_or(bit).cast("bigint").alias("activity_mask"),
            F.bit_count(F.bit_or(bit)).cast("bigint").alias("active_days"),
        )
        .orderBy("user_id")
    )


@register(
    "q175",
    oracle="""
    WITH mm AS (
      SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
    ),
    b AS (
      SELECT event_type,
             CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
                  ELSE LEAST(CAST(127 AS BIGINT), CAST(FLOOR(
                    (value - lo) / ((hi - lo) / CAST(128 AS DOUBLE))
                  ) AS BIGINT)) END AS bin
      FROM events, mm
    ),
    h AS (
      SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS c
      FROM b GROUP BY event_type, bin
    ),
    cum AS (
      SELECT event_type, bin, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cc,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM h
    )
    SELECT event_type,
           CAST(MIN(CASE WHEN cc * 2 >= n THEN bin END) AS BIGINT)
             AS p50_bin,
           CAST(MIN(CASE WHEN cc * 20 >= n * 19 THEN bin END) AS BIGINT)
             AS p95_bin,
           CAST(MIN(CASE WHEN cc * 100 >= n * 99 THEN bin END) AS BIGINT)
             AS p99_bin,
           CAST(SUM(c) AS BIGINT) AS n_events
    FROM cum GROUP BY event_type ORDER BY event_type
    """,
    doc="Mergeable equi-width histogram quantiles — the FOURTH sketch "
    "family (fixed-bin histograms, next to q111 count-min / q140 HLL "
    "/ q174 bitmaps): 128 equal-width bins over the global [min,max] "
    "(one tiny agg, broadcast), per-(group,bin) counts — partials "
    "combine map-side, fold across shards/micro-batches by plain "
    "addition, and the quantile is read off the cumulative histogram "
    "with INTEGER cross-multiplied thresholds (cc*2 ≥ n for p50 — no "
    "float division anywhere, so the bin choice is engine-exact and "
    "the whole result oracle-checkable, unlike t-digest/GK sketches "
    "whose internals are engine-specific). Error is bounded by the "
    "bin width — (hi−lo)/128 — the documented trade; q47 is the "
    "exact-percentile swap, q47b the GK-sketch swap. The cumulative "
    "window runs over ≤128 rows per group — nothing at any scale.",
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    mm = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(128.0)
    # Constant-value guard (q330/q372 class, extended r12): hi == lo
    # zeroes the bin width — Spark ANSI raises on the divide where
    # DuckDB yields NaN; everything lands in bin 0 in both engines.
    b = ev.crossJoin(F.broadcast(mm)).select(
        "event_type",
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("bigint"))
        .otherwise(
            F.least(
                F.lit(127).cast("bigint"),
                F.floor(
                    (F.col("value") - F.col("lo")) / width
                ).cast("bigint"),
            )
        )
        .alias("bin"),
    )
    h = b.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = h.select(
        "event_type",
        "bin",
        "c",
        F.sum("c").over(w_cum).alias("cc"),
        F.sum("c").over(w_all).alias("n"),
    )
    pick = lambda mul, cmp_mul: F.min(  # noqa: E731
        F.when(F.col("cc") * mul >= F.col("n") * cmp_mul, F.col("bin"))
    ).cast("bigint")
    return (
        cum.groupBy("event_type")
        .agg(
            pick(2, 1).alias("p50_bin"),
            pick(20, 19).alias("p95_bin"),
            pick(100, 99).alias("p99_bin"),
            F.sum("c").cast("bigint").alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "q181",
    oracle="""
    WITH lat AS (
      SELECT o_orderkey,
             date_diff('day', o_orderdate, MAX(l_shipdate)) AS lat_days
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_orderdate
    )
    SELECT CASE WHEN lat_days <= 7 THEN 'a_week'
                WHEN lat_days <= 30 THEN 'b_month'
                WHEN lat_days <= 90 THEN 'c_quarter'
                ELSE 'd_longer' END AS latency_band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(lat_days) AS BIGINT) AS min_days,
           CAST(MAX(lat_days) AS BIGINT) AS max_days
    FROM lat GROUP BY latency_band ORDER BY latency_band
    """,
    doc="Order-fulfillment latency distribution — days from order to "
    "LAST shipment, banded (the operational-SLA report; the lag "
    "metric every fulfillment dashboard leads with). One "
    "co-partitioned fact-fact join on orderkey feeding a per-order "
    "MAX (partial-agg combinable — the shuffle carries one row per "
    "order, not per line), then integer day arithmetic into a "
    "codegen CASE band and a 4-row rollup. Bands are prefixed "
    "(a_/b_/…) so the lexical ORDER BY is also the semantic order "
    "— no separate sort-key column to keep in parity.",
)
def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    lat = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.datediff(
                F.col("last_ship").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("lat_days")
        )
    )
    band = (
        F.when(F.col("lat_days") <= 7, "a_week")
        .when(F.col("lat_days") <= 30, "b_month")
        .when(F.col("lat_days") <= 90, "c_quarter")
        .otherwise("d_longer")
    )
    return (
        lat.groupBy(band.alias("latency_band"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("lat_days").cast("bigint").alias("min_days"),
            F.max("lat_days").cast("bigint").alias("max_days"),
        )
        .orderBy("latency_band")
    )


@register(
    "q214",
    oracle=f"""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    s1 AS (SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS s
           FROM d GROUP BY 1),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb
          FROM lineitem),
    p AS (
      SELECT d1.l_partkey AS a, d2.l_partkey AS b,
             CAST(COUNT(*) AS BIGINT) AS supp
      FROM d d1 JOIN d d2
        ON d1.l_orderkey = d2.l_orderkey AND d1.l_partkey < d2.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    )
    SELECT a, b, supp,
           {sql_dratio_round('supp', 'sa.s')} AS conf_ab,
           {sql_dratio_round('supp', 'sb.s')} AS conf_ba,
           {sql_dratio_round('supp * n.nb', 'sa.s * sb.s')} AS lift
    FROM p JOIN s1 sa ON sa.k = a JOIN s1 sb ON sb.k = b CROSS JOIN n
    ORDER BY a, b
    """,
    doc="Association rules — confidence and lift on the frequent pairs "
    "(q139's actionable sibling; the recommender/affinity staple): "
    "for every part pair co-ordered >= 3 times, conf(a→b) = "
    "supp(ab)/supp(a), conf(b→a), and lift = N·supp(ab)/"
    "(supp(a)·supp(b)) — lift > 1 means the pair co-occurs more than "
    "independence predicts. Scale shape: pairs come from q139's "
    "per-basket array expansion (fact shuffled ONCE, never "
    "self-joined); single-item supports are |parts| rows and "
    "broadcast onto the pair frame twice; the basket count is a "
    "1-row broadcast. Every metric is an exact half-up integer "
    "division (dratio_round) — int/int ratios can land exactly on "
    ".5e-4 round boundaries where engine double-ROUNDs disagree.",
)
def q214(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    li = load_table(spark, sf_dir, "lineitem")
    # Three consumers (pair expansion, s1 and nb broadcast builds)
    # would each re-run the fact scan: exchange reuse does not reliably
    # fire across branches under AQE (CLAUDE.md). r13 materialized the
    # distinct (orderkey, partkey) frame; r14 materializes the BASKET
    # frame instead — collect_set dedups per order, so the separate
    # distinct pass was a second full-fact exchange for nothing, and
    # the persisted frame shrinks from |fact| pair rows to |orders|
    # small arrays. s1 (distinct orders per part) and nb (order count)
    # derive from the basket frame exactly: exploding the dedup'd item
    # arrays re-emits each distinct (order, part) pair once.
    baskets = _managed_persist(
        "q214_baskets",
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("items")),
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (x, i) -> "
                    "transform(slice(items, i + 2, size(items)), "
                    "y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("supp"))
        .filter(F.col("supp") >= 3)
    )
    # s1 feeds TWO broadcast builds (sa and sb) and every broadcast
    # build re-executes its subtree (CLAUDE.md materialize-before-
    # broadcast rule; the r14 plan read the explode+two-level agg
    # twice). Persisting the |parts|-row aggregate makes both builds
    # read the same tiny cached frame.
    s1 = _managed_persist(
        "q214_s1",
        baskets.select(F.explode("items").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("s")),
    )
    nb = baskets.agg(F.count(F.lit(1)).alias("nb"))
    return (
        pairs.join(
            F.broadcast(s1.select(F.col("k").alias("ka"), F.col("s").alias("sa"))),
            F.col("a") == F.col("ka"),
        )
        .join(
            F.broadcast(s1.select(F.col("k").alias("kb"), F.col("s").alias("sb"))),
            F.col("b") == F.col("kb"),
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "a",
            "b",
            "supp",
            dratio_round(
                F.col("supp").cast(DECZ), F.col("sa").cast(DECZ)
            ).alias("conf_ab"),
            dratio_round(
                F.col("supp").cast(DECZ), F.col("sb").cast(DECZ)
            ).alias("conf_ba"),
            dratio_round(
                (F.col("supp") * F.col("nb")).cast(DECZ),
                (F.col("sa") * F.col("sb")).cast(DECZ),
            ).alias("lift"),
        )
        .orderBy("a", "b")
    )


@register(
    "q217",
    oracle="""
    SELECT c_nationkey AS nationkey,
           bool_and(c_acctbal > 0) AS all_positive,
           bool_or(c_acctbal > 9000) AS any_high,
           CAST(COUNT(*) FILTER (WHERE c_acctbal < 0) AS BIGINT)
             AS n_negative,
           MIN(c_name) AS first_name
    FROM customer GROUP BY 1 ORDER BY 1
    """,
    doc="Boolean/conditional aggregate family (B-C completion): "
    "bool_and (every), bool_or (some), count_if-style filtered "
    "count, and a DETERMINISTIC representative row via MIN — the "
    "any_value() replacement that survives engine comparison "
    "(any_value is explicitly order-dependent and would "
    "hash-mismatch by design). All four are map-side-combinable "
    "single-pass aggregates sharing one shuffle; bool_and/bool_or "
    "partials are single bits — the cheapest mergeable state there "
    "is (A25's ALL()-completeness reduction, master.ino:158-168, "
    "as first-class aggregates).",
)
def q217(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.bool_and(F.col("c_acctbal") > 0).alias("all_positive"),
            F.bool_or(F.col("c_acctbal") > 9000).alias("any_high"),
            F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_negative"),
            F.min("c_name").alias("first_name"),
        )
        .orderBy("nationkey")
    )


@register(
    "q218",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_disc(o_totalprice, 0.25) AS p25,
           quantile_disc(o_totalprice, 0.50) AS p50,
           quantile_disc(o_totalprice, 0.90) AS p90
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Discrete percentiles (percentile_disc / quantile_disc) per "
    "group — the REAL-ROW quantile next to q47's interpolated "
    "percentile_cont: p-th value is the element at rank ceil(p·n), "
    "an actual order row (SLA reporting wants an order you can point "
    "at, not an interpolated price that never happened). The index "
    "is computed in INTEGER arithmetic ((a·n + b − 1) DIV b for "
    "p = a/b) — floating ceil(p·n) misfires when p·n lands on an "
    "integer with an inexact p (0.9·10 = 9.000…2 → ceil 10; DuckDB's "
    "native quantile_disc resolves exactly, probed round 7). Scale "
    "shape: one shuffle on the group key; row_number + count ride "
    "the SAME window partition, then one conditional agg collapses "
    "each group — no second exchange, no sort beyond the per-group "
    "one every exact quantile needs.",
)
def q218(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wn = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(a: int, b: int, name: str):
        k = F.expr(f"div({a} * n + {b} - 1, {b})")
        return F.max(
            F.when(F.col("rn") == k, F.col("o_totalprice"))
        ).alias(name)

    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n"),
            pick(1, 4, "p25"),
            pick(1, 2, "p50"),
            pick(9, 10, "p90"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q221",
    oracle="""
    WITH o AS (
      SELECT o_orderkey FROM orders
      WHERE (o_orderkey % 2147483648) * 2654435761 % 100 < 10
    ),
    os AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders FROM o),
    ls AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
             {rev} AS revenue
      FROM lineitem
      WHERE (l_orderkey % 2147483648) * 2654435761 % 100 < 10
    )
    SELECT n_orders, n_lines, revenue,
           {ratio} AS avg_lines
    FROM os CROSS JOIN ls
    ORDER BY n_orders
    """.format(
        rev=sql_dsum("l_extendedprice * (1 - l_discount)"),
        ratio=sql_dratio_round("n_lines", "n_orders"),
    ),
    doc="Cluster (block) sampling — sample whole ORDERS and keep every "
    "one of their lineitems (completing the sampling matrix next to "
    "q105 row-rate / q109 stratified / q149 weighted / q170 "
    "fixed-count / q182 reservoir): row-level sampling of correlated "
    "data destroys within-group structure (a basket analysis on "
    "row-sampled lines sees phantom small baskets); cluster sampling "
    "preserves it. The decisive scale property: membership is a PURE "
    "FUNCTION of the cluster key (q105's multiplicative hash), so "
    "the lineitem side filters on hash(l_orderkey) AT THE SCAN — "
    "zero joins, zero shuffles, no sampled-key list to distribute; "
    "the two sides agree by arithmetic, not coordination. Exact "
    "DECIMAL revenue; ratio-of-counts round(4).",
)
def q221(spark: SparkSession, sf_dir: str) -> DataFrame:
    keep = (
        lambda c: (F.col(c) % F.lit(2147483648)) * 2654435761 % 100 < 10
    )
    n_orders = (
        load_table(spark, sf_dir, "orders")
        .where(keep("o_orderkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    lines = (
        load_table(spark, sf_dir, "lineitem")
        .where(keep("l_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
    )
    return (
        n_orders.crossJoin(F.broadcast(lines))
        .select(
            "n_orders",
            "n_lines",
            "revenue",
            dratio_round(
                F.col("n_lines").cast(DECZ), F.col("n_orders").cast(DECZ)
            ).alias("avg_lines"),
        )
        .orderBy("n_orders")
    )


@register(
    "q222",
    oracle="""
    WITH m AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS month_key,
             {rev} AS revenue
      FROM orders
      GROUP BY month_key
    )
    SELECT cur.month_key, cur.revenue,
           ROUND((cur.revenue - pm.revenue) / pm.revenue * 100, 4)
             AS mom_pct,
           ROUND((cur.revenue - py.revenue) / py.revenue * 100, 4)
             AS yoy_pct
    FROM m cur
    LEFT JOIN m pm ON pm.month_key =
      CASE WHEN cur.month_key % 100 = 1
           THEN cur.month_key - 89 ELSE cur.month_key - 1 END
    LEFT JOIN m py ON py.month_key = cur.month_key - 100
    ORDER BY cur.month_key
    """.format(rev=sql_dsum("o_totalprice")),
    doc="Period-over-period report — monthly revenue with MoM and "
    "YoY percent deltas (the executive-dashboard staple). The textbook "
    "spelling is lag(1)/lag(12) over the month series — an "
    "UNPARTITIONED window, the global-sort class this engine bans "
    "(test_plan_lint) — so the engine states period adjacency "
    "STRUCTURALLY instead: the month keys are arithmetic "
    "(prev-month = key−1, or −89 across the January boundary; "
    "prev-year = key−100), and two self-joins of the tiny "
    "aggregated frame resolve them — embarrassingly parallel at "
    "any scale, no sort, no single partition. Month frame is "
    "|months| rows, so the joins broadcast. Deltas are one "
    "subtract + divide on exact-DECIMAL-derived doubles, round(4); "
    "first month / first year emit NULL by the left joins.",
)
def q222(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # The monthly fold feeds the report plus both lag broadcasts — 3
    # orders scans in one plan without materialization.
    m = _managed_persist(
        "q222_m",
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("month_key")
        )
        .agg(dsum("o_totalprice").alias("revenue")),
    )
    pm_key = F.when(
        F.col("month_key") % 100 == 1, F.col("month_key") - 89
    ).otherwise(F.col("month_key") - 1)
    pm = m.select(
        F.col("month_key").alias("pm_key"), F.col("revenue").alias("pm_rev")
    )
    py = m.select(
        F.col("month_key").alias("py_key"), F.col("revenue").alias("py_rev")
    )
    return (
        m.join(F.broadcast(pm), pm_key == F.col("pm_key"), "left")
        .join(
            F.broadcast(py),
            F.col("month_key") - 100 == F.col("py_key"),
            "left",
        )
        .select(
            "month_key",
            "revenue",
            F.round(
                (F.col("revenue") - F.col("pm_rev")) / F.col("pm_rev") * 100, 4
            ).alias("mom_pct"),
            F.round(
                (F.col("revenue") - F.col("py_rev")) / F.col("py_rev") * 100, 4
            ).alias("yoy_pct"),
        )
        .orderBy("month_key")
    )


# scale-4 accumulator (o_totalprice exact at 2 dp): keeps the unscaled
# sum under 2^53 so both engines' decimal->double conversions are exact
# (DuckDB's int128->double truncates above 2^53, probed r10)
_Q224_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
"""


@register(
    "q224",
    oracle=_Q224_SQL,
    doc="Modern SQL sugar — GROUP BY ALL / ORDER BY ALL (Spark 4 ∩ "
    "DuckDB; the exact SAME SQL text runs on both engines, like "
    "q203's LATERAL): every non-aggregate select column groups, the "
    "full column list orders — the ad-hoc exploration spelling that "
    "eliminates the stale-GROUP-BY-list bug when columns are added. "
    "Resolves at PARSE time to the explicit form, so the plan (one "
    "map-side-combinable agg) is identical to q30's hand-written "
    "spelling — sugar, not semantics. ORDER BY ALL on the two group "
    "keys is a total order; exact DECIMAL revenue.",
)
def q224(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q224_SQL)


@register(
    "q235",
    oracle="""
    WITH nat AS (
      SELECT r_name, n_name, n_nationkey,
             {rev} AS revenue
      FROM customer
      JOIN orders ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name, n_nationkey
    ),
    reg AS (
      SELECT r_name, CAST(SUM(CAST(revenue AS DECIMAL(30,10))) AS DOUBLE)
               AS reg_rev
      FROM nat GROUP BY r_name
    ),
    tot AS (
      SELECT CAST(SUM(CAST(revenue AS DECIMAL(30,10))) AS DOUBLE) AS tot_rev
      FROM nat
    )
    SELECT nat.r_name, nat.n_name, nat.revenue,
           ROUND(nat.revenue / reg.reg_rev * 100, 4) AS pct_of_region,
           ROUND(nat.revenue / tot.tot_rev * 100, 4) AS pct_of_total
    FROM nat JOIN reg ON nat.r_name = reg.r_name CROSS JOIN tot
    ORDER BY nat.r_name, nat.n_name
    """.format(rev=sql_dsum("o_totalprice")),
    doc="Share-of-parent / share-of-total report (B-C extension; the "
    "ratio_to_report reporting staple): each nation's revenue as a "
    "percent of its region and of the corpus — the hierarchical "
    "share metric every drill-down dashboard shows. The textbook "
    "spelling is SUM() OVER (PARTITION BY region) — a second, "
    "wide-row window pass over the detail; the engine re-aggregates "
    "the TINY nation-level frame to region and grand totals and "
    "broadcast-joins them back (q222's structural discipline: the "
    "parent levels are |regions| and 1 rows — re-agg + join beats "
    "windowing the detail at any scale, and the fact table is "
    "touched ONCE). Ratios: exact-DECIMAL-derived doubles, one "
    "divide each, round(4).",
)
def q235(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name", "n_nationkey")
        .agg(dsum("o_totalprice").alias("revenue"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    reg = nat.groupBy(F.col("r_name").alias("rr")).agg(
        dsum("revenue").alias("reg_rev")
    )
    tot = nat.agg(dsum("revenue").alias("tot_rev"))
    return (
        nat.join(F.broadcast(reg), F.col("r_name") == F.col("rr"))
        .crossJoin(F.broadcast(tot))
        .select(
            "r_name",
            "n_name",
            "revenue",
            F.round(F.col("revenue") / F.col("reg_rev") * 100, 4).alias(
                "pct_of_region"
            ),
            F.round(F.col("revenue") / F.col("tot_rev") * 100, 4).alias(
                "pct_of_total"
            ),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "q238",
    oracle="""
    WITH grp AS (
      SELECT c_custkey % 500 AS gid, c_custkey, c_name, c_acctbal,
             c_mktsegment
      FROM customer
    ),
    seg AS (
      SELECT gid, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM grp GROUP BY gid, c_mktsegment
    ),
    best_seg AS (
      SELECT gid,
             arg_max(c_mktsegment,
                     printf('%010d|%s', cnt, c_mktsegment)) AS seg
      FROM seg GROUP BY gid
    ),
    golden AS (
      SELECT gid,
             MIN(c_custkey) AS surviving_id,
             CAST(COUNT(*) AS BIGINT) AS n_merged,
             MAX(c_acctbal) AS best_acctbal,
             arg_max(c_name, c_custkey) AS latest_name
      FROM grp GROUP BY gid
    )
    SELECT g.gid, surviving_id, n_merged, best_acctbal, latest_name,
           b.seg AS seg
    FROM golden g JOIN best_seg b ON g.gid = b.gid
    ORDER BY g.gid
    """,
    doc="Survivorship merge / golden-record construction (B-C "
    "extension; the MDM endgame after q163's duplicate MATCHING): "
    "each duplicate cluster collapses to one record under per-FIELD "
    "rules — smallest key survives as the id, balance takes the max "
    "across duplicates, name comes from the most recent record "
    "(arg_max by key), segment by majority vote with a "
    "deterministic (count, value) tie-break. Every rule is a "
    "mergeable aggregate (min/max/max_by), so survivorship is one "
    "shuffle on the cluster id — never a per-cluster sort or "
    "collect; the majority-vote field needs its own count agg first "
    "(two-level, both map-side combinable). Determinism note: raw "
    "any_value/first survivorship is partition-order-dependent and "
    "would fail engine comparison by design — every rule here has a "
    "total-order tie-break.",
)
def q238(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") % 500).alias("gid"),
        "c_custkey",
        "c_name",
        "c_acctbal",
        "c_mktsegment",
    )
    # r14 dup-scan fix (v2 probe: 2 customer scans): best_seg and
    # golden both re-read the table. ONE (gid, segment) pre-agg carries
    # everything both need — golden's per-gid aggregates re-fold from
    # the segment level (min of mins, sum of counts, max of maxes, and
    # latest_name = the name at the overall max custkey via max_by on
    # the per-segment max).
    from hive_hw_spark.queries.llm_ops import _managed_persist

    lvl1 = _managed_persist(
        "q238_lvl1",
        c.groupBy("gid", "c_mktsegment").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("c_custkey").alias("min_ck"),
            F.max("c_custkey").alias("max_ck"),
            F.max("c_acctbal").alias("max_bal"),
            F.max_by("c_name", "c_custkey").alias("name_at_max"),
        ),
    )
    best_seg = lvl1.groupBy("gid").agg(
        F.max_by("c_mktsegment", F.struct("cnt", "c_mktsegment")).alias(
            "seg"
        )
    )
    golden = lvl1.groupBy("gid").agg(
        F.min("min_ck").alias("surviving_id"),
        F.sum("cnt").alias("n_merged"),
        F.max("max_bal").alias("best_acctbal"),
        F.max_by("name_at_max", "max_ck").alias("latest_name"),
    )
    return (
        golden.join(best_seg, "gid")
        .select(
            "gid", "surviving_id", "n_merged", "best_acctbal",
            "latest_name", "seg",
        )
        .orderBy("gid")
    )


@register(
    "q240",
    oracle="""
    WITH c AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    p AS (
      SELECT user_id, date_trunc('week', ts) AS wk, value
      FROM events WHERE event_type = 'purchase'
    ),
    cell AS (
      SELECT CAST(c.cohort AS VARCHAR) AS cohort_week,
             CAST(date_diff('day', c.cohort, p.wk) // 7 AS BIGINT)
               AS week_offset,
             {rev} AS revenue
      FROM p JOIN c USING (user_id)
      GROUP BY c.cohort, week_offset
    )
    SELECT cohort_week, week_offset, revenue,
           CAST(SUM(CAST(revenue AS DECIMAL(30,10)))
                OVER (PARTITION BY cohort_week ORDER BY week_offset
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_revenue
    FROM cell ORDER BY cohort_week, week_offset
    """.format(rev=sql_dsum("value")),
    doc="Cohort LTV curve (B-C completion; the revenue twin of q130's "
    "retention matrix): weekly purchase revenue per signup cohort by "
    "weeks-since-first-event, with the cumulative-LTV running sum "
    "every payback-period analysis reads. Scale shape: cohort "
    "assignment and per-user purchases shuffle on the SAME user_id "
    "key (co-partitioned join, q130's discipline); the running sum "
    "windows over the |cohorts|×|weeks| CELL frame — tiny by "
    "construction — partitioned by cohort (never the raw fact). "
    "Exact DECIMAL weekly revenue AND exact DECIMAL re-accumulation "
    "in the cumulative window (float cumsum would drift per "
    "partition order).",
)
def q240(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.date_trunc("week", "ts").alias("wk"), "value"
    )
    cell = (
        p.join(c, "user_id")
        .groupBy(
            F.col("cohort").cast("date").cast("string").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("bigint").alias(
                "week_offset"
            ),
        )
        .agg(dsum("value").alias("revenue"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cell.withColumn(
            "cum_revenue",
            F.sum(F.col("revenue").cast("decimal(30,10)")).over(w).cast(
                "double"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q242",
    oracle=f"""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN (user_id % 2147483648) * 2654435761 % 100 < 50
                  THEN 'A' ELSE 'B' END AS arm
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    conv AS (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      GROUP BY user_id HAVING COUNT(*) >= 14
    ),
    arms AS (
      SELECT arm,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(COUNT(conv.user_id) AS BIGINT) AS n_converted
      FROM assign LEFT JOIN conv USING (user_id)
      GROUP BY arm
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 'A' THEN n_users END) AS na,
        MAX(CASE WHEN arm = 'A' THEN n_converted END) AS ca,
        MAX(CASE WHEN arm = 'B' THEN n_users END) AS nb,
        MAX(CASE WHEN arm = 'B' THEN n_converted END) AS cb
      FROM arms
    )
    SELECT na, ca, nb, cb,
           {sql_dratio_round('ca', 'na')} AS rate_a,
           {sql_dratio_round('cb', 'nb')} AS rate_b,
           ROUND((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
                 / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                        * (1 - CAST(ca + cb AS DOUBLE) / (na + nb))
                        * (1.0 / na + 1.0 / nb)), 4) AS z_score
    FROM wide ORDER BY na
    """,
    doc="A/B-experiment conversion lift + two-proportion z-test (B-D "
    "completion; the experimentation staple next to q162's chi-square "
    "— z for the 2×2 case, with direction): users split 50/50 by the "
    "q105/q126 deterministic hash (reproducible assignment, no "
    "rand()), conversion = an ENGAGED user (>= 14 purchases — the corpus has universal light purchasing, so any-purchase saturates at rate 1.0 and the pooled variance degenerates), z = (p̂a − p̂b) / "
    "sqrt(p̂(1−p̂)(1/na + 1/nb)) with the pooled rate. Scale shape: "
    "assignment is a pure key function (zero-coordination, the same "
    "property q126's split relies on), both counts come from one "
    "distinct-user frame + one left semi-style join on user_id, and "
    "the test statistic is computed from FOUR integers in a 1-row "
    "frame — all float ops happen once, identically, in both "
    "engines; round(4).",
)
def q242(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        (F.col("user_id") % F.lit(2147483648)) * 2654435761 % 100 < 50, "A"
    ).otherwise("B")
    # r14 dup-scan fix (v2 probe: 2 events scans): the distinct-users
    # pass and the purchase fold are ONE per-user fold — count purchases
    # per user, every user gets a row, converted == np >= 14. Identical
    # to the old distinct + left-join shape.
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("np")
    )
    arms = per_user.groupBy(arm.alias("arm")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(F.col("np") >= 14, 1)).alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("n_converted"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("n_converted"))).alias("cb"),
    )
    pa = F.col("ca").cast("double") / F.col("na")
    pb = F.col("cb").cast("double") / F.col("nb")
    pooled = (F.col("ca") + F.col("cb")).cast("double") / (
        F.col("na") + F.col("nb")
    )
    return wide.select(
        "na",
        "ca",
        "nb",
        "cb",
        dratio_round(F.col("ca").cast(DECZ), F.col("na").cast(DECZ)).alias(
            "rate_a"
        ),
        dratio_round(F.col("cb").cast(DECZ), F.col("nb").cast(DECZ)).alias(
            "rate_b"
        ),
        F.round(
            (pa - pb)
            / F.sqrt(
                pooled
                * (1 - pooled)
                * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
            ),
            4,
        ).alias("z_score"),
    ).orderBy("na")


@register(
    "q245",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             date_part('dow', o_orderdate) + 1 AS dow,
             {rev} AS revenue
      FROM orders GROUP BY d, dow
    ),
    per_dow AS (
      SELECT dow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CAST(revenue AS DECIMAL(30,10))) * 10000000000
                  AS HUGEINT) AS dow_rev_u
      FROM daily GROUP BY dow
    ),
    overall AS (
      SELECT CAST(SUM(CAST(revenue AS DECIMAL(30,10))) * 10000000000
                  AS HUGEINT) AS tot_u,
             CAST(COUNT(*) AS BIGINT) AS nd
      FROM daily
    )
    SELECT CAST(dow AS BIGINT) AS dow, n_days,
           {r1} AS avg_daily_rev,
           {r2} AS seasonality_idx
    FROM per_dow CROSS JOIN overall
    ORDER BY dow
    """.format(
        rev=sql_dsum("o_totalprice"),
        r1=sql_dratio_round("dow_rev_u", "n_days * 10000000000"),
        r2=sql_dratio_round("dow_rev_u * nd", "tot_u * n_days"),
    ),
    doc="Day-of-week seasonality index (B-C completion; the retail "
    "seasonality profile): average daily revenue per weekday divided "
    "by the overall daily average — index > 1 marks the heavy days a "
    "staffing/inventory plan keys on. Two-level structure: daily "
    "totals first (so a weekday with more calendar days isn't "
    "over-weighted — the classic dow-profile mistake of averaging "
    "raw rows), then the 7-row weekday rollup and a 1-row overall "
    "frame broadcast back. Both ratios are exact half-up integer "
    "divisions over 1e-10-unit accumulators (dratio_round, r10 "
    "float discipline — money/count ratios can terminate exactly on "
    ".5e-4 boundaries). Spark dayofweek ≡ DuckDB dow+1 (q62's "
    "convention note).",
)
def q245(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # r14 dup-scan fix (v2 probe: 2 orders scans): per_dow and overall
    # both re-ran the daily fold. Persist the tiny per-day frame.
    daily = _managed_persist(
        "q245_daily",
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.to_date("o_orderdate").alias("d"),
            F.dayofweek("o_orderdate").alias("dow"),
        )
        .agg(dsum("o_totalprice").alias("revenue")),
    )
    scale10 = F.lit(10**10).cast("decimal(11,0)")
    per_dow = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum(F.col("revenue").cast(DEC)) * scale10)
        .cast(DECZ)
        .alias("dow_rev_u"),
    )
    overall = daily.agg(
        (F.sum(F.col("revenue").cast(DEC)) * scale10)
        .cast(DECZ)
        .alias("tot_u"),
        F.count(F.lit(1)).alias("nd"),
    )
    return (
        per_dow.crossJoin(F.broadcast(overall))
        .select(
            F.col("dow").cast("bigint").alias("dow"),
            "n_days",
            dratio_round(
                F.col("dow_rev_u"),
                (F.col("n_days").cast(DECZ) * scale10).cast(DECZ),
            ).alias("avg_daily_rev"),
            dratio_round(
                (F.col("dow_rev_u") * F.col("nd").cast(DECZ)).cast(DECZ),
                (F.col("tot_u") * F.col("n_days").cast(DECZ)).cast(DECZ),
            ).alias("seasonality_idx"),
        )
        .orderBy("dow")
    )


@register(
    "q246",
    oracle="""
    WITH med AS (
      SELECT user_id, median(value) AS m FROM events GROUP BY user_id
    ),
    mad AS (
      SELECT e.user_id, median(abs(e.value - med.m)) AS mad
      FROM events e JOIN med USING (user_id) GROUP BY e.user_id
    )
    SELECT e.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (
             WHERE abs(e.value - med.m) > 3 * 1.4826 * mad.mad
           ) AS BIGINT) AS n_outliers
    FROM events e JOIN med USING (user_id) JOIN mad USING (user_id)
    GROUP BY e.user_id ORDER BY e.user_id
    """,
    doc="MAD-based robust outlier detection (B-D completion; the "
    "robust sibling of q142's rolling z-score — mean/stddev are "
    "themselves dragged by the outliers they hunt, median/MAD are "
    "not): per user, events beyond 3 × 1.4826 × MAD of the median "
    "(1.4826 scales MAD to σ under normality). Scale shape: three "
    "passes over the SAME user_id partitioning (median, MAD's "
    "median-of-deviations — an inherently two-pass statistic — then "
    "the flag count); medians are exact interpolated percentiles "
    "(per-group sort, q47's family; approx_percentile is the "
    "documented 100 TB swap). Both engines define even-n median as "
    "the middle-pair mean — one identical IEEE op chain, so the "
    "threshold compare is bit-stable.",
)
def q246(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    # ev feeds three branches (median, MAD, flag pass) and med feeds
    # two — 4 events scans in one plan without materialization
    # (scan-dup probe); the three-pass shape is inherent to MAD, the
    # re-scans are not.
    ev = _managed_persist(
        "q246_ev",
        load_table(spark, sf_dir, "events").select("user_id", "value"),
    )
    med = _managed_persist(
        "q246_med", ev.groupBy("user_id").agg(F.median("value").alias("m"))
    )
    mad = (
        ev.join(med, "user_id")
        .groupBy("user_id")
        .agg(F.median(F.abs(F.col("value") - F.col("m"))).alias("mad"))
    )
    flagged = (
        ev.join(med, "user_id")
        .join(mad, "user_id")
        .select(
            "user_id",
            (
                F.abs(F.col("value") - F.col("m"))
                > F.lit(3) * F.lit(1.4826) * F.col("mad")
            ).alias("is_out"),
        )
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("is_out"), 1)).alias("n_outliers"),
        )
        .orderBy("user_id")
    )


@register(
    "q288",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE h BETWEEN 0 AND 2) AS BIGINT)
             AS b_00_02,
           CAST(COUNT(*) FILTER (WHERE h BETWEEN 3 AND 5) AS BIGINT)
             AS b_03_05,
           CAST(COUNT(*) FILTER (WHERE h BETWEEN 6 AND 8) AS BIGINT)
             AS b_06_08,
           CAST(COUNT(*) FILTER (WHERE h BETWEEN 9 AND 11) AS BIGINT)
             AS b_09_11,
           CAST(COUNT(*) FILTER (WHERE h BETWEEN 12 AND 14) AS BIGINT)
             AS b_12_14,
           CAST(COUNT(*) FILTER (WHERE h BETWEEN 15 AND 17) AS BIGINT)
             AS b_15_17,
           CAST(COUNT(*) FILTER (WHERE h BETWEEN 18 AND 20) AS BIGINT)
             AS b_18_20,
           CAST(COUNT(*) FILTER (WHERE h BETWEEN 21 AND 23) AS BIGINT)
             AS b_21_23
    FROM (SELECT CAST(hour(ts) AS INT) AS h FROM events
          WHERE event_type IN ('click', 'view'))
    ORDER BY b_00_02
    """,
    doc="TPC-DS Q88 shape — the multi-timeband single-scan report: "
    "eight 3-hour traffic bands of click/view activity as ONE scan "
    "with eight conditional partial counts (the textbook spelling is "
    "eight self-joined subqueries — eight scans of a 100 TB fact "
    "table; the conditional-aggregation rewrite is THE classic "
    "many-bands optimization, and the type filter still pushes to "
    "the scan). Every band count is an exact mergeable integer "
    "partial; the result is one row wide, not eight plans deep.",
)
@plan_cache
def q288(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = F.hour("ts")

    def band(lo: int, hi: int, name: str):
        return F.count(F.when(h.between(lo, hi), 1)).alias(name)

    return (
        ev.where(F.col("event_type").isin("click", "view"))
        .agg(
            band(0, 2, "b_00_02"),
            band(3, 5, "b_03_05"),
            band(6, 8, "b_06_08"),
            band(9, 11, "b_09_11"),
            band(12, 14, "b_12_14"),
            band(15, 17, "b_15_17"),
            band(18, 20, "b_18_20"),
            band(21, 23, "b_21_23"),
        )
        .orderBy("b_00_02")
    )


@register(
    "q289",
    oracle=f"""
    WITH u AS (
      SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_epoch,
             {sql_units4('value')} AS units
      FROM events
    )
    SELECT event_id, user_id, ts_epoch,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
           CAST(CAST(SUM(units) OVER w AS BIGINT) AS DOUBLE) / 10000.0
             AS sum_7d
    FROM u
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_epoch
                 RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    doc="Time-interval RANGE window frame — each event's trailing "
    "7-DAY per-user activity (count + exact fixed-point sum), the "
    "event-time sibling of q44's numeric range frame and the "
    "windowed form of q164's rolling actives: a ROWS frame is wrong "
    "here (17 events in 7 days vs 17 rows are different questions), "
    "and RANGE over epoch seconds also gives tie-correct semantics "
    "(same-second events share a frame in both engines — no "
    "row-order dependence). Scale shape: ONE user_id exchange "
    "carries the window; the frame bound is value-based so Spark "
    "evaluates it with a sliding aggregate per partition, never a "
    "per-row rescan; epoch seconds are tz-free instants, FLOORED to "
    "whole seconds in both engines (Spark unix_timestamp truncates; "
    "a bare DuckDB CAST would round sub-second parts up). Values "
    "quantize to 1e-4 integer units AT INGEST (units4 — same IEEE op "
    "sequence both engines, the r11 .5e-4 ROUND-flake class stays "
    "closed) so the sliding frame sums LONGs in codegen, not the "
    "r11 DECIMAL(38) accumulator that cost ~2x wall; su/1e4 back to "
    "double is exact below 2^53 and the same IEEE divide both sides. "
    "Declared semantics: sum of 4-dp-quantized values.",
)
@plan_cache
def q289(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts").cast("bigint")
    u = ev.select(
        "event_id",
        F.col("user_id").cast("bigint").alias("user_id"),
        epoch.alias("ts_epoch"),
        units4("value").alias("units"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_epoch")
        .rangeBetween(-604800, 0)
    )
    return u.select(
        "event_id",
        "user_id",
        "ts_epoch",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_7d"),
        (F.sum("units").over(w).cast("double") / F.lit(10000.0)).alias(
            "sum_7d"
        ),
    ).orderBy("event_id")


@register(
    "q359",
    oracle=f"""
    WITH pr AS (
      SELECT l_partkey,
             CAST(SUM({sql_units4('l_extendedprice * (1 - l_discount)')})
                  AS BIGINT) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT CAST(SUM(rev) AS BIGINT) AS tot FROM pr),
    c AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS crev
      FROM pr
    ),
    abc AS (
      SELECT l_partkey, rev,
             CASE
               WHEN CAST(crev AS DOUBLE)
                    <= CAST(0.80 AS DOUBLE) * CAST(tot AS DOUBLE)
                 THEN 'A'
               WHEN CAST(crev AS DOUBLE)
                    <= CAST(0.95 AS DOUBLE) * CAST(tot AS DOUBLE)
                 THEN 'B'
               ELSE 'C'
             END AS abc_class
      FROM c, t
    ),
    bounds AS (
      SELECT MIN(CAST(l_shipdate AS DATE)) AS mn,
             CAST(date_diff('day', MIN(CAST(l_shipdate AS DATE)),
                            MAX(CAST(l_shipdate AS DATE))) // 7 + 1
                  AS BIGINT) AS nw
      FROM lineitem
    ),
    wk AS (
      SELECT l_partkey,
             CAST(date_diff('day', mn, CAST(l_shipdate AS DATE)) // 7
                  AS BIGINT) AS w,
             CAST(SUM({sql_units2('l_quantity')}) AS BIGINT) AS q
      FROM lineitem CROSS JOIN bounds GROUP BY 1, 2
    ),
    cv AS (
      SELECT l_partkey,
             CAST(SUM(q) AS DOUBLE) AS s,
             CAST(SUM(q * q) AS DOUBLE) AS ss
      FROM wk GROUP BY 1
    ),
    xyz AS (
      SELECT l_partkey,
             CASE
               WHEN SQRT((ss - s * s / nw) / (nw - 1)) / (s / nw) < 0.5
                 THEN 'X'
               WHEN SQRT((ss - s * s / nw) / (nw - 1)) / (s / nw) < 1.0
                 THEN 'Y'
               ELSE 'Z'
             END AS xyz_class
      FROM cv CROSS JOIN bounds
    )
    SELECT abc_class, xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(rev) AS DOUBLE)
                 / (SELECT CAST(tot AS DOUBLE) FROM t), 4) AS rev_share
    FROM abc JOIN xyz USING (l_partkey)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="ABC-XYZ inventory matrix: q167's cumulative-revenue ABC "
    "classes crossed with demand-variability XYZ classes (weekly "
    "demand coefficient of variation over the FULL week horizon — "
    "zero weeks contribute through the global week count, so "
    "sporadic parts are correctly Z, not X), the 9-cell planning "
    "matrix behind stocking policy (AX = automate, CZ = "
    "make-to-order).  Declared semantics: revenue is QUANTIZED AT "
    "INGEST to 1e-4 units (units4 — lossless, price*(1-disc) exact "
    "at 4 dp) and weekly demand to 1e-2 units (units2), so every "
    "fold and the cumulative window sum LONGs in codegen (r13 "
    "fixed-point port); unit scales cancel in the CV ratio and the "
    "revenue shares, and scale-0 casts are correctly rounded in "
    "both engines.  Scale shape: per-part revenue persisted and "
    "cumulated with q167's two-phase bucket discipline (oracle "
    "states the naive global window), weekly demand folds to "
    "(part, week) with map-side combine then to per-part moments, "
    "CV closed form with the implicit-zero-weeks identity, one "
    "part-keyed join, 9-row output.",
)
def q359(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    li_raw = load_table(spark, sf_dir, "lineitem")
    # One narrow projection feeds the ABC revenue fold AND the XYZ
    # week-grid/CV folds — without it the fact scanned 4x in one plan
    # (scan-dup probe). Per-row quantization order is unchanged.
    li = _managed_persist(
        "q359_lif",
        li_raw.select(
            "l_partkey",
            units4(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revu"),
            F.col("l_shipdate").cast("date").alias("sd"),
            units2(F.col("l_quantity")).alias("qu"),
        ),
    )
    pr = _managed_persist(
        "q359_part_rev",
        li.groupBy("l_partkey").agg(F.sum(F.col("revu")).alias("rev")),
    )
    bounds = pr.agg(
        F.expr(
            "percentile(CAST(rev AS DOUBLE), "
            "array(0.125,0.25,0.375,0.5,0.625,0.75,0.875))"
        ).alias("bs")
    )
    bucketed = pr.crossJoin(F.broadcast(bounds)).select(
        "l_partkey",
        "rev",
        F.expr("size(filter(bs, b -> b > CAST(rev AS DOUBLE)))").alias("bk"),
    )
    btot = bucketed.groupBy("bk").agg(F.sum("rev").alias("brev"))
    b2 = btot.select(F.col("bk").alias("bk2"), F.col("brev").alias("brev2"))
    offsets = (
        btot.join(b2, F.col("bk2") < F.col("bk"), "left")
        .groupBy("bk")
        .agg(F.sum("brev2").alias("offset"))
        .na.fill({"offset": 0})
    )
    tot = pr.agg(F.sum("rev").alias("tot"))
    w = Window.partitionBy("bk").orderBy(
        F.col("rev").desc(), F.col("l_partkey")
    )
    abc = (
        bucketed.join(F.broadcast(offsets), "bk")
        .withColumn("wsum", F.sum("rev").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "rev",
            "tot",
            F.when(
                (F.col("wsum") + F.col("offset")).cast("double")
                <= F.lit(0.80) * F.col("tot").cast("double"),
                "A",
            )
            .when(
                (F.col("wsum") + F.col("offset")).cast("double")
                <= F.lit(0.95) * F.col("tot").cast("double"),
                "B",
            )
            .otherwise("C")
            .alias("abc_class"),
        )
    )
    b = li.agg(
        F.min(F.col("sd")).alias("mn"),
        (
            F.floor(F.datediff(F.max(F.col("sd")), F.min(F.col("sd"))) / 7)
            + 1
        )
        .cast("bigint")
        .alias("nw"),
    )
    wk = (
        li.crossJoin(F.broadcast(b))
        .groupBy(
            "l_partkey",
            F.floor(F.datediff(F.col("sd"), F.col("mn")) / 7)
            .cast("bigint")
            .alias("w"),
        )
        .agg(F.sum(F.col("qu")).alias("q"))
    )
    cv = wk.groupBy("l_partkey").agg(
        F.sum(F.col("q")).cast("double").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("double").alias("ss"),
    )
    cv_expr = F.sqrt(
        (F.col("ss") - F.col("s") * F.col("s") / F.col("nw"))
        / (F.col("nw") - 1)
    ) / (F.col("s") / F.col("nw"))
    xyz = cv.crossJoin(F.broadcast(b)).select(
        "l_partkey",
        F.when(cv_expr < 0.5, "X")
        .when(cv_expr < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(
                F.sum("rev").cast("double")
                / F.any_value(F.col("tot")).cast("double"),
                4,
            ).alias("rev_share"),
        )
        .orderBy("abc_class", "xyz_class")
    )
