"""B-B/B-D extension: data-quality and integrity audits.

Grounding: the reference polices its own feed — sentinel zeros for
missing readings (master.ino:153-164), per-slave completeness flags
before sleep (master.ino:158-168), and an error report listing nodes
that never answered (master.ino:552-574). Generalized: declarative
rule-violation counts (q112) and referential-integrity orphan counts
(q113) — the guardrail pass a 100 TB ingest runs before anything
expensive touches the data.

Scale notes: q112 is ONE scan with map-side-combinable conditional
sums (the oracle's UNION ALL of filtered counts is the declarative
mirror, not the plan); q113 is two anti-joins that shuffle only the
key columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_hw_spark.catalog import load_table
from hive_hw_spark.queries._util import (
    DECZ,
    dratio_round,
    sql_dratio_round,
)
from hive_hw_spark.queries import register

_TYPES = ("click", "view", "purchase", "signup", "error")
_TYPES_SQL = ", ".join(f"'{t}'" for t in _TYPES)


@register(
    "q112",
    oracle=f"""
    SELECT 'suspect_spike' AS rule,
           COUNT(*) FILTER (WHERE value > 150) AS violations FROM events
    UNION ALL
    SELECT 'value_negative', COUNT(*) FILTER (WHERE value < 0) FROM events
    UNION ALL
    SELECT 'bad_event_type',
           COUNT(*) FILTER (WHERE event_type NOT IN ({_TYPES_SQL}))
    FROM events
    UNION ALL
    SELECT 'sentinel_missing',
           COUNT(*) FILTER (WHERE nullif(value, 0) IS NULL) FROM events
    ORDER BY rule
    """,
    doc="Declarative data-quality audit: one row per rule with its "
    "violation count (range check, domain check, sentinel-missing "
    "check). The engine evaluates ALL rules in a single scan — "
    "conditional sums then stack() — where the oracle's UNION ALL "
    "mirror re-scans per rule; a zero-violation rule still yields its "
    "row, so the report shape is stable and the green-path is "
    "distinguishable from a skipped check.",
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    agg = ev.agg(
        cnt(F.col("value") > 150).alias("spike"),
        cnt(F.col("value") < 0).alias("neg"),
        cnt(~F.col("event_type").isin(*_TYPES)).alias("badtype"),
        cnt(F.nullif(F.col("value"), F.lit(0)).isNull()).alias("sentinel"),
    )
    return agg.select(
        F.expr(
            "stack(4,"
            " 'suspect_spike', spike,"
            " 'value_negative', neg,"
            " 'bad_event_type', badtype,"
            " 'sentinel_missing', sentinel) AS (rule, violations)"
        )
    ).orderBy("rule")


@register(
    "q113",
    oracle="""
    SELECT 'orders_without_customer' AS relation,
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS orphans
    UNION ALL
    SELECT 'orders_without_lineitem',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_orderkey = o.o_orderkey))
    ORDER BY relation
    """,
    doc="Referential-integrity audit: orphan counts per foreign-key "
    "relation via left-anti joins (the reference's 'nodes that never "
    "reported' report, master.ino:552-574, as set arithmetic). "
    "orders→lineitem is non-vacuous on this corpus (orders with no "
    "line items exist); orders→customer is the clean-path zero row. "
    "Anti joins shuffle key columns only; the dimension side "
    "broadcasts.",
)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    no_cust = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).alias("orphans"))
    no_li = o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").agg(
        F.count(F.lit(1)).alias("orphans")
    )
    return (
        no_cust.select(
            F.lit("orders_without_customer").alias("relation"), "orphans"
        )
        .unionByName(
            no_li.select(
                F.lit("orders_without_lineitem").alias("relation"), "orphans"
            )
        )
        .orderBy("relation")
    )


@register(
    "q263",
    oracle=f"""
    WITH kc AS (
      SELECT l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS total_rows FROM kc
    )
    SELECT CAST(suppkey AS BIGINT) AS suppkey, cnt,
           n_keys, total_rows,
           {sql_dratio_round('cnt * n_keys', 'total_rows')}
             AS skew_factor,
           {sql_dratio_round('cnt', 'total_rows')} AS share
    FROM kc CROSS JOIN s
    ORDER BY cnt DESC, suppkey LIMIT 5
    """,
    doc="Join-key skew diagnosis — per-key row counts of a shuffle key "
    "(l_suppkey) reduced to the top-5 heavy hitters with their "
    "skew factor (count / mean-per-key) and share of the table: the "
    "pre-flight report that decides whether a planned join needs "
    "salting (q143) or AQE skew splitting BEFORE the 100 TB shuffle "
    "runs, completing the ops-diagnostic surface next to q247's "
    "plan digest and q112's quality audit. Scale shape: one "
    "partial+final count on the key folds the fact table to "
    "|keys| rows; the two global scalars reduce from THAT frame "
    "(no second fact scan) and broadcast back; top-5 is a "
    "TakeOrdered, never a global sort.",
)
def q263(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_hw_spark.queries.llm_ops import _managed_persist

    li = load_table(spark, sf_dir, "lineitem")
    kc = _managed_persist(
        "q263_keycounts",
        li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
            F.count(F.lit(1)).alias("cnt")
        ),
    )
    s = kc.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
    )
    return (
        kc.crossJoin(F.broadcast(s))
        .select(
            F.col("suppkey").cast("bigint").alias("suppkey"),
            "cnt",
            "n_keys",
            "total_rows",
            dratio_round(
                (F.col("cnt") * F.col("n_keys")).cast(DECZ),
                F.col("total_rows").cast(DECZ),
            ).alias("skew_factor"),
            dratio_round(
                F.col("cnt").cast(DECZ), F.col("total_rows").cast(DECZ)
            ).alias("share"),
        )
        .orderBy(F.col("cnt").desc(), "suppkey")
        .limit(5)
    )
