"""ML data-preparation / feature-store operators (SURVEY §2 wave 49).

The supervised-learning half of the training-data story: the B-K waves
(llm_ops) curate pretraining corpora; these operators materialize
TABULAR training sets — churn-label feature tables, point-in-time-
correct (leakage-free) feature joins, and leakage-free categorical
target encoding.  Reference analog: none (telemetry firmware); the
grounding is the driver contract's training-pipeline mandate.

Shared discipline:
- Leakage is the product bug these ops exist to prevent: every feature
  derives from data STRICTLY BEFORE its label's observation point —
  enforced by cutoff filters (q332), exclusive window frames (q333),
  and leave-one-out exclusion (q334), stated identically in the oracle.
- Feature tables are corpus-cardinality OUTPUTS (one row per entity /
  label event) — that is the point; the plans stay one-pass with
  per-entity windows or broadcast encoding maps, never entity x entity.
- Float determinism: DECIMAL accumulators for every sum, per-row
  arithmetic in IEEE double, round(4) at the edge (_util discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_hw_spark.catalog import load_table

from . import plan_cache, register
from ._util import DEC

CUTOFF = "2001-02-01"


@register(
    "q332",
    oracle=f"""
    WITH pre AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                            DATE '{CUTOFF}') AS BIGINT) AS tenure_days,
             CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                            DATE '{CUTOFF}') AS BIGINT) AS recency_days,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10)))
                   AS DOUBLE), 2) AS total_spend
      FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '{CUTOFF}'
      GROUP BY o_custkey
    ),
    post AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE CAST(o_orderdate AS DATE) >= DATE '{CUTOFF}'
    )
    SELECT pre.o_custkey AS custkey, n_orders, tenure_days, recency_days,
           total_spend,
           CAST(CASE WHEN post.o_custkey IS NULL THEN 1 ELSE 0 END AS INT)
             AS churned
    FROM pre LEFT JOIN post ON pre.o_custkey = post.o_custkey
    ORDER BY custkey
    """,
    doc="Churn-label feature-table materialization — per customer, "
    "recency/frequency/tenure/monetary features computed ONLY from "
    "orders before the 2001-02-01 cutoff, labeled churned iff no "
    "order on/after it: the canonical supervised-learning table "
    "build, with the label-leakage guard (feature window < cutoff "
    "<= label window) structural in the plan, not a convention.  "
    "Scale shape: one filtered fold to per-customer features, one "
    "DISTINCT on the post-cutoff slice (both partial-combined), a "
    "single LEFT join on the entity key; output is one row per "
    "entity — a feature table, shuffled once on custkey.",
)
@plan_cache
def q332(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        "o_totalprice",
    )
    cut = F.lit(CUTOFF).cast("date")
    pre = (
        o.where(F.col("od") < cut)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.datediff(cut, F.min("od")).cast("long").alias("tenure_days"),
            F.datediff(cut, F.max("od")).cast("long").alias("recency_days"),
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 2
            ).alias("total_spend"),
        )
    )
    post = o.where(F.col("od") >= cut).select("o_custkey").distinct()
    return (
        pre.alias("pre")
        .join(
            post.withColumnRenamed("o_custkey", "pk").alias("post"),
            F.col("pre.o_custkey") == F.col("pk"),
            "left",
        )
        .select(
            F.col("pre.o_custkey").alias("custkey"),
            "n_orders",
            "tenure_days",
            "recency_days",
            "total_spend",
            F.when(F.col("pk").isNull(), 1).otherwise(0).cast("int")
            .alias("churned"),
        )
        .orderBy("custkey")
    )


@register(
    "q333",
    oracle="""
    WITH h AS (
      SELECT event_id, user_id, ts, event_type,
             CAST(COUNT(*) OVER w AS BIGINT) AS prior_events,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  OVER w AS BIGINT) AS prior_errors,
             CAST(date_diff('second', MIN(ts) OVER w, ts) AS BIGINT)
               AS tenure_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           COALESCE(prior_events, 0) AS prior_events,
           COALESCE(prior_errors, 0) AS prior_errors,
           COALESCE(tenure_s, 0) AS tenure_s
    FROM h WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
    doc="Point-in-time-correct feature join — for every 'purchase' "
    "label event, behavioral features (prior event count, prior "
    "error count, seconds since first activity) computed over the "
    "user's history STRICTLY BEFORE that event via an EXCLUSIVE "
    "frame (ROWS ... AND 1 PRECEDING): the as-of feature-store "
    "lookup that makes offline training match online serving — an "
    "inclusive frame here is silent label leakage.  Deterministic "
    "(ts, event_id) ordering.  Scale shape: ONE exchange on "
    "user_id carries all three window features (same spec, one "
    "sort); the label filter prunes AFTER feature computation "
    "(features need full history, labels are sparse) — one pass, "
    "no self-join, output one row per label event.",
)
@plan_cache
def q333(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    h = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.count(F.lit(1)).over(w).cast("long").alias("prior_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w)
        .cast("long")
        .alias("prior_errors"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.min("ts").over(w))
        ).cast("long").alias("tenure_s"),
    )
    return (
        h.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.coalesce("prior_events", F.lit(0)).alias("prior_events"),
            F.coalesce("prior_errors", F.lit(0)).alias("prior_errors"),
            F.coalesce("tenure_s", F.lit(0)).alias("tenure_s"),
        )
        .orderBy("event_id")
    )


@register(
    "q334",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,10))) AS DOUBLE)
               AS sx
      FROM orders GROUP BY o_orderpriority
    ),
    g AS (
      SELECT CAST(SUM(n) AS BIGINT) AS gn,
             CAST(SUM(CAST(sx AS DECIMAL(30,10))) AS DOUBLE) AS gs
      FROM s
    )
    SELECT o_orderkey AS orderkey, o.o_orderpriority AS priority,
           ROUND((s.n - 1) / (s.n - 1.0 + 10)
                 * ((s.sx - o.o_totalprice) / (s.n - 1))
                 + 10 / (s.n - 1.0 + 10) * (g.gs / g.gn), 4)
             AS loo_target_enc
    FROM orders o JOIN s ON o.o_orderpriority = s.o_orderpriority
    CROSS JOIN g
    ORDER BY orderkey
    """,
    doc="Leave-one-out target encoding with additive smoothing — each "
    "order's priority encoded as the category's mean target "
    "EXCLUDING the row itself ((sum - y_i)/(n - 1)), shrunk toward "
    "the global mean with m = 10 pseudo-observations: the standard "
    "high-cardinality categorical encoder, leakage-free by "
    "construction (naive target encoding memorizes each row's own "
    "label).  Scale shape: one fold to the |categories| sufficient-"
    "stat frame, one 1-row global fold, both BROADCAST back onto "
    "the fact scan — the encode itself is per-row arithmetic inside "
    "codegen, no second shuffle; output one row per training row.",
)
@plan_cache
def q334(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    s = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("sx"),
    )
    g = s.agg(
        F.sum("n").cast("long").alias("gn"),
        F.sum(F.col("sx").cast(DEC)).cast("double").alias("gs"),
    )
    n = F.col("n")
    loo = (n - 1) / (n - 1.0 + 10) * (
        (F.col("sx") - F.col("o_totalprice")) / (n - 1)
    ) + 10 / (n - 1.0 + 10) * (F.col("gs") / F.col("gn"))
    return (
        o.join(F.broadcast(s), "o_orderpriority")
        .crossJoin(F.broadcast(g))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderpriority").alias("priority"),
            F.round(loo, 4).alias("loo_target_enc"),
        )
        .orderBy("orderkey")
    )


@register(
    "q336",
    oracle="""
    WITH b AS (
      SELECT CAST(o_orderdate AS DATE) AS od FROM orders
    ),
    folds AS (
      SELECT * FROM (VALUES
        (1, DATE '1999-01-01', DATE '2000-01-01'),
        (2, DATE '2000-01-01', DATE '2001-01-01'),
        (3, DATE '2001-01-01', DATE '2002-01-01'))
        f(fold, train_end, test_end)
    )
    SELECT fold, CAST(train_end AS VARCHAR) AS train_end,
           CAST(test_end AS VARCHAR) AS test_end,
           CAST(SUM(CASE WHEN od < train_end THEN 1 ELSE 0 END)
             AS BIGINT) AS train_rows,
           CAST(SUM(CASE WHEN od >= train_end AND od < test_end
                    THEN 1 ELSE 0 END) AS BIGINT) AS test_rows
    FROM b CROSS JOIN folds
    GROUP BY fold, train_end, test_end ORDER BY fold
    """,
    doc="Expanding-window time-series cross-validation folds — three "
    "chronological folds (train strictly before each year boundary, "
    "test the following year) with per-fold train/test row counts: "
    "the temporal-CV assignment that replaces random k-fold when "
    "rows are time-ordered (random folds leak the future into "
    "training — the q332/q333 leakage discipline applied to "
    "evaluation).  Scale shape: ONE fact pass against a 3-row "
    "broadcast fold table; conditional counts combine map-side — "
    "the fold report costs one scan regardless of fold count.",
)
@plan_cache
def q336(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("od")
    )
    folds = spark.createDataFrame(
        [
            (1, "1999-01-01", "2000-01-01"),
            (2, "2000-01-01", "2001-01-01"),
            (3, "2001-01-01", "2002-01-01"),
        ],
        "fold int, train_end string, test_end string",
    ).select(
        "fold",
        F.col("train_end").cast("date").alias("te"),
        F.col("test_end").cast("date").alias("xe"),
    )
    return (
        o.crossJoin(F.broadcast(folds))
        .groupBy("fold", "te", "xe")
        .agg(
            F.sum(F.when(F.col("od") < F.col("te"), 1).otherwise(0))
            .cast("long")
            .alias("train_rows"),
            F.sum(
                F.when(
                    (F.col("od") >= F.col("te")) & (F.col("od") < F.col("xe")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("test_rows"),
        )
        .select(
            "fold",
            F.col("te").cast("string").alias("train_end"),
            F.col("xe").cast("string").alias("test_end"),
            "train_rows",
            "test_rows",
        )
        .orderBy("fold")
    )
