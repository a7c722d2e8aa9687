"""Q230-Q232 — optimizer-feature contracts (the 100 TB planner levers).

These are plan-level behaviors, not result semantics: cost-based stats
feeding join strategy, dynamic partition pruning cutting a partitioned
scan at RUNTIME from the dim side's filter, and Spark's own runtime
bloom-filter injection (the built-in sibling of q141's hand-rolled
pre-shuffle filter). Each is asserted from the executed plan so a
regression in the engine's configuration (or an accidental conf change
in session.get_spark) fails loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def restore_conf(spark):
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtimeFilter.number.threshold",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    yield spark
    for k, v in saved.items():
        if v is not None:
            spark.conf.set(k, v)


def test_q230_cbo_statistics_recorded_and_queryable(spark):
    """Q230: ANALYZE TABLE COMPUTE STATISTICS records table- and
    column-level stats in the catalog — the input every cost-based
    decision (join strategy, build-side choice, AQE estimates) reads.
    At 100 TB, un-analyzed tables force the planner onto raw file
    sizes; this contract pins that the stats pipeline works."""
    spark.sql("DROP TABLE IF EXISTS q230_stats")
    spark.range(0, 5000).selectExpr(
        "id AS k", "CAST(id % 97 AS INT) AS grp"
    ).write.mode("overwrite").saveAsTable("q230_stats")
    spark.sql("ANALYZE TABLE q230_stats COMPUTE STATISTICS FOR ALL COLUMNS")
    desc = {
        str(r.col_name): str(r.data_type)
        for r in spark.sql("DESCRIBE EXTENDED q230_stats").collect()
    }
    assert "Statistics" in desc and "5000 rows" in desc["Statistics"]
    # column-level stats: distinct-count estimate for the group column
    col = spark.sql("DESCRIBE EXTENDED q230_stats grp").collect()
    colstats = {str(r.info_name): str(r.info_value) for r in col}
    assert colstats.get("distinct_count") not in (None, "NULL")
    spark.sql("DROP TABLE IF EXISTS q230_stats")


def test_q231_dynamic_partition_pruning_in_plan(spark, tmp_path):
    """Q231: joining a partitioned fact to a FILTERED dim must plan a
    dynamicpruning subquery on the fact's partition column — the
    runtime analog of q146's static pruning: the days to scan are not
    known until the dim filter runs, and DPP still skips the other
    partitions' files. At 100 TB this is the difference between
    reading 1/30 and 30/30 of a date-partitioned table."""
    fact_dir = str(tmp_path / "fact")
    dim_dir = str(tmp_path / "dim")
    spark.range(0, 20_000).selectExpr(
        "id", "CAST(id % 30 AS INT) AS day"
    ).write.partitionBy("day").parquet(fact_dir)
    spark.range(0, 30).selectExpr(
        "id AS day2", "CAST(id % 7 AS INT) AS grp"
    ).write.parquet(dim_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).where(F.col("grp") == 3)
    j = fact.join(dim, fact.day == dim.day2).groupBy("day").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the pruned result is right: days where day % 7 == 3
    days = sorted(r.day for r in j.collect())
    assert days == [d for d in range(30) if d % 7 == 3]


def test_q232_runtime_bloom_filter_injected(restore_conf, tmp_path):
    """Q232: Spark's runtime bloom-filter injection (the built-in form
    of q141's hand-rolled pre-shuffle pruning): a selective filter on
    one side of a shuffle join should inject might_contain(...) onto
    the other side's scan, dropping non-joinable rows BEFORE the
    exchange. Thresholds are forced down so the local-mode sizes
    qualify; the assertion is the filter's presence in the optimized
    plan."""
    spark = restore_conf
    a_dir = str(tmp_path / "a")
    b_dir = str(tmp_path / "b")
    spark.range(0, 200_000).selectExpr(
        "id AS k", "CAST(id % 1000 AS INT) AS tag"
    ).write.parquet(a_dir)
    spark.range(0, 200_000).selectExpr(
        "id AS k2", "CAST(id % 50 AS INT) AS grp"
    ).write.parquet(b_dir)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    a = spark.read.parquet(a_dir)
    b = spark.read.parquet(b_dir).where(F.col("grp") == 7)
    j = a.join(b, a.k == b.k2).groupBy("tag").count()
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom" in plan.lower() or "might_contain" in plan.lower(), (
        plan[:2000]
    )
