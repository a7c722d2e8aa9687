"""Pipeline-metric observation (the df.observe API): production data-quality
telemetry that rides along with a real job instead of paying a second scan.
Complements the q112/q113 audit QUERIES (quality.py), which produce audit
result sets; observe() produces side-channel metrics from a query the
pipeline was already running."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_observe_metrics_ride_along_one_scan(spark, sf_dir):
    """A revenue aggregation instrumented with observe() yields the
    data-quality counters (row count, null keys, negative totals) from
    the SAME scan — no second pass — and the observed row count matches
    the input exactly."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    observed = o.observe(
        "qc",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "n_null_cust"
        ),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias(
            "n_negative"
        ),
    )
    agg = observed.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    rows = agg.collect()
    got = {r["o_orderstatus"]: r["n"] for r in rows}
    assert sum(got.values()) == o.count()
    # the observation is attached to the executed plan
    listener_metrics = agg._jdf.queryExecution().observedMetrics()
    m = listener_metrics.get("qc").get()
    assert m.getAs("n_rows") == o.count()
    assert m.getAs("n_null_cust") == 0
    assert m.getAs("n_negative") == 0
