"""Sketch contracts for q140 (HLL merge) and q141 (bloom pruning).

q141's oracle row already proves end-to-end exactness (a false negative
would change the counts); these tests pin the sketch-level guarantees
the oracle can't see: bloom membership never false-negatives and its
false-positive rate is small, and HLL estimates (shard-merged AND
direct) stay within the advertised relative-error bound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_hw_spark.queries import all_queries
from hive_hw_spark.queries.joins import _Q141_SEEDS, _Q141_WORDS, _q141_pos_sql


def _build_bloom(keys_df, key_col):
    pos_array = ", ".join(_q141_pos_sql(key_col, s) for s in _Q141_SEEDS)
    pos = keys_df.selectExpr(f"explode(array({pos_array})) AS p").selectExpr(
        "CAST(p DIV 64 AS INT) AS w",
        "shiftleft(1L, CAST(p % 64 AS INT)) AS m",
    )
    return pos.agg(
        F.array(
            *[
                F.coalesce(
                    F.bit_or(F.when(F.col("w") == i, F.col("m"))), F.lit(0)
                )
                for i in range(_Q141_WORDS)
            ]
        ).alias("bloom")
    )


def _member_expr(key_col):
    return " AND ".join(
        f"(element_at(bloom, CAST({_q141_pos_sql(key_col, s)} DIV 64 AS INT) + 1)"
        f" & shiftleft(1L, CAST({_q141_pos_sql(key_col, s)} % 64 AS INT))) != 0"
        for s in _Q141_SEEDS
    )


def test_q141_bloom_no_false_negatives_and_low_fpr(spark):
    keys = spark.range(0, 300).select(F.col("id").alias("k"))
    bloom = _build_bloom(keys, "k")
    probes = (
        spark.range(0, 5000)
        .select(F.col("id").alias("k"))
        .crossJoin(F.broadcast(bloom))
        .withColumn("hit", F.expr(_member_expr("k")))
    )
    agg = probes.agg(
        F.sum(F.when((F.col("k") < 300) & ~F.col("hit"), 1).otherwise(0)).alias(
            "false_neg"
        ),
        F.sum(F.when((F.col("k") >= 300) & F.col("hit"), 1).otherwise(0)).alias(
            "false_pos"
        ),
        F.sum(F.when(F.col("k") >= 300, 1).otherwise(0)).alias("non_members"),
    ).collect()[0]
    assert agg.false_neg == 0, "bloom must never drop a true member"
    # 300 keys x 2 bits over 8192 -> ~7% fill, expected FPR ~0.5%
    assert agg.false_pos / agg.non_members < 0.05


def test_q140_hll_estimates_within_bound(spark, sf_dir):
    row = all_queries()["q140"].fn(spark, sf_dir).collect()[0]
    assert row.exact > 0
    assert abs(row.merged_est - row.exact) / row.exact <= 0.05
    assert abs(row.direct_est - row.exact) / row.exact <= 0.05


def test_q175_histogram_sketch_merges_across_shards(spark, sf_dir):
    """q175's mergeability claim, proven like q111b/q140: per-(group,bin)
    counts built on two disjoint shards SUM cell-wise to the
    whole-corpus histogram — the algebra that lets 1000 executors (or
    daily partitions, or micro-batches) each emit a 128-cell sketch
    and fold by plain addition, with the quantile read from the merged
    cells only."""
    from hive_hw_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    mm = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(128.0)
    binned = ev.crossJoin(F.broadcast(mm)).select(
        "event_id",
        "event_type",
        F.least(
            F.lit(127).cast("bigint"),
            F.floor((F.col("value") - F.col("lo")) / width).cast("bigint"),
        ).alias("bin"),
    )
    whole = {
        (r.event_type, r.bin): r.c
        for r in binned.groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    shard_a = binned.where(F.col("event_id") % 2 == 0)
    shard_b = binned.where(F.col("event_id") % 2 == 1)
    merged: dict = {}
    for shard in (shard_a, shard_b):
        for r in (
            shard.groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ):
            k = (r.event_type, r.bin)
            merged[k] = merged.get(k, 0) + r.c
    assert merged == whole


def test_q175_quantile_bins_contain_exact_quantiles(spark, sf_dir):
    """q175's error claim: the reported bin CONTAINS the exact quantile
    — i.e. the histogram estimate is off by at most one bin width."""
    from hive_hw_spark.catalog import load_table

    out = {r.event_type: r for r in all_queries()["q175"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    width = (hi - lo) / 128.0
    exact = {
        r.event_type: (r.p50, r.p95, r.p99)
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile_approx(value, 0.5, 100000)").alias("p50"),
            F.expr("percentile_approx(value, 0.95, 100000)").alias("p95"),
            F.expr("percentile_approx(value, 0.99, 100000)").alias("p99"),
        )
        .collect()
    }
    for et, row in out.items():
        for bin_attr, ex in zip(
            ("p50_bin", "p95_bin", "p99_bin"), exact[et]
        ):
            b = getattr(row, bin_attr)
            lo_edge = lo + b * width
            hi_edge = lo + (b + 1) * width
            assert lo_edge - width <= ex <= hi_edge + width, (
                et, bin_attr, b, ex, lo_edge, hi_edge,
            )
