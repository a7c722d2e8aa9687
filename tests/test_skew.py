"""Skew mitigation patterns (100 TB posture): salting a hot join key.

AQE's skew-join splitting handles sort-merge skew automatically (enabled
in session.py); manual salting is the fallback for broadcast-ineligible
skew and for aggregations. This test proves the rewrite is semantically
transparent: salted join ≡ plain join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SALTS = 8


def test_salted_join_equals_plain_join(spark):
    # heavily skewed fact: 95% of rows share one key
    fact = spark.range(50_000).select(
        F.when(F.col("id") % 20 != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
        .alias("key"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", i + 2) for i in range(100)],
        "key string, dim_val int",
    )

    plain = fact.join(dim, "key").groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dim_val").alias("s")
    )

    # salted rewrite: fact rows scatter across SALTS sub-keys; the dim side
    # replicates once per salt — per-key parallelism × SALTS
    salted_fact = fact.withColumn("salt", F.pmod(F.hash("fact_id"), F.lit(SALTS)))
    salted_dim = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALTS)]))
    )
    salted = (
        salted_fact.join(salted_dim, ["key", "salt"])
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dim_val").alias("s"))
    )

    p = {r.key: (r.n, r.s) for r in plain.collect()}
    s = {r.key: (r.n, r.s) for r in salted.collect()}
    assert p == s
    assert p["hot"][0] == 47_500  # the hot key really is hot
