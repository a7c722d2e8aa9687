"""B-J UDF surface behavioral tests: pandas UDF ≡ built-in expression,
scrub on actually-dirty input, UDTF ≡ posexplode.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_hw_spark.queries.udfs import CAL_FACTOR, ZERO_FACTOR, calibrate_udf


def test_q80_udf_equals_builtin(spark, sf_dir):
    """The Arrow-batched calibration UDF is bit-identical to the codegen
    built-in expression (same IEEE ops)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(2000)
    both = ev.select(
        calibrate_udf()(F.col("value")).alias("udf_kg"),
        F.abs(F.col("value") / CAL_FACTOR - ZERO_FACTOR).alias("builtin_kg"),
    )
    assert both.filter(F.col("udf_kg") != F.col("builtin_kg")).count() == 0


def test_q83_scrub_removes_nonprintable(spark):
    """mapInPandas scrub keeps exactly bytes 32..126 (A23, master.ino:612)."""
    from hive_hw_spark.queries.udfs import _scrub

    rows = [
        (0, "clean text"),
        (1, "tab\there\nand\x07bell"),
        (2, "\x00\x01\x02"),
        (3, "mixed \x1b[0m ansi"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.clean
        for r in df.mapInPandas(_scrub, "doc_id long, clean string").collect()
    }
    assert got == {0: "clean text", 1: "tabhereandbell", 2: "", 3: "mixed [0m ansi"}


def test_q85_udtf_equals_posexplode(spark, sf_dir):
    """UDTF output matches the built-in posexplode(split()) rewrite."""
    from hive_hw_spark.queries import all_queries

    got = all_queries()["q85"].fn(spark, sf_dir)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).select("doc_id", "word", "pos")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_q223_udtf_schema_is_polymorphic(spark):
    """Q223's analyze() must resolve DIFFERENT schemas per call site from
    the literal mode argument — the property that distinguishes it from
    q85's fixed-schema UDTF."""
    from hive_hw_spark.queries import all_queries

    # registering the UDTF happens inside the query fn; invoke it once
    all_queries()["q223"].fn(spark, "/root/testdata/sf0.001")
    stats = spark.sql(
        "SELECT t.* FROM VALUES ('a b a') AS v(s), "
        "LATERAL q223_doctok(s, 'stats') t"
    )
    words = spark.sql(
        "SELECT t.* FROM VALUES ('a b a') AS v(s), "
        "LATERAL q223_doctok(s, 'words') t"
    )
    assert [f.name for f in stats.schema.fields] == ["n_tokens", "n_unique"]
    assert [f.name for f in words.schema.fields] == ["word"]
    assert stats.collect() == [(3, 2)]
    assert [r.word for r in words.collect()] == ["a", "b", "a"]


def test_q282_udtf_table_argument_partition_by(spark, sf_dir):
    """Q282: Python UDTF with a TABLE argument and PARTITION BY — the
    Spark 4 surface for whole-relation table functions (the engine
    routes each partition's rows through one UDTF instance, eval per
    row, terminate once per partition). A per-partition counter must
    see exactly the per-key row sets; ORDER BY inside the partition
    clause must fix the row order the UDTF observes."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="event_type string, n bigint, first_id bigint")
    class PerTypeStats:
        def __init__(self):
            self.t = None
            self.n = 0
            self.first = None

        def eval(self, row):
            self.t = row["event_type"]
            self.n += 1
            if self.first is None:
                self.first = row["event_id"]

        def terminate(self):
            yield self.t, self.n, self.first

    spark.udtf.register("per_type_stats", PerTypeStats)
    import os

    # deterministic subset: an unordered .limit(2000) is re-executed
    # independently by the UDTF query and the GROUP BY expectation and
    # may pick different rows. Filter on a stable key instead.
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).where(
        "event_id < 2000"
    ).createOrReplaceTempView("q282_events")
    got = {
        r.event_type: (r.n, r.first_id)
        for r in spark.sql(
            "SELECT * FROM per_type_stats("
            "TABLE(q282_events) PARTITION BY event_type ORDER BY event_id)"
        ).collect()
    }
    expect = {
        r.event_type: (r.n, r.first_id)
        for r in spark.sql(
            "SELECT event_type, COUNT(*) AS n, MIN(event_id) AS first_id "
            "FROM q282_events GROUP BY event_type"
        ).collect()
    }
    assert got == expect and len(got) >= 3
