"""open_stream (hive_hw_spark/streams.py): the file double feeds a real
micro-batch pipeline; rate self-generates; kafka fails with a clear
message when the connector is absent; unknown kinds are rejected."""

from __future__ import annotations

import pytest

from hive_hw_spark.streams import open_stream


def test_file_kind_runs_a_pipeline(spark, tmp_path):
    from pyspark.sql import functions as F

    src = tmp_path / "in"
    out = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)], "id long, k long, v double"
    ).write.parquet(str(src))
    stream = open_stream(
        spark, "file", schema="id long, k long, v double", path=str(src)
    )
    assert stream.isStreaming
    (
        stream.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("adapter_file_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination(60)
    )
    got = {
        (r.k, r.n) for r in spark.sql("SELECT * FROM adapter_file_sink").collect()
    }
    assert got == {(0, 10), (1, 10), (2, 10)}
    _ = out, ckpt


def test_rate_kind_is_streaming(spark):
    df = open_stream(spark, "rate", rows_per_second=5)
    assert df.isStreaming
    assert set(df.columns) == {"timestamp", "value"}


def test_kafka_kind_raises_clear_error_without_connector(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        open_stream(spark, "kafka", servers="localhost:9092", topic="t")


def test_unknown_kind_rejected(spark):
    with pytest.raises(ValueError, match="unknown stream kind"):
        open_stream(spark, "smoke-signal")
