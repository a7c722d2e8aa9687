"""Uniform stream-source construction — the "one-line source swap".

The reference ingests from live radio links (nRF24 ack-payloads,
master.ino:234-257; LoRa packets, gateway.ino:51-66). The engine's
streaming pipelines are source-agnostic Structured Streaming graphs;
this module is the single place a deployment picks the transport, so
moving a pipeline from the file-backed test double to a real message
bus changes one ``kind`` argument and nothing downstream.

No broker exists in this container (ROADMAP #3), so the ``kafka`` kind
raises a clear error unless the connector is on the classpath; the
``file`` and ``rate`` kinds are fully functional and are what
tests/test_streaming.py pipelines run on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def open_stream(spark: SparkSession, kind: str, **opts) -> DataFrame:
    """Open a streaming DataFrame of the given ``kind``.

    - ``file``: ``opts`` = schema (DDL string or StructType), path,
      format (default parquet) — replayable, the test double.
    - ``rate``: ``opts`` = rows_per_second (default 10) — load-gen.
    - ``kafka``: ``opts`` = servers, topic, starting (default
      "earliest") — the production message bus; needs the
      spark-sql-kafka connector on the classpath.
    """
    if kind == "file":
        return (
            spark.readStream.schema(opts["schema"])
            .format(opts.get("format", "parquet"))
            .load(opts["path"])
        )
    if kind == "rate":
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", opts.get("rows_per_second", 10))
            .load()
        )
    if kind == "kafka":
        reader = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", opts["servers"])
            .option("subscribe", opts["topic"])
            .option("startingOffsets", opts.get("starting", "earliest"))
        )
        try:
            return reader.load()
        except Exception as e:
            # only claim "jar missing" when that is actually the failure;
            # any other load() error (bad option, version mismatch) must
            # surface as itself, not send the operator hunting a present jar
            msg = str(e)
            if (
                "DATA_SOURCE_NOT_FOUND" in msg
                or "Failed to find data source" in msg
                or "ClassNotFoundException" in msg
            ):
                raise RuntimeError(
                    "kafka source needs the spark-sql-kafka connector on "
                    "the classpath (not present in this container); run "
                    "the same pipeline on kind='file' for a replayable "
                    "test double"
                ) from e
            raise
    raise ValueError(f"unknown stream kind: {kind!r}")
