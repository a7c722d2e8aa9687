"""Q207/Q208 — custom Python DataSource (Spark 4 pyspark.sql.datasource).

Contract: the batch source plans ONE partition per round (distributed
ingest, no driver loop) and yields the deterministic reading function;
the streaming source replays the same rows through the offset protocol
in bounded micro-batches, and batch ≡ stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_hw_spark.pydatasource import TelemetryDataSource, reading


def _register(spark):
    # re-registering the same name is fine — latest wins per session
    spark.dataSource.register(TelemetryDataSource)


def test_q207_batch_python_datasource_rows_and_partitioning(spark):
    _register(spark)
    df = (
        spark.read.format("hw_telemetry")
        .option("rounds", 6)
        .option("slaves", 4)
        .load()
    )
    assert df.schema.simpleString() == (
        "struct<round_id:bigint,slave_id:int,ts:bigint,value:double>"
    )
    rows = df.collect()
    assert len(rows) == 6 * 4
    # every (round, slave) cell present exactly once, value = reading()
    seen = {(r.round_id, r.slave_id): r.value for r in rows}
    assert len(seen) == 24
    assert seen[(3, 2)] == reading(3, 2)
    # one input partition per round: the fan-out contract
    nparts = (
        df.select(F.spark_partition_id().alias("p"), "round_id")
        .groupBy("p")
        .agg(F.countDistinct("round_id").alias("r"))
        .collect()
    )
    assert len(nparts) == 6
    assert all(row.r == 1 for row in nparts)


def test_q207_batch_source_filters_and_aggregates(spark):
    _register(spark)
    df = (
        spark.read.format("hw_telemetry")
        .option("rounds", 10)
        .option("slaves", 3)
        .load()
    )
    agg = (
        df.where(F.col("round_id") >= 5)
        .groupBy("slave_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("slave_id")
        .collect()
    )
    assert [(r.slave_id, r.n) for r in agg] == [(0, 5), (1, 5), (2, 5)]


def test_q208_stream_python_datasource_equals_batch(spark, tmp_path):
    _register(spark)
    out = []

    def sink(batch_df, batch_id):
        out.extend(batch_df.collect())

    q = (
        spark.readStream.format("hw_telemetry")
        .option("maxRounds", 5)
        .option("roundsPerBatch", 2)
        .option("slaves", 3)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    batch = (
        spark.read.format("hw_telemetry")
        .option("rounds", 5)
        .option("slaves", 3)
        .load()
        .collect()
    )
    key = lambda r: (r.round_id, r.slave_id)  # noqa: E731
    assert sorted((key(r), r.value) for r in out) == sorted(
        (key(r), r.value) for r in batch
    )


def test_q208_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once across restart: a second run against the SAME
    checkpoint must resume from the committed round offset — no round
    re-emitted, no round skipped — proving initialOffset is only used
    once and progress rides the checkpoint (the offset-protocol
    contract a real connector replay depends on)."""
    _register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = []

    def sink(df, _bid):
        out.extend(df.collect())

    def run(max_rounds):
        q = (
            spark.readStream.format("hw_telemetry")
            .option("maxRounds", max_rounds)
            .option("roundsPerBatch", 2)
            .option("slaves", 2)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    run(4)
    first = sorted((r.round_id, r.slave_id) for r in out)
    assert first == [(r, s) for r in range(4) for s in range(2)]
    # restart with a higher high-water mark: only rounds 4..7 may emit
    run(8)
    full = sorted((r.round_id, r.slave_id) for r in out)
    assert full == [(r, s) for r in range(8) for s in range(2)], full


def test_q283_uplink_batch_writer_manifest_commit(spark, tmp_path):
    """Q283: Python DataSource batch WRITER — per-task part files +
    driver-side manifest commit. The manifest must list exactly the
    committed parts and their total row count; re-reading ONLY
    manifested parts reproduces the written rows (the exactly-once
    read contract: orphans from retried tasks are invisible)."""
    import json
    import os

    from hive_hw_spark.pydatasource import UplinkDataSource

    spark.dataSource.register(UplinkDataSource)
    out = str(tmp_path / "uplink")
    df = spark.range(0, 100).selectExpr(
        "id AS round_id", "CAST(id % 7 AS INT) AS slave_id"
    ).repartition(4)
    df.write.format("hw_uplink").option("path", out).mode("append").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert manifest["rows"] == 100
    assert len(manifest["parts"]) == 4
    # every manifested part exists; reading them back restores the data
    rows = []
    for p in manifest["parts"]:
        with open(os.path.join(out, p)) as f:
            rows += [json.loads(line) for line in f]
    assert sorted(r["round_id"] for r in rows) == list(range(100))


def test_q284_uplink_stream_writer_batch_manifests(spark, tmp_path):
    """Q284: Python DataSource STREAMING writer — one manifest per
    micro-batch (the connector-side form of q76b's idempotent
    foreachBatch): every batch's manifest names its parts and row
    count, and the union of manifested parts reproduces the whole
    stream exactly once."""
    import json
    import glob
    import os
    import time

    from hive_hw_spark.pydatasource import (
        TelemetryDataSource,
        UplinkDataSource,
    )

    spark.dataSource.register(TelemetryDataSource)
    spark.dataSource.register(UplinkDataSource)
    out = str(tmp_path / "uplink_stream")
    q = (
        spark.readStream.format("hw_telemetry")
        .option("maxRounds", 6)
        .option("roundsPerBatch", 2)
        .option("slaves", 3)
        .load()
        .writeStream.format("hw_uplink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    manifests = sorted(glob.glob(os.path.join(out, "_MANIFEST-*")))
    assert len(manifests) >= 1
    seen = []
    for mf in manifests:
        m = json.load(open(mf))
        for p in m["parts"]:
            with open(os.path.join(out, p)) as f:
                seen += [json.loads(line) for line in f]
    # 6 rounds x 3 slaves, each exactly once across all batch manifests
    keys = sorted((r["round_id"], r["slave_id"]) for r in seen)
    assert keys == [(r, s) for r in range(6) for s in range(3)]
