"""Q75 stateful gather: complete rounds emit data records, expired rounds
emit error records with per-node flags (A26/A28, master.ino:151-169 +
552-599). Drives a live processing-time-triggered stream so the
processing-time timeout actually fires.
"""

from __future__ import annotations

import json
import os
import time

from hive_hw_spark.queries.telemetry import gather_stream

FLEET = {"M0001": ["H0001", "H0002"], "M0002": ["H0003"]}
SCHEMA = "master_code string, round_id long, node_code string, weight_kg double"


def _write(dirpath: str, name: str, rows: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_q75_gather_complete_and_timeout(spark, tmp_path):
    src = str(tmp_path / "readings")
    # round 1 @ M0001: both nodes report (plus a 0.0 sentinel re-poll miss
    # and a duplicate delivery — both must be ignored); → D record.
    # round 2 @ M0001: only H0001 reports → must time out → E record.
    _write(
        src,
        "b1.json",
        [
            {"master_code": "M0001", "round_id": 1, "node_code": "H0001", "weight_kg": 32.07},
            {"master_code": "M0001", "round_id": 1, "node_code": "H0002", "weight_kg": 0.0},
            {"master_code": "M0001", "round_id": 1, "node_code": "H0002", "weight_kg": 12.5},
            {"master_code": "M0001", "round_id": 1, "node_code": "H0001", "weight_kg": 99.0},
            {"master_code": "M0001", "round_id": 2, "node_code": "H0001", "weight_kg": 31.9},
        ],
    )

    stream = spark.readStream.schema(SCHEMA).json(src)
    out = gather_stream(stream, FLEET, timeout_ms=2_000)
    q = (
        out.writeStream.format("memory")
        .queryName("q75_sink")
        .outputMode("update")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # wait for the complete round to land
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("q75_sink").count() >= 1:
                break
            time.sleep(0.5)
        # let the 2 s budget for round 2 expire, then feed an unrelated
        # batch so the engine keeps triggering (and M0002 completes).
        time.sleep(3)
        _write(
            src,
            "b2.json",
            [
                {"master_code": "M0002", "round_id": 1, "node_code": "H0003", "weight_kg": 9.9005},
            ],
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("q75_sink").count() >= 3:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    rows = {
        (r.master_code, r.round_id): r for r in spark.table("q75_sink").collect()
    }
    assert len(rows) == 3, f"expected 3 round records, got {rows}"

    done = rows[("M0001", 1)]
    assert done.record_type == "D"
    assert done.n_expected == 2 and done.n_received == 2
    # first delivery wins; sentinel 0.0 ignored; grams = ceil(kg*1000)
    assert json.loads(done.payload) == {
        "H0001": {"w": 32070},
        "H0002": {"w": 12500},
    }

    expired = rows[("M0001", 2)]
    assert expired.record_type == "E"
    assert expired.n_expected == 2 and expired.n_received == 1
    # error shape: partial data + per-node present flags (p/s), w=0 missing
    assert json.loads(expired.payload) == {
        "H0001": {"w": 31900, "p": 1, "s": 1},
        "H0002": {"w": 0, "p": 0, "s": 0},
    }

    m2 = rows[("M0002", 1)]
    assert m2.record_type == "D"
    assert json.loads(m2.payload) == {"H0003": {"w": 9901}}


def test_q75_event_time_gather_deterministic(spark, tmp_path):
    """Event-time variant: a round expires when the WATERMARK passes its
    first-reading+budget deadline — no wall-clock sleeps, deterministic
    and replayable."""
    import time as _time

    from hive_hw_spark.queries.telemetry import gather_stream_event_time

    src = str(tmp_path / "readings_et")
    t0 = _time.time() - 1000

    def w(name, rows, mt):
        _write(src, name, rows)
        os.utime(os.path.join(src, name), (mt, mt))

    schema_et = (
        "master_code string, round_id long, node_code string,"
        " weight_kg double, ts timestamp"
    )
    # round 1: complete → D. round 2: partial, first reading 10:00:00 →
    # deadline 10:01:00 (budget 60 s).
    w(
        "b1.json",
        [
            {"master_code": "M0001", "round_id": 1, "node_code": "H0001",
             "weight_kg": 32.07, "ts": "2024-01-01 10:00:00"},
            {"master_code": "M0001", "round_id": 1, "node_code": "H0002",
             "weight_kg": 12.5, "ts": "2024-01-01 10:00:10"},
            {"master_code": "M0001", "round_id": 2, "node_code": "H0001",
             "weight_kg": 31.9, "ts": "2024-01-01 10:00:00"},
        ],
        t0,
    )
    # buffer batch (watermark stats lag one batch — see test_streaming.py)
    w(
        "b2.json",
        [
            {"master_code": "M0002", "round_id": 9, "node_code": "H0003",
             "weight_kg": 9.9, "ts": "2024-01-01 10:03:00"},
        ],
        t0 + 10,
    )
    # a later event lifts the watermark past 10:01:00 → round 2 expires
    w(
        "b3.json",
        [
            {"master_code": "M0002", "round_id": 10, "node_code": "H0003",
             "weight_kg": 9.9, "ts": "2024-01-01 10:10:00"},
        ],
        t0 + 20,
    )

    stream = (
        spark.readStream.schema(schema_et)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .withWatermark("ts", "30 seconds")
    )
    out = gather_stream_event_time(stream, FLEET, budget_s=60)
    q = (
        out.writeStream.format("memory")
        .queryName("q75_et_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        (r.master_code, r.round_id): r
        for r in spark.table("q75_et_sink").collect()
    }
    assert rows[("M0001", 1)].record_type == "D"
    expired = rows[("M0001", 2)]
    assert expired.record_type == "E"
    assert expired.n_received == 1 and expired.n_expected == 2
    # M0002 rounds complete (fleet is just H0003)
    assert rows[("M0002", 9)].record_type == "D"
    assert rows[("M0002", 10)].record_type == "D"


def test_q75_gather_under_rocksdb_provider(spark, tmp_path):
    """The event-time gather runs unchanged on the RocksDB state store —
    the production provider for bounded-heap state at scale."""
    import time as _time

    from hive_hw_spark.queries.telemetry import gather_stream_event_time

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = str(tmp_path / "readings_rocks")
        _write(
            src,
            "b1.json",
            [
                {"master_code": "M0001", "round_id": 1, "node_code": "H0001",
                 "weight_kg": 32.07, "ts": "2024-01-01 10:00:00"},
                {"master_code": "M0001", "round_id": 1, "node_code": "H0002",
                 "weight_kg": 12.5, "ts": "2024-01-01 10:00:10"},
            ],
        )
        stream = (
            spark.readStream.schema(
                "master_code string, round_id long, node_code string,"
                " weight_kg double, ts timestamp"
            )
            .json(src)
            .withWatermark("ts", "30 seconds")
        )
        out = gather_stream_event_time(stream, FLEET, budget_s=60)
        q = (
            out.writeStream.format("memory")
            .queryName("q75_rocks_sink")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table("q75_rocks_sink").collect()
        assert len(rows) == 1
        assert rows[0].record_type == "D"
        assert json.loads(rows[0].payload) == {
            "H0001": {"w": 32070},
            "H0002": {"w": 12500},
        }
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
