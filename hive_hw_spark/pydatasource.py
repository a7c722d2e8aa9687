"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference ingests telemetry by polling N slave nodes once per round
and collecting (round, slave, value) readings (master.ino:151-169: the
hourly poll loop; slave.ino:22,141: the reading itself). This module
re-expresses that ingest as a first-class Spark SOURCE instead of a
driver-side script: `spark.read.format("hw_telemetry")` plans one input
partition PER ROUND, so a 1000-round backfill fans out across the
cluster with no driver loop, and the streaming variant replays rounds
as micro-batches through the exact-once offset protocol.

Everything is deterministic (value = f(round, slave) — the same
xorshift-style mix both tests and docs can recompute), so the source is
also a reproducible load generator for the engine's own pipelines.

Scale notes: partition planning is metadata-only (no data on the
driver); each partition generates its own rows executor-side, which is
the pattern a real connector (HTTP poll, Kafka range, JDBC slice)
follows — `partitions()` returns key ranges, `read(partition)` pulls
only that slice. The streaming reader's `initialOffset`/`latestOffset`
contract gives exactly-once replay: offsets are round indices, and a
restarted query re-reads from the checkpointed round.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("round_id", LongType(), False),
        StructField("slave_id", IntegerType(), False),
        StructField("ts", LongType(), False),
        StructField("value", DoubleType(), False),
    ]
)

_EPOCH = 1_700_000_000  # fixed base so ts is deterministic
_PERIOD = 3600  # one round per hour (master.ino's hourly alarm, A17)


def reading(round_id: int, slave_id: int) -> float:
    """Deterministic fake reading: a 64-bit mix of (round, slave) mapped
    into [0, 100). Mirrors the role of the slave's sensor read
    (slave.ino:141) without hardware; pure function = replayable."""
    x = (round_id * 2654435761 + slave_id * 40503 + 12345) & 0xFFFFFFFF
    x ^= x >> 13
    x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    x ^= x >> 16
    return round((x % 100_000) / 1000.0, 3)


def _rows_for_round(round_id: int, n_slaves: int):
    ts = _EPOCH + round_id * _PERIOD
    for slave in range(n_slaves):
        yield (round_id, slave, ts, reading(round_id, slave))


@dataclass
class RoundPartition(InputPartition):
    round_id: int
    n_slaves: int


class TelemetryReader(DataSourceReader):
    def __init__(self, options):
        self.rounds = int(options.get("rounds", 24))
        self.slaves = int(options.get("slaves", 8))

    def partitions(self):
        # one partition per round: the unit of parallel ingest
        return [RoundPartition(r, self.slaves) for r in range(self.rounds)]

    def read(self, partition: RoundPartition):
        yield from _rows_for_round(partition.round_id, partition.n_slaves)


class TelemetryStreamReader(DataSourceStreamReader):
    """Micro-batch replay: offset = next round index to emit."""

    def __init__(self, options):
        self.slaves = int(options.get("slaves", 8))
        self.max_rounds = int(options.get("maxRounds", 5))
        self.rounds_per_batch = int(options.get("roundsPerBatch", 2))

    def initialOffset(self):
        return {"round": 0}

    def latestOffset(self):
        # a real connector would poll the upstream high-water mark; the
        # deterministic generator advances by roundsPerBatch per call,
        # capped at maxRounds so availableNow/tests terminate
        return {"round": self.max_rounds}

    def partitions(self, start, end):
        return [
            RoundPartition(r, self.slaves)
            for r in range(start["round"], min(end["round"], self.max_rounds))
        ]

    def read(self, partition: RoundPartition):
        yield from _rows_for_round(partition.round_id, partition.n_slaves)

    def commit(self, end):
        pass


class TelemetryDataSource(DataSource):
    """`spark.read.format("hw_telemetry")` / `spark.readStream.format(...)`."""

    @classmethod
    def name(cls) -> str:
        return "hw_telemetry"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return TelemetryReader(self.options)

    def streamReader(self, schema):
        return TelemetryStreamReader(self.options)


# ---------------------------------------------------------------------------
# Q283/Q284 — the WRITE side of the Python DataSource API: the reference's
# uplink (gateway.ino:84-119 serializes each round's readings and POSTs
# them upstream) as a first-class Spark SINK. Each task serializes its
# partition to a JSON-lines part file and returns a WriterCommitMessage;
# the driver's commit() publishes a manifest listing EXACTLY the
# committed parts — readers trust the manifest, so a failed/retried task
# (abort() path) can never leak half-written output into a read. The
# streaming variant writes one manifest per micro-batch (batch id in the
# name), which is the idempotent-retry contract q76b implements with
# foreachBatch, here moved INTO the connector.

import json
import os
import uuid

from pyspark.sql.datasource import (  # noqa: E402 (grouped with peers)
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class UplinkCommit(WriterCommitMessage):
    part_file: str
    n_rows: int


def _write_part(path_dir: str, it) -> UplinkCommit:
    """Serialize one partition's rows to a uniquely-named part file.
    Uniqueness (uuid) means a retried task writes a NEW file and the
    loser's orphan is simply never manifested — rename-free exactly-once
    on any filesystem with atomic create."""
    os.makedirs(path_dir, exist_ok=True)
    name = f"part-{uuid.uuid4().hex}.jsonl"
    full = os.path.join(path_dir, name)
    n = 0
    with open(full, "w") as f:
        for row in it:
            f.write(json.dumps(row.asDict()) + "\n")
            n += 1
    return UplinkCommit(part_file=name, n_rows=n)


class UplinkWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _write_part(self.path, iterator)

    def commit(self, messages):
        manifest = {
            "parts": sorted(m.part_file for m in messages),
            "rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        # unmanifested parts are invisible to readers; best-effort reap.
        # Failed tasks contribute None slots (writer-abort contract).
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.part_file))
            except OSError:
                pass


class UplinkStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _write_part(self.path, iterator)

    def commit(self, messages, batchId):
        manifest = {
            "batch": batchId,
            "parts": sorted(m.part_file for m in messages),
            "rows": sum(m.n_rows for m in messages),
        }
        with open(
            os.path.join(self.path, f"_MANIFEST-{batchId}"), "w"
        ) as f:
            json.dump(manifest, f)

    def abort(self, messages, batchId):
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.part_file))
            except OSError:
                pass


class UplinkDataSource(DataSource):
    """`df.write.format("hw_uplink").option("path", d)` /
    `df.writeStream.format("hw_uplink")` — manifest-committed JSONL."""

    @classmethod
    def name(cls) -> str:
        return "hw_uplink"

    def writer(self, schema, overwrite):
        return UplinkWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return UplinkStreamWriter(self.options)
