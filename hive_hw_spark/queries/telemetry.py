"""Q75 stateful gather-with-timeout — the reference's collection round.

Re-implements the master's gather loop as a custom stateful streaming
operator (`applyInPandasWithState`):

- The master polls its slaves each round until every one has reported or
  the 60 s budget expires (A26, master.ino:151-169; re-poll skips nodes
  that already answered, master.ino:218-220).
- A reading of 0.0 means "not received yet" — the sentinel-missing
  convention (A24, master.ino:162).
- On completion it serializes `{"H0001":{"w":<grams>},…}` with
  `ceil(kg*1000)` grams (A18/A14, master.ino:462-480,474).
- On budget breach it emits an ERROR record instead: partial payload plus
  per-node `p`/`s` status flags (A28, master.ino:552-574).

Engine mapping: group = (master_code, round_id); state = the partial
readings map; completion = fleet-set coverage; budget = a processing-time
timeout. Output is a `D` (data) or `E` (error) record per round — exactly
the two uplink message types the LoRa path prefixes (master_lora.ino:359,
417).

Scale notes: state is partitioned by group key across executors; each
group's state is a tiny dict (fleet-sized), so state-store pressure is
rows-in-flight × ~100 bytes. The gather function never sees more than one
group per call; RocksDB state store + changelog checkpointing is the
production posture for 10⁸ concurrent rounds.

Q75 is unit-tagged (SURVEY §2): no DuckDB analog exists for
processing-time timeouts; tests/test_telemetry.py drives a live two-batch
stream with an expiring round.
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator
from typing import Any

import pandas as pd

GATHER_OUTPUT_SCHEMA = (
    "master_code string, round_id long, record_type string, payload string,"
    " n_expected int, n_received int"
)
GATHER_STATE_SCHEMA = "readings string"


def _payload(
    readings: dict[str, float], expected: list[str], error: bool
) -> str:
    """The reference's uplink JSON. Data shape (master.ino:462-480):
    {"H0001":{"w":12345},...}; error shape (master.ino:552-574) adds the
    per-node ready-for-sleep/sleeping flags and w=0 for missing nodes."""
    body: dict[str, Any] = {}
    for node in sorted(set(expected) | set(readings)):
        w = readings.get(node)
        grams = int(math.ceil(w * 1000)) if w is not None else 0
        if error:
            got = 1 if w is not None else 0
            body[node] = {"w": grams, "p": got, "s": got}
        else:
            body[node] = {"w": grams}
    return json.dumps(body, sort_keys=True, separators=(",", ":"))


def _record(
    master_code: str,
    round_id: int,
    readings: dict[str, float],
    expected: list[str],
    error: bool,
) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "master_code": master_code,
                "round_id": round_id,
                "record_type": "E" if error else "D",
                "payload": _payload(readings, expected, error),
                "n_expected": len(expected),
                "n_received": len(readings),
            }
        ]
    )


def make_gather_fn(fleet: dict[str, list[str]], timeout_ms: int = 60_000):
    """Build the applyInPandasWithState function for a fleet registry
    (master_code → expected node codes). ``timeout_ms`` is the round
    budget — the reference's maxLoopMillis=60000 (master.ino:33)."""

    def gather(
        key: tuple[str, int],
        pdfs: Iterator[pd.DataFrame],
        state,  # pyspark.sql.streaming.state.GroupState
    ) -> Iterator[pd.DataFrame]:
        master_code, round_id = key
        expected = fleet.get(master_code, [])

        if state.hasTimedOut:
            readings = json.loads(state.get[0]) if state.exists else {}
            state.remove()
            yield _record(master_code, round_id, readings, expected, True)
            return

        readings: dict[str, float] = (
            json.loads(state.get[0]) if state.exists else {}
        )
        for pdf in pdfs:
            for node, w in zip(pdf["node_code"], pdf["weight_kg"]):
                # sentinel-zero = "not received yet" (A24); re-delivery of a
                # node that already reported is idempotent (A26 skip).
                if w is not None and w != 0.0 and node not in readings:
                    readings[node] = float(w)

        if set(expected) <= set(readings):
            if state.exists:
                state.remove()
            yield _record(master_code, round_id, readings, expected, False)
        else:
            state.update((json.dumps(readings, sort_keys=True),))
            state.setTimeoutDuration(timeout_ms)

    return gather


def gather_stream(readings_stream, fleet: dict[str, list[str]], timeout_ms: int = 60_000):
    """Wire the gather op onto a streaming DataFrame with columns
    (master_code string, round_id long, node_code string, weight_kg double).
    Returns the stream of D/E records."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return readings_stream.groupBy("master_code", "round_id").applyInPandasWithState(
        make_gather_fn(fleet, timeout_ms),
        outputStructType=GATHER_OUTPUT_SCHEMA,
        stateStructType=GATHER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def make_gather_fn_event_time(fleet: dict[str, list[str]], budget_s: int = 60):
    """Event-time variant of the gather: the round's budget is measured on
    the DATA clock (first reading's event time + budget, the reference's
    maxLoopMillis from round start, master.ino:33,130-145), and the
    timeout fires when the WATERMARK passes the deadline. Unlike the
    processing-time variant this is fully deterministic and replays
    identically from a checkpoint."""

    def gather(
        key: tuple[str, int],
        pdfs: Iterator[pd.DataFrame],
        state,  # pyspark.sql.streaming.state.GroupState
    ) -> Iterator[pd.DataFrame]:
        master_code, round_id = key
        expected = fleet.get(master_code, [])

        if state.hasTimedOut:
            readings_json, _deadline = (
                state.get if state.exists else ("{}", 0)
            )
            readings = json.loads(readings_json)
            state.remove()
            yield _record(master_code, round_id, readings, expected, True)
            return

        readings: dict[str, float] = {}
        deadline_ms = 0
        if state.exists:
            readings = json.loads(state.get[0])
            deadline_ms = int(state.get[1])
        for pdf in pdfs:
            for node, w, ts in zip(
                pdf["node_code"], pdf["weight_kg"], pdf["ts"]
            ):
                if deadline_ms == 0:
                    deadline_ms = (
                        int(pd.Timestamp(ts).value // 1_000_000)
                        + budget_s * 1000
                    )
                if w is not None and w != 0.0 and node not in readings:
                    readings[node] = float(w)

        if set(expected) <= set(readings):
            if state.exists:
                state.remove()
            yield _record(master_code, round_id, readings, expected, False)
        else:
            state.update((json.dumps(readings, sort_keys=True), deadline_ms))
            state.setTimeoutTimestamp(deadline_ms)

    return gather


def gather_stream_event_time(
    readings_stream, fleet: dict[str, list[str]], budget_s: int = 60
):
    """Event-time gather wiring: input must carry a watermarked ``ts``
    column; rounds expire when the watermark passes first_reading+budget."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return readings_stream.groupBy("master_code", "round_id").applyInPandasWithState(
        make_gather_fn_event_time(fleet, budget_s),
        outputStructType=GATHER_OUTPUT_SCHEMA,
        stateStructType="readings string, deadline long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
