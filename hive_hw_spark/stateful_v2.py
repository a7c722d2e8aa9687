"""Q147 — threshold-crossing alert detector on Spark 4's
``transformWithStateInPandas`` (the StatefulProcessor API that
supersedes ``applyInPandasWithState``; q75 keeps the legacy API so both
stateful surfaces are exercised).

Semantics (the alerting/monitoring staple no windowed aggregate can
express — emission depends on CUMULATIVE state, not on a frame): each
user's ``value``s accumulate across events and micro-batches; every time
the running total crosses another multiple of ``step`` the operator
emits one alert row per newly-crossed level. A restart from the same
checkpoint resumes the running totals — the unit test proves state
persistence across two separate ``availableNow`` runs.

Reference grounding: this is the reference's budget-breach uplink rule
(A28, master.ino:552-574 — "emit when the accumulated round total
trips the limit") generalized to repeated thresholds.

Environment note: executing the operator needs the python ``protobuf``
package (the transformWithState state-server protocol), which this
container does not ship — the semantics + restart-resume test in
tests/test_stateful_v2.py is skip-gated on its absence and activates
unchanged once the dependency exists; the plan-build/schema contract
test runs today. Same posture as the Kafka adapter (streams.py).

Scale notes: state per key is ONE (double, long) pair in the state
store (RocksDB in production), partitioned by user_id across executors;
rows only shuffle once to co-locate each key's events. Within a batch
the rows are folded in (ts, event_id) order so replays are
deterministic; output carries the crossing level, so downstream sinks
can dedupe idempotently on (user_id, level) — the q76b discipline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ALERT_OUTPUT_SCHEMA = "user_id bigint, level bigint, cum double"


class ThresholdAlertProcessor(StatefulProcessor):
    """Emit (user_id, level, cum) whenever the per-user running sum of
    ``value`` crosses ``level * step`` for a new integer level."""

    def __init__(self, step: float = 100.0):
        self._step = step

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "totals", "cum double, last_level bigint"
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        prior = self._state.get() if self._state.exists() else None
        cum = float(prior[0]) if prior is not None else 0.0
        last_level = int(prior[1]) if prior is not None else 0
        out: list[dict] = []
        for pdf in rows:
            # deterministic fold order regardless of batch row order
            pdf = pdf.sort_values(["ts_s", "event_id"])
            for v in pdf["value"]:
                cum += float(v)
                new_level = int(cum // self._step)
                while new_level > last_level:
                    last_level += 1
                    out.append(
                        {
                            "user_id": int(key[0]),
                            "level": last_level,
                            "cum": round(cum, 4),
                        }
                    )
        self._state.update((cum, last_level))
        if out:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def threshold_alert_stream(
    events: DataFrame, step: float = 100.0
) -> DataFrame:
    """Wire the processor onto a (streaming) events frame with columns
    user_id, event_id, ts_s, value."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ThresholdAlertProcessor(step),
        outputStructType=ALERT_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
