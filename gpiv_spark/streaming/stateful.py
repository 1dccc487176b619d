"""Custom stateful streaming operator: gap-based sessionization.

The batch engine sessionizes with window functions (queries_misc._SESS_SQL);
the streaming twin keeps one OPEN session per user in state and emits a
session row the moment it closes — either because a later event arrived
more than ``gap`` after it, or because the event-time watermark passed
its timeout. ``applyInPandasWithState`` is the Spark shape for stateful
operators the built-ins can't express (BASELINE north-rule: custom
stateful ops): state is a single compact tuple per key, events stream
through in Arrow batches, and the watermark bounds state size.

Cross-check: tests/test_streaming_stateful.py drives a bounded input
and compares the closed sessions against the batch sessionizer's output
on the same events — streaming and batch must agree exactly.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id long, start_ms long, n_events long, "
              "total_value double")
STATE_SCHEMA = "start_ms long, last_ms long, n_events long, total_value double"


def _make_session_fn(gap_ms: int):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if state.hasTimedOut:
            start, last, n, tot = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "start_ms": start,
                  "n_events": n, "total_value": tot}]
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        # event-time ms; within-batch order is not guaranteed
        ms = (rows["ts"].astype("int64") // 1_000_000).to_numpy()
        vals = rows["value"].to_numpy()
        order = ms.argsort(kind="stable")
        ms, vals = ms[order], vals[order]

        if state.exists:
            start, last, n, tot = state.get
        else:
            start = last = None
            n, tot = 0, 0.0
        closed = []
        for t, v in zip(ms, vals):
            if last is not None and t - last > gap_ms:
                closed.append((user_id, start, n, tot))
                start, n, tot = int(t), 0, 0.0
            if start is None:
                start = int(t)
            last = int(t)
            n += 1
            tot += float(v)
        deadline = last + gap_ms
        wm = state.getCurrentWatermarkMs()
        if deadline <= wm:
            # the event-time watermark already passed this group's gap
            # deadline (late/straggling group relative to global
            # progress): the session is closed by definition — emit it
            # now; a timeout in the past is illegal to register.
            closed.append((user_id, start, n, tot))
            state.remove()
        else:
            state.update((start, last, n, tot))
            # close the open session when the watermark passes last+gap
            state.setTimeoutTimestamp(deadline)
        if closed:
            yield pd.DataFrame(
                closed, columns=["user_id", "start_ms", "n_events",
                                 "total_value"]
            )

    return fn


def stream_sessionize(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "0 seconds") -> DataFrame:
    """events(user_id long, event_id long, ts timestamp, value double)
    [streaming] -> closed sessions (OUT_SCHEMA), append mode."""
    unit = gap.split()
    mult = {"seconds": 1_000, "second": 1_000, "minutes": 60_000,
            "minute": 60_000, "hours": 3_600_000, "hour": 3_600_000}
    gap_ms = int(unit[0]) * mult[unit[1]]
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_ms),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
