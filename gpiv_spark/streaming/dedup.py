"""Custom stateful streaming operator: exact-dedup with first-seen winner.

Batch exact dedup is a hash groupBy (queries_text.q_dedup_exact); on a
stream that grows forever the same question is "which doc arrived FIRST
with this content, and how many duplicates followed?". Spark's built-in
`dropDuplicates` on a stream keeps whichever row a microbatch happened
to deliver first and never reports duplicate counts, so this is an
`applyInPandasWithState` operator like streaming/stateful.py: state per
content key holds (first_doc by event time, event-time span, dup
count); the group closes — and emits its one summary row — when the
event-time watermark passes ``horizon`` beyond the group's newest
arrival. Bounded state at 10^12 docs: only groups still inside the
horizon are live, everything older has been emitted and dropped.

Grouping key here is the text itself (the gate fixture is small); the
100-TB deployment keys by ``xxhash64(text)`` so the shuffle carries an
int64, with the text length kept as a second key to make accidental
hash collisions visible.

Cross-check: the driver gate (queries_misc.q_stream_dedup) plants one
later-arriving duplicate for every third document and demands the
winner be the ORIGINAL doc_id and the counts match the plant — first
arrival decided by event time, not microbatch luck.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "first_doc long, n_docs long, len_chars long"
STATE_SCHEMA = ("first_doc long, first_ms long, last_ms long, "
                "n_docs long, len_chars long")


def _make_dedup_fn(horizon_ms: int):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            first_doc, _first_ms, _last_ms, n, lc = state.get
            state.remove()
            yield pd.DataFrame(
                [{"first_doc": first_doc, "n_docs": n, "len_chars": lc}]
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        ms = (rows["ts"].astype("int64") // 1_000_000).to_numpy()
        docs = rows["doc_id"].to_numpy()
        # batch winner: min (event_ms, doc_id) — arrival order within or
        # across microbatches must not matter
        b = min(zip(ms.tolist(), docs.tolist()))
        if state.exists:
            first_doc, first_ms, last_ms, n, lc = state.get
            if (b[0], b[1]) < (first_ms, first_doc):
                first_ms, first_doc = b
        else:
            first_ms, first_doc = b
            last_ms, n = 0, 0
            lc = len(key[0])
        n += len(rows)
        last_ms = max(last_ms, int(ms.max()))
        deadline = last_ms + horizon_ms
        wm = state.getCurrentWatermarkMs()
        if deadline <= wm:
            # watermark already beyond this group's horizon: closed by
            # definition (cf. stateful.py's late-group path)
            state.remove()
            yield pd.DataFrame(
                [{"first_doc": first_doc, "n_docs": n, "len_chars": lc}]
            )
        else:
            state.update((first_doc, first_ms, last_ms, n, lc))
            state.setTimeoutTimestamp(deadline)

    return fn


def stream_dedup_first(docs: DataFrame, horizon: str = "1 hour",
                       watermark: str = "0 seconds") -> DataFrame:
    """docs(doc_id long, text string, ts timestamp) [streaming] ->
    one (first_doc, n_docs, len_chars) row per distinct text, emitted
    when the watermark passes the group's newest arrival + horizon."""
    unit = horizon.split()
    mult = {"seconds": 1_000, "second": 1_000, "minutes": 60_000,
            "minute": 60_000, "hours": 3_600_000, "hour": 3_600_000}
    horizon_ms = int(unit[0]) * mult[unit[1]]
    return (
        docs.withWatermark("ts", watermark)
        .groupBy("text")
        .applyInPandasWithState(
            _make_dedup_fn(horizon_ms),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
