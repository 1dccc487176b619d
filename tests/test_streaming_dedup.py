"""Stateful streaming first-seen dedup: event-time winner, dup counts.

Drives the operator with duplicates arriving in a LATER microbatch than
their originals (and one pair reversed: dup text arrives first in
batch 1, original earlier by event time in the same batch) so the
first-seen choice must come from event time, not arrival order.
"""

import shutil
import tempfile
from pathlib import Path

import pandas as pd

from gpiv_spark.streaming.dedup import stream_dedup_first

SCHEMA = "doc_id long, text string, ts timestamp"


def _run(spark, batches):
    work = Path(tempfile.mkdtemp(prefix="sdedup_"))
    try:
        indir = work / "in"
        indir.mkdir()
        first, *rest = batches
        spark.createDataFrame(first, SCHEMA).coalesce(2).write.mode(
            "overwrite"
        ).parquet(str(indir))
        stream = spark.readStream.schema(SCHEMA).parquet(str(indir))
        q = (
            stream_dedup_first(stream, horizon="1 hour")
            .writeStream.outputMode("append").format("memory")
            .queryName("sdedup_test")
            .option("checkpointLocation", str(work / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        for b in rest:
            spark.createDataFrame(b, SCHEMA).write.mode("append").parquet(
                str(indir)
            )
            q.processAllAvailable()
        got = spark.table("sdedup_test").toPandas()
        q.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return got


def test_first_seen_by_event_time_and_counts(spark):
    t0 = pd.Timestamp("2026-01-01")
    s = lambda sec: (t0 + pd.Timedelta(seconds=sec)).to_pydatetime()
    batch1 = [
        (1, "alpha", s(10)),
        (2, "beta", s(20)),
        # 'gamma': doc 30 has the LATER event time but would win on
        # arrival order within the batch file; doc 3 must win
        (30, "gamma", s(35)),
        (3, "gamma", s(30)),
    ]
    batch2 = [
        (11, "alpha", s(100)),   # later duplicate of doc 1
        (12, "alpha", s(110)),   # and another
        (4, "delta", s(120)),
    ]
    flush = [(-1, "__flush__", (t0 + pd.Timedelta(days=400)).to_pydatetime())]
    got = _run(spark, [batch1, batch2, flush])
    got = got[got["first_doc"] >= 0]
    by_first = {
        int(r.first_doc): (int(r.n_docs), int(r.len_chars))
        for r in got.itertuples()
    }
    assert by_first == {
        1: (3, 5),   # alpha: docs 1, 11, 12
        2: (1, 4),   # beta
        3: (2, 5),   # gamma: event-time winner is doc 3
        4: (1, 5),   # delta
    }


def test_hashed_and_text_keys_agree(spark):
    """Default (xxhash64, length) int64 state keys produce exactly the
    raw-text-keyed output on a collision-free fixture."""
    t0 = pd.Timestamp("2026-01-01")
    s = lambda sec: (t0 + pd.Timedelta(seconds=sec)).to_pydatetime()
    batch1 = [(i, f"text-{i % 5}", s(i)) for i in range(1, 16)]
    flush = [(-1, "__flush__", (t0 + pd.Timedelta(days=400)).to_pydatetime())]

    def run(key_by_text):
        work = Path(tempfile.mkdtemp(prefix="sdedup_k_"))
        try:
            indir = work / "in"
            spark.createDataFrame(batch1, SCHEMA).coalesce(2).write.mode(
                "overwrite"
            ).parquet(str(indir))
            stream = spark.readStream.schema(SCHEMA).parquet(str(indir))
            name = f"sdedup_k_{int(key_by_text)}"
            q = (
                stream_dedup_first(stream, horizon="1 hour",
                                   key_by_text=key_by_text)
                .writeStream.outputMode("append").format("memory")
                .queryName(name)
                .option("checkpointLocation", str(work / "ckpt"))
                .start()
            )
            q.processAllAvailable()
            spark.createDataFrame(flush, SCHEMA).write.mode("append").parquet(
                str(indir)
            )
            q.processAllAvailable()
            got = spark.table(name).toPandas()
            q.stop()
        finally:
            shutil.rmtree(work, ignore_errors=True)
        return got[got["first_doc"] >= 0].sort_values("first_doc").reset_index(
            drop=True
        )

    pd.testing.assert_frame_equal(run(False), run(True))
