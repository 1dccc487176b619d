"""Stage checkpoints with per-partition lineage + metrics, and resume.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics written alongside checkpoints so any stage is
resumable" (BASELINE.json). The reference has no notion of this — its
only 'checkpoint' is re-reading its own JSON output for the bias pass
(piv_functions.py:379-391).

Design (batch pipelines; SURVEY §2.8 — no Structured Streaming needed):

- ``checkpoint(df, root, stage)`` writes the stage output as parquet
  under ``root/stage/data`` AND a lineage table under
  ``root/stage/lineage`` with one row per output partition:
  (partition_id, rows, checksum, wall_ms) plus a ``_SUCCESS_STAGE``
  marker containing the stage input fingerprint. The metrics come from
  ONE follow-up scan of the written parquet (write job + single lineage
  job — the scan doubles as a readability check of what was actually
  persisted); ``wall_ms`` is the stage's total write wall time stamped
  on every partition row, and the marker's total row count is folded
  out of the same lineage aggregate (no separate count job).
- ``resume_or_run(spark, root, stage, build)`` returns the
  checkpointed DataFrame when the marker matches the requested
  fingerprint, else calls ``build()``, checkpoints it, and returns the
  re-read — giving every stage at-most-once recompute semantics across
  driver restarts.

The checksum is an order-insensitive 64-bit mix of row hashes
(xor-fold), so partition-level integrity can be verified on resume
without assuming row order.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MARKER = "_SUCCESS_STAGE"


def _lineage_frame(df: DataFrame) -> DataFrame:
    """Per-partition row counts + order-insensitive checksums."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return (
        df.select(F.spark_partition_id().alias("partition_id"), h.alias("_h"))
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("rows"),
            # xor-fold: order-insensitive, overflow-free
            F.expr("bit_xor(_h)").alias("checksum"),
        )
    )


def checkpoint(df: DataFrame, root: str, stage: str,
               fingerprint: str = "") -> DataFrame:
    """Write data + lineage + marker; return the re-read DataFrame."""
    spark = df.sparkSession
    base = Path(root) / stage
    t0 = time.time()
    df.write.mode("overwrite").parquet(str(base / "data"))
    out = spark.read.parquet(str(base / "data"))
    wall_ms = (time.time() - t0) * 1000.0
    # one job: per-partition rows+checksums collected driver-side (tiny —
    # one row per partition), re-emitted as the lineage table, and summed
    # for the marker's total row count.
    lin_rows = _lineage_frame(out).withColumn("wall_ms", F.lit(wall_ms)).collect()
    spark.createDataFrame(
        lin_rows, "partition_id int, rows long, checksum long, wall_ms double"
    ).write.mode("overwrite").parquet(str(base / "lineage"))
    (base / MARKER).write_text(
        json.dumps(
            {
                "stage": stage,
                "fingerprint": fingerprint,
                "rows": sum(r["rows"] for r in lin_rows),
                "written_at_ns": time.time_ns(),
                "wall_ms": wall_ms,
            }
        )
    )
    return out


def is_complete(root: str, stage: str, fingerprint: str = "") -> bool:
    m = Path(root) / stage / MARKER
    if not m.exists():
        return False
    try:
        meta = json.loads(m.read_text())
    except (OSError, json.JSONDecodeError):
        return False
    return meta.get("fingerprint") == fingerprint


def resume_or_run(spark: SparkSession, root: str, stage: str,
                  build: Callable[[], DataFrame],
                  fingerprint: str = "") -> tuple[DataFrame, bool]:
    """(df, resumed). Skips the build when a matching checkpoint exists."""
    base = Path(root) / stage
    if is_complete(root, stage, fingerprint):
        return spark.read.parquet(str(base / "data")), True
    out = checkpoint(build(), root, stage, fingerprint)
    return out, False


def verify_lineage(spark: SparkSession, root: str, stage: str) -> bool:
    """Re-derive per-partition checksums from data; compare totals.

    Partitioning may differ on re-read, so the comparison is on the
    order-insensitive global aggregates (rows, checksum sum)."""
    base = Path(root) / stage
    data = spark.read.parquet(str(base / "data"))
    lin = spark.read.parquet(str(base / "lineage"))
    got = _lineage_frame(data).agg(
        F.sum("rows").alias("rows"), F.expr("bit_xor(checksum)").alias("checksum")
    ).collect()[0]
    want = lin.agg(
        F.sum("rows").alias("rows"), F.expr("bit_xor(checksum)").alias("checksum")
    ).collect()[0]
    return got["rows"] == want["rows"] and got["checksum"] == want["checksum"]
