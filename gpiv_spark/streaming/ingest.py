"""Structured-Streaming ingest of document/event micro-batches.

The reference is strictly batch (SURVEY §2.8), so the engine's batch
pipelines don't depend on this — but a 10^12-doc table grows
continuously, and the natural Spark shape for "keep cell statistics
current as documents land" is a streaming aggregation:

    readStream(parquet dir) -> geocode -> Z-order cell
        -> withWatermark(event_time) -> windowed groupBy(cell).count()

All scalar math reuses the SAME dialect templates as the batch engine,
so streaming and batch results cannot drift. Late data is handled by
the watermark; exactly-once sinks go through foreachBatch + the
lineage checkpointer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpiv_spark.dialect import SPARK as d
from gpiv_spark.functions import cells, geocode


def stream_cell_counts(spark: SparkSession, input_dir: str, schema: str,
                       res: int = 6, watermark: str = "10 minutes",
                       window: str = "5 minutes") -> DataFrame:
    """Streaming per-cell doc counts over event-time windows."""
    docs = (
        spark.readStream.schema(schema).parquet(input_dir)
    )
    x = geocode.x_expr(d, "doc_id")
    y = geocode.y_expr(d, "doc_id")
    geo = docs.select(
        "doc_id",
        F.col("event_time"),
        F.expr(cells.zcell_expr(d, x, y, res)).alias("cell_id"),
    )
    return (
        geo.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "cell_id")
        .agg(F.count("*").alias("n_docs"), F.max("doc_id").alias("max_doc"))
    )


def run_to_memory(agg: DataFrame, name: str = "cell_counts",
                  output_mode: str = "complete"):
    """Drive a bounded input to completion synchronously (tests/smoke).

    BOUNDED inputs only: the default complete-mode memory sink retains
    every window ever seen in driver memory, and Spark ignores the
    watermark's state eviction entirely in complete mode — an unbounded
    stream must use ``output_mode="update"`` (or append) with a real
    sink, where the watermark actually bounds state.
    """
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q
