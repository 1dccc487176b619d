"""Streaming cell counts == batch cell counts on the same bounded input."""

import tempfile

import pyspark.sql.functions as F

from gpiv_spark.dialect import SPARK as d
from gpiv_spark.functions import cells, geocode
from gpiv_spark.streaming.ingest import run_to_memory, stream_cell_counts

SCHEMA = "doc_id long, event_time timestamp"


def test_stream_matches_batch(spark):
    with tempfile.TemporaryDirectory() as tmp:
        batch = spark.range(2_000).select(
            F.col("id").alias("doc_id"),
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(mins=(F.col("id") % 90).cast("int"))
             ).alias("event_time"),
        )
        batch.write.parquet(f"{tmp}/in")

        agg = stream_cell_counts(spark, f"{tmp}/in", SCHEMA, res=5)
        q = run_to_memory(agg, "t_cells")
        try:
            got = (
                spark.sql("SELECT cell_id, sum(n_docs) AS n FROM t_cells GROUP BY 1")
                .toPandas().set_index("cell_id").sort_index()
            )
        finally:
            q.stop()

        x = geocode.x_expr(d, "doc_id")
        y = geocode.y_expr(d, "doc_id")
        want = (
            batch.select(F.expr(cells.zcell_expr(d, x, y, 5)).alias("cell_id"))
            .groupBy("cell_id").count()
            .toPandas().set_index("cell_id").sort_index()
        )
        assert got["n"].sum() == 2_000
        assert (got["n"] == want["count"]).all()
