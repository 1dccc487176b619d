"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke check on sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator Spark pipelines and
their DuckDB ANSI-SQL twins; definitions live in gpiv_spark.queries
(both sides rendered from one dialect-neutral template so they cannot
drift — see gpiv_spark/dialect.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship slice on /root/testdata/sf0.001 (SURVEY §7.1).

    documents -> deterministic geocode -> Z-order cell encode ->
    broadcast point-in-polygon join to ROI triangles -> GPIV tile
    assignment (G2) -> per-(cell, roi) counts with tile histogram.
    Exercises scan, JVM-side generated projections, broadcast spatial
    join with left-join NULL semantics (F4), and aggregation.
    """
    from pyspark.sql import functions as F

    from gpiv_spark.dialect import SPARK as d
    from gpiv_spark.functions import cells, geocode
    from gpiv_spark.operators import pip as pip_op
    from gpiv_spark.operators import tiling

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    x = geocode.x_expr(d, "doc_id")
    y = geocode.y_expr(d, "doc_id")
    geo = docs.select(
        "doc_id",
        F.expr(x).alias("x"),
        F.expr(y).alias("y"),
        F.expr(cells.zcell_expr(d, x, y, 4)).alias("cell_id"),
        F.expr(geocode.px_row_expr(d, y)).alias("px_row"),
        F.expr(geocode.px_col_expr(d, x)).alias("px_col"),
    )
    geo = tiling.assign_tiles(geo, tiling.PivConfig())
    roi = spark.createDataFrame(
        pip_op.roi_triangles(),
        "roi_id int, x1 double, y1 double, x2 double, y2 double, "
        "x3 double, y3 double",
    ).alias("r")
    pred = pip_op.inside_triangle_pred(
        "g.x", "g.y", {k: f"r.{k}" for k in ("x1", "y1", "x2", "y2", "x3", "y3")}
    )
    return (
        geo.alias("g")
        .join(F.broadcast(roi), F.expr(pred), "left")
        .groupBy("g.cell_id", "r.roi_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("g.tile_r").alias("min_tile_r"),
            F.max("g.tile_c").alias("max_tile_c"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gpiv_spark.queries import REGISTRY

    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from gpiv_spark.queries import REGISTRY

    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
