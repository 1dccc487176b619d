"""Oracle-checked query registry.

Each entry pairs an idiomatic-Spark DataFrame pipeline with the DuckDB
ANSI-SQL twin the driver runs side-by-side (CORRECTNESS gate). Both
sides render their scalar math from the SAME dialect-neutral templates
in gpiv_spark.functions / gpiv_spark.operators, so they cannot drift.

Spark side conventions:
- pure pyspark.sql DataFrame ops + F.expr of generated expressions
  (JVM-side, whole-stage codegen — zero Python in these pipelines);
- every computed column aliased identically to the oracle SQL;
- inputs read from ``{sf_dir}/<table>.parquet``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpiv_spark.dialect import DUCKDB, SPARK
from gpiv_spark.functions import cells, geocode
from gpiv_spark.operators import tiling


@dataclass(frozen=True)
class Q:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> rows-only check


REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = Q(spark=fn, oracle=oracle)
        return fn

    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _geo_cols_spark() -> dict[str, str]:
    """Rendered Spark exprs for geocode + pixel coords of a document."""
    d = SPARK
    x = geocode.x_expr(d, "doc_id")
    y = geocode.y_expr(d, "doc_id")
    return {
        "x": x,
        "y": y,
        "px_col": geocode.px_col_expr(d, x),
        "px_row": geocode.px_row_expr(d, y),
    }


def _geo_cols_duck() -> dict[str, str]:
    d = DUCKDB
    x = geocode.x_expr(d, "doc_id")
    y = geocode.y_expr(d, "doc_id")
    return {
        "x": x,
        "y": y,
        "px_col": geocode.px_col_expr(d, x),
        "px_row": geocode.px_row_expr(d, y),
    }


# ---------------------------------------------------------------------------
# q_cells_zorder — geocode + S2-style Z-order cell encode + count per cell
# (SURVEY §4.2 "spatial cell encoding"; the engine's partition key)
# ---------------------------------------------------------------------------

_ZRES = 6  # 64x64 cells over the fixture extent

_zc_duck = cells.zcell_expr(
    DUCKDB, geocode.x_expr(DUCKDB, "doc_id"), geocode.y_expr(DUCKDB, "doc_id"), _ZRES
)


@register(
    "cells_zorder",
    f"""
    SELECT {_zc_duck} AS cell_id,
           count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents
    GROUP BY 1
    """,
)
def q_cells_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = SPARK
    zc = cells.zcell_expr(d, geocode.x_expr(d, "doc_id"), geocode.y_expr(d, "doc_id"), _ZRES)
    return (
        _docs(spark, sf_dir)
        .select(F.expr(zc).alias("cell_id"), "doc_id")
        .groupBy("cell_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ---------------------------------------------------------------------------
# q_cells_hex — H3-style axial hex encode (cube rounding) + count
# ---------------------------------------------------------------------------

_HRES = 10  # 65.91 m edge -> ~10 cells across the 478 m extent

_hq_duck, _hr_duck = cells.hex_qr_expr(
    DUCKDB, geocode.x_expr(DUCKDB, "doc_id"), geocode.y_expr(DUCKDB, "doc_id"), _HRES
)


@register(
    "cells_hex",
    f"""
    SELECT {_hq_duck} AS hq, {_hr_duck} AS hr, count(*) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_cells_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = SPARK
    hq, hr = cells.hex_qr_expr(
        d, geocode.x_expr(d, "doc_id"), geocode.y_expr(d, "doc_id"), _HRES
    )
    return (
        _docs(spark, sf_dir)
        .select(F.expr(hq).alias("hq"), F.expr(hr).alias("hr"))
        .groupBy("hq", "hr")
        .agg(F.count("*").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# q_tile_assign — GPIV displacement-grid tile assignment (G2/G3) per doc,
# aggregated per tile with the ground origin of each tile.
# ---------------------------------------------------------------------------

_CFG = tiling.PivConfig()  # template=100 step=50 scale=2 dim=478


def _tile_duck() -> str:
    d = DUCKDB
    g = _geo_cols_duck()
    tr = tiling.tile_k_expr(d, "px_row", _CFG)
    tc = tiling.tile_k_expr(d, "px_col", _CFG)
    return f"""
    WITH geo AS (
      SELECT doc_id, {g["px_row"]} AS px_row, {g["px_col"]} AS px_col
      FROM documents
    ), t AS (
      SELECT doc_id, CAST({tr} AS BIGINT) AS tile_r, CAST({tc} AS BIGINT) AS tile_c
      FROM geo
    )
    SELECT tile_r, tile_c,
           {tiling.origin_expr(d, "tile_r", _CFG)} AS origin_y,
           {tiling.origin_expr(d, "tile_c", _CFG)} AS origin_x,
           count(*) AS n_docs
    FROM t
    GROUP BY 1, 2
    """


@register("tile_assign", _tile_duck())
def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = SPARK
    g = _geo_cols_spark()
    geo = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(g["px_row"]).alias("px_row"),
        F.expr(g["px_col"]).alias("px_col"),
    )
    tr = tiling.tile_k_expr(d, "px_row", _CFG)
    tc = tiling.tile_k_expr(d, "px_col", _CFG)
    t = geo.select(
        F.expr(tr).cast("long").alias("tile_r"),
        F.expr(tc).cast("long").alias("tile_c"),
    )
    return (
        t.groupBy("tile_r", "tile_c")
        .agg(F.count("*").alias("n_docs"))
        .select(
            "tile_r",
            "tile_c",
            F.expr(tiling.origin_expr(d, "tile_r", _CFG)).alias("origin_y"),
            F.expr(tiling.origin_expr(d, "tile_c", _CFG)).alias("origin_x"),
            "n_docs",
        )
    )


# ---------------------------------------------------------------------------
# q_grid_gen — G1 regular grid generation over the fixture extent
# (run_test_v1.py:87-97 semantics: ceil/floor inset, half-cell centers).
# ---------------------------------------------------------------------------

_G_MARGIN, _G_CELL = 10, 1.0
import math as _math

_G_LO_X = _math.ceil(geocode.X0 + _G_MARGIN * _G_CELL)
_G_HI_X = _math.floor(geocode.X0 + geocode.EXTENT - _G_MARGIN * _G_CELL)
_G_LO_Y = _math.ceil(geocode.Y0 + _G_MARGIN * _G_CELL)
_G_HI_Y = _math.floor(geocode.Y0 + geocode.EXTENT - _G_MARGIN * _G_CELL)
_G_NX = max(0, _math.ceil((_G_HI_X - _G_LO_X) / _G_CELL))
_G_NY = max(0, _math.ceil((_G_HI_Y - _G_LO_Y) / _G_CELL))


@register(
    "grid_gen",
    f"""
    SELECT gy.i AS gy, gx.i AS gx,
           {_G_LO_X!r} + gx.i * {_G_CELL!r} + {_G_CELL / 2!r} AS x,
           {_G_LO_Y!r} + gy.i * {_G_CELL!r} + {_G_CELL / 2!r} AS y
    FROM (SELECT CAST(range AS BIGINT) AS i FROM range({_G_NY})) gy
    CROSS JOIN (SELECT CAST(range AS BIGINT) AS i FROM range({_G_NX})) gx
    """,
)
def q_grid_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = tiling.generate_grid(
        spark,
        geocode.X0,
        geocode.X0 + geocode.EXTENT,
        geocode.Y0,
        geocode.Y0 + geocode.EXTENT,
        _G_CELL,
        _G_MARGIN,
    )
    return grid.select("gy", "gx", "x", "y")


# ---------------------------------------------------------------------------
# q_bounds_intersect — J5: intersection of two epochs' bounds
# (run_test_v1.py:87-88: max of mins, min of maxes; epochs = doc_id parity).
# ---------------------------------------------------------------------------

_bi_x_duck = geocode.x_expr(DUCKDB, "doc_id")
_bi_y_duck = geocode.y_expr(DUCKDB, "doc_id")


@register(
    "bounds_intersect",
    f"""
    WITH geo AS (
      SELECT doc_id % 2 AS epoch, {_bi_x_duck} AS x, {_bi_y_duck} AS y
      FROM documents
    ), b AS (
      SELECT epoch, min(x) AS minx, max(x) AS maxx, min(y) AS miny, max(y) AS maxy
      FROM geo GROUP BY 1
    )
    SELECT max(minx) AS minx, min(maxx) AS maxx,
           max(miny) AS miny, min(maxy) AS maxy
    FROM b
    """,
)
def q_bounds_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = SPARK
    geo = _docs(spark, sf_dir).select(
        (F.col("doc_id") % 2).alias("epoch"),
        F.expr(geocode.x_expr(d, "doc_id")).alias("x"),
        F.expr(geocode.y_expr(d, "doc_id")).alias("y"),
    )
    b = geo.groupBy("epoch").agg(
        F.min("x").alias("minx"),
        F.max("x").alias("maxx"),
        F.min("y").alias("miny"),
        F.max("y").alias("maxy"),
    )
    return b.agg(
        F.max("minx").alias("minx"),
        F.min("maxx").alias("maxx"),
        F.max("miny").alias("miny"),
        F.min("maxy").alias("maxy"),
    )
