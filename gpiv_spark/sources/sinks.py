"""Result sinks (SURVEY §2.1 S3-S5).

- ``export_vectors``: P4 ground transform + JSON rows matching the
  reference's vectors.json `[x0, y0, dx, dy]` (piv_functions.py:329-345).
- ``export_covariances``: ground transform + bias-ready covariance rows
  matching covariances.json `[[x, y], [[c00, c01], [c10, c11]]]`
  (piv_functions.py:348-375).
- ``write_raster``: S3 proper — single-band GeoTIFF bytes with the
  reference's exact artifact contract (rasters.py:21-43: LZW, nodata
  9999, affine from (ul, pixel_width, -pixel_height), EPSG geokey),
  via the from-scratch encoder in sources/geotiff.py. Driver-side by
  design: one output raster tile fits one writer, and the reference
  emits one file per raster.
- ``write_raster_tiles``: the distributed S3 variant — raster
  long-form -> partitioned parquet tiles + a JSON geo-transform
  sidecar, for rasters too large for one GeoTIFF writer.

JSON exports use Spark's distributed json writer; the files are
line-delimited JSON rows (one vector per line) rather than one array
literal — the reference's list-of-lists layout is preserved inside
each line for drop-in row compatibility.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gpiv_spark.functions.geocode import PIXEL, X0, Y1
from gpiv_spark.operators import piv_math


def ground_vectors(piv: DataFrame) -> DataFrame:
    """Pixel-space PIV rows -> ground vectors (P4 columns)."""
    g = piv_math.ground_export_exprs(
        "origin_x_px", "origin_y_px", "dx_px", "dy_px"
    )
    return piv.select(
        F.expr(g["origin_x"]).alias("origin_x"),
        F.expr(g["origin_y"]).alias("origin_y"),
        F.expr(g["dx"]).alias("dx"),
        F.expr(g["dy"]).alias("dy"),
        F.expr(g["end_x"]).alias("end_x"),
        F.expr(g["end_y"]).alias("end_y"),
        (F.col("c00") * F.expr(g["cov_scale"])).alias("c00"),
        (F.col("c01") * F.expr(g["cov_scale"])).alias("c01"),
        (F.col("c10") * F.expr(g["cov_scale"])).alias("c10"),
        (F.col("c11") * F.expr(g["cov_scale"])).alias("c11"),
    )


def export_vectors(piv: DataFrame, out_dir: str) -> None:
    """vectors.json rows: [x0, y0, dx, dy] (piv_functions.py:343-344)."""
    gv = ground_vectors(piv)
    gv.select(
        F.to_json(F.array("origin_x", "origin_y", "dx", "dy")).alias("value")
    ).write.mode("overwrite").text(out_dir)


def export_covariances(piv: DataFrame, out_dir: str) -> None:
    """covariances.json rows: [[x, y], [[c00, c01], [c10, c11]]]."""
    gv = ground_vectors(piv)
    gv.select(
        F.to_json(
            F.struct(
                F.array("end_x", "end_y").alias("loc"),
                F.array(
                    F.array("c00", "c01"), F.array("c10", "c11")
                ).alias("cov"),
            )
        ).alias("value")
    ).write.mode("overwrite").text(out_dir)


def write_raster(outname: str, array, ul: tuple[float, float],
                 pixel_width: float, pixel_height: float, epsg: int,
                 nodata: float = 9999.0) -> None:
    """S3: 2-D array -> GeoTIFF file, the reference's writer contract
    (rasters.py:21-43): ``ul`` is the upper-left model coordinate, the
    y pixel scale is negative (north-up), nodata defaults to 9999, LZW
    compression, EPSG embedded as a GeoKey. NaNs are encoded as the
    nodata value, exactly as the reference's gridded DEM/TPU arrays
    carry them."""
    import numpy as np

    from gpiv_spark.sources.geotiff import write_geotiff

    a = np.asarray(array, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("single-band 2-D array only")
    a = np.where(np.isnan(a), nodata, a)
    write_geotiff(
        outname, a,
        {
            "ul_x": float(ul[0]),
            "ul_y": float(ul[1]),
            "pixel_width": float(pixel_width),
            "pixel_height": float(pixel_height),
            "epsg": int(epsg),
            "nodata": float(nodata),
        },
    )


def write_raster_tiles(raster: DataFrame, out_dir: str, tile: int = 128,
                       ul_x: float = X0, ul_y: float = Y1,
                       pixel: float = PIXEL, epsg: int = 6344) -> None:
    """S3: long-form raster -> parquet partitioned by tile + geo sidecar.

    Partition pruning on (tile_r, tile_c) gives cheap windowed reads at
    scale; the sidecar carries the affine transform of rasters.py:25.
    """
    out = Path(out_dir)
    (
        # floor, not float-divide + truncating cast: truncation maps
        # rows -1..-(tile-1) into tile 0 alongside rows 0..tile-1, so a
        # window extended past the origin would prune to the WRONG tile
        # (the CLAUDE.md truncating-division trap)
        raster.withColumn("tile_r", F.floor(F.col("row") / tile).cast("int"))
        .withColumn("tile_c", F.floor(F.col("col") / tile).cast("int"))
        .write.mode("overwrite")
        .partitionBy("tile_r", "tile_c")
        .parquet(str(out / "tiles"))
    )
    out.mkdir(parents=True, exist_ok=True)
    (out / "geo.json").write_text(
        json.dumps(
            {
                "ul_x": ul_x,
                "ul_y": ul_y,
                "pixel_width": pixel,
                "pixel_height": pixel,
                "epsg": epsg,
                "nodata": 9999.0,
                "tile": tile,
            }
        )
    )
