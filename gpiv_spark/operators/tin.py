"""Distributed TIN interpolation + error propagation (SURVEY §2 J1-J3,
P1-P3, P5, E3, F4).

Physical plan (tin_interpolation.py:35-58, re-expressed for Spark):

1. points and grid cells are encoded to Z-order cells (the engine's
   partition key);
2. points are fanned out to their cell AND its 8 neighbors (the halo:
   one full cell ring — local Delaunay is correct wherever the
   containing triangle's circumcircle fits inside the halo, SURVEY
   §7.3; cell size is chosen >= a few mean point spacings);
3. ``groupBy(cell).cogroup(...).applyInPandas`` pairs each cell's
   grid points with its haloed point set; the kernel runs the
   from-scratch Bowyer-Watson (J1), containment query (J2,
   find_simplex == -1 -> NaN row, F4), vertex gather (J3), centroid
   conditioning (P1), plane coeffs (P2), interpolation (P3), partial
   derivatives (P5) and the block-diagonal quadratic form (E3) — all
   vectorized NumPy, one Python call per cell.

Skew: the fan-out is bounded (9x) and cells are equal-area; hot cells
(doc clustering) are split by the optional salt on the grid side.
At 100 TB the shuffle carries (cell, x, y, z, 6 tpu) doubles only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpiv_spark.functions import delaunay as dl
from gpiv_spark.functions.cells import numpy_zcell, zcell_expr
from gpiv_spark.dialect import SPARK as SD

TIN_SCHEMA = (
    "grid_id long, x double, y double, zp double, var_zp double, found boolean"
)

TPU_COLS = ["var_x", "var_y", "var_z", "cov_xy", "cov_xz", "cov_yz"]


def tin_numpy(points: np.ndarray, tpu: np.ndarray, grids: np.ndarray,
              centroid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference math on one point set: returns (zp, var_zp, found).

    points (n,3), tpu (n,6) fixed order, grids (m,2), centroid (3,).
    Formula twins of operators.tin_math (validated cross-engine) —
    vectorized over grid points.
    """
    m = len(grids)
    zp = np.full(m, np.nan)
    var = np.full(m, np.nan)
    found = np.zeros(m, dtype=bool)
    if len(points) < 3 or m == 0:
        return zp, var, found

    tri = dl.delaunay(points[:, :2])
    if len(tri) == 0:
        return zp, var, found
    fs = dl.find_simplex(points[:, :2], tri, grids)
    ok = fs >= 0
    if not ok.any():
        return zp, var, found
    t = tri[fs[ok]]

    pv = points - centroid  # P1 centroid conditioning
    g = grids[ok] - centroid[:2]
    x1, y1, z1 = pv[t[:, 0], 0], pv[t[:, 0], 1], pv[t[:, 0], 2]
    x2, y2, z2 = pv[t[:, 1], 0], pv[t[:, 1], 1], pv[t[:, 1], 2]
    x3, y3, z3 = pv[t[:, 2], 0], pv[t[:, 2], 1], pv[t[:, 2], 2]
    xp, yp = g[:, 0], g[:, 1]

    # P2 (tin_interpolation.py:125-141)
    A = y1 * z3 - y1 * z2 + y2 * z1 - y2 * z3 + y3 * z2 - y3 * z1
    B = x1 * z2 - x1 * z3 + x2 * z3 - x2 * z1 + x3 * z1 - x3 * z2
    C = x1 * y2 - x1 * y3 + x2 * y3 - x2 * y1 + x3 * y1 - x3 * y2
    D = (x1 * y2 * z3 - x1 * y3 * z2 + x2 * y3 * z1 - x2 * y1 * z3
         + x3 * y1 * z2 - x3 * y2 * z1)

    # P3 (tin_interpolation.py:185-211)
    zp[ok] = (A / C) * xp + (B / C) * yp + D / C + centroid[2]

    # P5 (tin_interpolation.py:88-119)
    C2 = C * C
    E = xp * A + yp * B + D
    d = np.empty((ok.sum(), 9))
    d[:, 0] = ((y3 - y2) * E + ((z2 - z3) * yp + (y2 * z3 - y3 * z2)) * C) / C2
    d[:, 3] = ((y1 - y3) * E + ((z3 - z1) * yp + (y3 * z1 - y1 * z3)) * C) / C2
    d[:, 6] = ((y2 - y1) * E + ((z1 - z2) * yp + (y1 * z2 - y2 * z1)) * C) / C2
    d[:, 1] = ((x2 - x3) * E + ((z3 - z2) * xp + (x3 * z2 - x2 * z3)) * C) / C2
    d[:, 4] = ((x3 - x1) * E + ((z1 - z3) * xp + (x1 * z3 - x3 * z1)) * C) / C2
    d[:, 7] = ((x1 - x2) * E + ((z2 - z1) * xp + (x2 * z1 - x1 * z2)) * C) / C2
    d[:, 2] = ((y2 - y3) * xp + (x3 - x2) * yp + (x2 * y3 - x3 * y2)) / C
    d[:, 5] = ((y3 - y1) * xp + (x1 - x3) * yp + (x3 * y1 - x1 * y3)) / C
    d[:, 8] = ((y1 - y2) * xp + (x2 - x1) * yp + (x1 * y2 - x2 * y1)) / C

    # E3 block-diagonal quadratic form (tin_interpolation.py:146-181)
    v = np.zeros(ok.sum())
    for k in range(3):
        tp = tpu[t[:, k]]
        dx, dy, dz = d[:, 3 * k], d[:, 3 * k + 1], d[:, 3 * k + 2]
        v += (dx * dx * tp[:, 0] + dy * dy * tp[:, 1] + dz * dz * tp[:, 2]
              + 2 * dx * dy * tp[:, 3] + 2 * dx * dz * tp[:, 4]
              + 2 * dy * dz * tp[:, 5])
    var[ok] = v
    found[ok] = True
    return zp, var, found


def tin_interpolate(
    spark: SparkSession,
    points: DataFrame,
    grid: DataFrame,
    cell_res: int = 4,
    centroid: tuple[float, float, float] | None = None,
) -> DataFrame:
    """points(x,y,z,+TPU) x grid(grid_id,x,y) -> TIN_SCHEMA rows.

    ``centroid`` defaults to the exact P1 data centroid computed by a
    Spark agg; pass explicitly for bit-reproducible comparisons.
    """
    if centroid is None:
        c = points.agg(
            F.avg("x").alias("cx"), F.avg("y").alias("cy"), F.avg("z").alias("cz")
        ).collect()[0]
        centroid = (c["cx"], c["cy"], c["cz"])
    cen = np.asarray(centroid, dtype=np.float64)

    cell = F.expr(zcell_expr(SD, "x", "y", cell_res))
    # halo fan-out: each point goes to its cell + 8 neighbors
    n = 1 << cell_res
    neigh = spark.createDataFrame(
        [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)], "dr int, dc int"
    )
    pts = (
        points.withColumn("_ix", F.expr(
            f"greatest(0, least({n - 1}, CAST(floor((x - {_X0!r}) / {_EXT!r} * {n}) AS BIGINT)))"))
        .withColumn("_iy", F.expr(
            f"greatest(0, least({n - 1}, CAST(floor((y - {_Y0!r}) / {_EXT!r} * {n}) AS BIGINT)))"))
        .crossJoin(F.broadcast(neigh))
        .withColumn("_jx", F.col("_ix") + F.col("dc"))
        .withColumn("_jy", F.col("_iy") + F.col("dr"))
        .filter((F.col("_jx") >= 0) & (F.col("_jx") < n)
                & (F.col("_jy") >= 0) & (F.col("_jy") < n))
        .withColumn("cell", F.col("_jy") * n + F.col("_jx"))
        .select("cell", "x", "y", "z", *TPU_COLS)
    )
    grd = grid.withColumn(
        "cell",
        F.expr(
            f"greatest(0, least({n - 1}, CAST(floor((y - {_Y0!r}) / {_EXT!r} * {n}) AS BIGINT)))"
        ) * n
        + F.expr(
            f"greatest(0, least({n - 1}, CAST(floor((x - {_X0!r}) / {_EXT!r} * {n}) AS BIGINT)))"
        ),
    ).select("cell", "grid_id", "x", "y")

    def _cell_kernel(key, gpdf: pd.DataFrame, ppdf: pd.DataFrame) -> pd.DataFrame:
        if gpdf.empty:
            return pd.DataFrame(
                columns=["grid_id", "x", "y", "zp", "var_zp", "found"]
            )
        # dedupe exact-duplicate XY (degenerate for Delaunay)
        ppdf = ppdf.drop_duplicates(subset=["x", "y"])
        p = ppdf[["x", "y", "z"]].to_numpy(dtype=np.float64)
        tpu = ppdf[TPU_COLS].to_numpy(dtype=np.float64)
        g = gpdf[["x", "y"]].to_numpy(dtype=np.float64)
        zp, var, found = tin_numpy(p, tpu, g, cen)
        return pd.DataFrame(
            {
                "grid_id": gpdf["grid_id"].to_numpy(),
                "x": g[:, 0],
                "y": g[:, 1],
                "zp": zp,
                "var_zp": var,
                "found": found,
            }
        )

    return (
        grd.groupBy("cell")
        .cogroup(pts.groupBy("cell"))
        .applyInPandas(_cell_kernel, TIN_SCHEMA)
    )


from gpiv_spark.functions.geocode import EXTENT as _EXT, X0 as _X0, Y0 as _Y0  # noqa: E402
