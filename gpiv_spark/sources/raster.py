"""Raster sources: deterministic derived rasters + seeded fixtures.

Two raster generators:

1. ``hash_value_expr`` / ``numpy_hash_raster`` — a pure-integer hash
   field f(row, col), renderable in BOTH dialects, defined on ALL of
   Z^2 (negative indices fine). Used to build PIV inputs whose
   *shifted* epoch is exactly ``after(r, c) = f(r - dy, c - dx)`` —
   no boundary effects, and a DuckDB oracle can synthesize the same
   raster. White-noise statistics -> razor-sharp NCC peaks.
2. ``make_field`` — a seeded smooth correlated field (coarse grid +
   bilinear upsample + noise), the GPIV-fixture-like input for the
   kernel golden tests (FIXTURES.md §2).

Long-form raster DataFrames (row, col, value) mirror rasterio's
read(1) arrays (piv_functions.py:67-74); tile form is produced by
operators.piv.pack_patches.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpiv_spark.dialect import Dialect

HASH_A = 73_856_093
HASH_B = 19_349_663
HASH_C = 2_654_435_761
HASH_M = 100_003


def hash_value_expr(d: Dialect, row: str, col: str) -> str:
    """f(r, c) in [0, 1): xor-mix of row/col, mod prime, scaled."""
    h = d.bxor(d.bxor(f"({d.big(row)} * {HASH_A})", f"({d.big(col)} * {HASH_B})"),
               str(HASH_C))
    # shifted indices can go negative -> h can be negative; Spark and
    # DuckDB both use trunc-mod so they agree, and the numpy twin below
    # matches via np.fmod (trunc-mod), NOT Python's floor-mod.
    return f"({d.dbl(d.imod(h, HASH_M))} / {float(HASH_M)!r})"


def numpy_hash_raster(rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    r = rows.astype(np.int64)
    c = cols.astype(np.int64)
    h = ((r * HASH_A) ^ (c * HASH_B)) ^ HASH_C
    return np.fmod(h, HASH_M).astype(np.float64) / float(HASH_M)


def hash_raster_df(spark: SparkSession, dim: int, shift_rc: tuple[int, int] = (0, 0)
                   ) -> DataFrame:
    """Long-form derived raster: value = f(row - dy, col - dx)."""
    from gpiv_spark.dialect import SPARK as d

    dy, dx = shift_rc
    rows = spark.range(dim).select(F.col("id").cast("int").alias("row"))
    cols = spark.range(dim).select(F.col("id").cast("int").alias("col"))
    return rows.crossJoin(cols).select(
        "row",
        "col",
        F.expr(hash_value_expr(d, f"(row - {dy})", f"(col - {dx})")).alias("value"),
    )


def make_field(dim: int, seed: int = 42, coarse: int = 16,
               noise: float = 0.05) -> np.ndarray:
    """Smooth correlated random surface + white noise (float64)."""
    rng = np.random.default_rng(seed)
    cg = rng.normal(0.0, 1.0, (coarse + 2, coarse + 2))
    # bilinear upsample
    ys = np.linspace(0, coarse, dim)
    xs = np.linspace(0, coarse, dim)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    a = cg[np.ix_(y0, x0)]
    b = cg[np.ix_(y0, x0 + 1)]
    c = cg[np.ix_(y0 + 1, x0)]
    dd = cg[np.ix_(y0 + 1, x0 + 1)]
    smooth = a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + dd * fy * fx
    return 10.0 + 2.0 * smooth + noise * rng.normal(0.0, 1.0, (dim, dim))


def translated_pair(dim: int, shift_rc: tuple[int, int], seed: int = 42,
                    noise: float = 0.05) -> tuple[np.ndarray, np.ndarray]:
    """(before, after) with after(p + d) == before(p) exactly — the
    pure-translation validation case (Readme.md:12)."""
    dy, dx = shift_rc
    m = max(abs(dy), abs(dx))
    field = make_field(dim + 2 * m, seed=seed, noise=noise)
    before = field[m : m + dim, m : m + dim]
    after = field[m - dy : m - dy + dim, m - dx : m - dx + dim]
    return before, after


class RasterPairMismatch(ValueError):
    """S2 validation failure: the raster pair cannot be correlated."""


TRANSFORM_KEYS = ("ul_x", "ul_y", "pixel_width", "pixel_height")


def validate_geo_sidecars(before_geo: dict, after_geo: dict,
                          keys: tuple = TRANSFORM_KEYS + ("epsg", "nodata"),
                          ) -> None:
    """Transform-equality assert (S2): the reference refuses to run PIV
    when the two epochs' geo-transforms differ (piv_functions.py:82-84).
    Exact comparison — a half-pixel shift silently breaks every vector.

    ``keys`` narrows the comparison: the reference only requires the
    TRANSFORM to match between a height raster and its uncertainty
    sidecar — nodata/epsg may legitimately differ across products.
    """
    diffs = {
        k: (before_geo.get(k), after_geo.get(k))
        for k in keys
        if before_geo.get(k) != after_geo.get(k)
    }
    if diffs:
        raise RasterPairMismatch(f"geo-transform mismatch: {diffs}")


def validate_raster_pair(before: DataFrame, after: DataFrame,
                         deep: bool = False) -> None:
    """Shape/extent equality for a long-form raster pair; fails the job
    BEFORE any NCC work is scheduled (S2, piv_functions.py:82-84).

    Cheap path: one tiny agg per raster (count + row/col bounds).
    ``deep=True`` adds the EXCEPT-style check — symmetric anti-join on
    (row, col) — catching ragged/missing pixels that bounds can't see.
    """

    def dims(df: DataFrame):
        return df.agg(
            F.count("*").alias("n"),
            F.min("row").alias("r0"), F.max("row").alias("r1"),
            F.min("col").alias("c0"), F.max("col").alias("c1"),
        ).collect()[0]

    db, da = dims(before), dims(after)
    if tuple(db) != tuple(da):
        raise RasterPairMismatch(
            f"raster shape mismatch: before {tuple(db)} vs after {tuple(da)}"
        )
    if deep:
        extra = (
            before.select("row", "col")
            .exceptAll(after.select("row", "col"))
            .limit(1)
            .count()
        )
        if extra:
            raise RasterPairMismatch(
                "raster pixel-coordinate sets differ (ragged coverage)"
            )


def array_to_df(spark: SparkSession, arr: np.ndarray) -> DataFrame:
    """Dense 2-D array -> long-form (row, col, value) DataFrame."""
    import pandas as pd

    h, w = arr.shape
    rows, cols = np.divmod(np.arange(h * w), w)
    pdf = pd.DataFrame(
        {"row": rows.astype(np.int32), "col": cols.astype(np.int32),
         "value": arr.ravel().astype(np.float64)}
    )
    return spark.createDataFrame(pdf)
