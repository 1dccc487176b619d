"""GPIV displacement-grid tiling (SURVEY §2.2 G1-G3) as Spark ops.

Reproduces the reference's tile geometry exactly:

- search_size = template * search_scale           (piv_functions.py:104)
- counts      = floor((dim - search) / step)      (piv_functions.py:105-106)
- template window [k*step + offset, +template),
  offset = floor((scale-1)/2 * template)          (piv_functions.py:111-115)
- search window [k*step, +search + search%2)      (piv_functions.py:118-121)
- origin = k*step + floor(search/2) - (1-search%2)*0.5
                                                  (piv_functions.py:152-153)

The *tile-assignment function* maps a pixel (or a geocoded document's
pixel) to the tile whose template window contains it; with step <
template, windows overlap, so the canonical single assignment is the
LATEST-starting window: k = floor((p - offset)/step), clamped to
[0, count), validated against window membership. All of it is integer
column arithmetic (dialect-neutral -> Spark codegen + DuckDB oracle).

Grid generation (G1, run_test_v1.py:92-102) is a pure cross join of two
ranges — no data motion, fully parallel, partition count controllable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpiv_spark.dialect import Dialect


@dataclass(frozen=True)
class PivConfig:
    """Reference e2e config: template=100, step=50, scale=2 (run_test_v1.py:148-150)."""

    template: int = 100
    step: int = 50
    scale: int = 2
    dim: int = 478  # fixture raster is 478x478

    @property
    def search(self) -> int:
        return self.template * self.scale

    @property
    def offset(self) -> int:
        # int(np.floor((scale-1)/2 * template))
        return int((self.scale - 1) * self.template // 2)

    @property
    def count(self) -> int:
        # per-axis tile count; floor((dim - search)/step)
        return (self.dim - self.search) // self.step

    @property
    def search_pad(self) -> int:
        # search window is widened by 1 when search size is odd (piv_functions.py:119)
        return self.search % 2

    def origin(self, k: int) -> float:
        return k * self.step + self.search // 2 - (1 - self.search % 2) * 0.5


def tile_k_expr(d: Dialect, p: str, cfg: PivConfig) -> str:
    """Tile index along one axis for pixel expr ``p`` (-1 = unassigned)."""
    k = f"greatest(0, least({cfg.count - 1}, {d.idiv(f'({p} - {cfg.offset})', cfg.step)}))"
    lo = f"({k} * {cfg.step} + {cfg.offset})"
    member = f"({p} >= {lo} AND {p} < {lo} + {cfg.template})"
    return f"(CASE WHEN {member} THEN {k} ELSE -1 END)"


def origin_expr(d: Dialect, k: str, cfg: PivConfig) -> str:
    """Ground-pixel origin of tile k (search-window center, G3)."""
    half = cfg.search // 2
    sub = (1 - cfg.search % 2) * 0.5
    return f"({d.dbl(k)} * {cfg.step} + {half} - {sub!r})"


def assign_tiles(df: DataFrame, cfg: PivConfig, row: str = "px_row",
                 col: str = "px_col") -> DataFrame:
    """Add tile_r/tile_c (+ origins) columns; -1 marks off-grid pixels."""
    from gpiv_spark.dialect import SPARK as d

    return (
        df.withColumn("tile_r", F.expr(tile_k_expr(d, row, cfg)))
        .withColumn("tile_c", F.expr(tile_k_expr(d, col, cfg)))
        .withColumn("origin_y", F.expr(origin_expr(d, "tile_r", cfg)))
        .withColumn("origin_x", F.expr(origin_expr(d, "tile_c", cfg)))
    )


def generate_grid(spark: SparkSession, minx: float, maxx: float, miny: float,
                  maxy: float, cell: float, margin: int = 2) -> DataFrame:
    """G1: regular grid of cell centers, bounds inset by margin*cell.

    Exact reference semantics (run_test_v1.py:87-97): per-axis
    ``lo = ceil(min + margin*cell)``, ``hi = floor(max - margin*cell)``,
    centers ``arange(lo+cell, hi+cell, cell) - cell/2`` == ``lo + i*cell
    + cell/2`` for ``i < ceil((hi-lo)/cell)``; meshgrid = crossJoin.
    Deterministic generation — zero input data motion; Catalyst plans
    this as two Range scans + a cross join partitioned by the outer
    range, so it scales linearly with grid rows and never shuffles.
    """
    import math

    lox, hix = math.ceil(minx + margin * cell), math.floor(maxx - margin * cell)
    loy, hiy = math.ceil(miny + margin * cell), math.floor(maxy - margin * cell)
    nx = max(0, math.ceil((hix - lox) / cell))
    ny = max(0, math.ceil((hiy - loy) / cell))
    gx = spark.range(nx).select(
        F.col("id").alias("gx"),
        (F.lit(lox) + F.col("id") * F.lit(cell) + F.lit(cell) / 2).alias("x"),
    )
    gy = spark.range(ny).select(
        F.col("id").alias("gy"),
        (F.lit(loy) + F.col("id") * F.lit(cell) + F.lit(cell) / 2).alias("y"),
    )
    return gy.crossJoin(gx)
