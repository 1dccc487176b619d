"""PIV pipeline queries for the driver's correctness gate.

Two complementary entries over the SAME derived raster (the hash
field, synthesizable in both engines with identical bits):

- ``piv_sql``: the complete PIV dataflow — tiling (G2/G3), the
  raster-pair tile join (J4), NCC as Pearson corr (A2: NCC == corr
  because normalization cancels), argmax via window (A3), edge guard
  (F3), sub-pixel quadratic fit (P6), vector assembly (P7) —
  expressed relationally in both dialects. Validates the *semantics*
  end-to-end against DuckDB.
- ``piv_kernel``: the production applyInPandas kernel path
  (operators.piv.run_piv, FFT NCC) checked against the SAME SQL
  oracle. The two paths share no code below the tiling constants, so
  agreement (at 5 decimals; FFT-vs-corr float noise ~1e-11) is a
  genuine cross-implementation check run by the driver every round.

Small config: 64x64 raster, template 8, step 8, scale 2 -> 36 tiles,
9x9 correlation surface per tile; shift (dy=-2, dx=+3) -> expected
integer displacement recovered at (u, v) = (2, 7), interior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpiv_spark.dialect import DUCKDB, SPARK, Dialect
from gpiv_spark.operators import piv as piv_op
from gpiv_spark.operators import piv_math
from gpiv_spark.operators.tiling import PivConfig
from gpiv_spark.queries import register
from gpiv_spark.sources.raster import hash_raster_df, hash_value_expr

CFG = PivConfig(template=8, step=8, scale=2, dim=64)
SHIFT = (-2, 3)  # (dy, dx)


def _piv_sql(d: Dialect) -> str:
    T, step, dim = CFG.template, CFG.step, CFG.dim
    search = CFG.search
    off = CFG.offset
    nsurf = search - T + 1  # 9
    dy, dx = SHIFT
    vb = hash_value_expr(d, "r.i", "c.i")
    va = hash_value_expr(d, f"(r.i - {dy})", f"(c.i - {dx})")
    spx = piv_math.subpixel_peak_exprs(
        {f"c{u}{v}": f"c{u}{v}" for u in range(3) for v in range(3)}
    )
    half = search // 2
    sub = (1 - search % 2) * 0.5
    cells9 = ", ".join(
        f"max(CASE WHEN s.u = b.pu + {u - 1} AND s.v = b.pv + {v - 1} "
        f"THEN s.ncc END) AS c{u}{v}"
        for u in range(3)
        for v in range(3)
    )
    return f"""
    WITH px AS (
      SELECT r.i AS row, c.i AS col, {vb} AS vb, {va} AS va
      FROM {d.range_sql(dim, "r")} CROSS JOIN {d.range_sql(dim, "c")}
    ),
    tiles AS (
      SELECT tr.i AS tr, tc.i AS tc
      FROM {d.range_sql(CFG.count, "tr")} CROSS JOIN {d.range_sql(CFG.count, "tc")}
    ),
    tmpl AS (
      SELECT t.tr, t.tc, p.row, p.col, p.vb
      FROM tiles t JOIN px p
        ON p.row >= t.tr * {step} + {off} AND p.row < t.tr * {step} + {off + T}
       AND p.col >= t.tc * {step} + {off} AND p.col < t.tc * {step} + {off + T}
    ),
    offs AS (
      SELECT u.i AS u, v.i AS v
      FROM {d.range_sql(nsurf, "u")} CROSS JOIN {d.range_sql(nsurf, "v")}
    ),
    surf AS (
      SELECT b.tr, b.tc, o.u, o.v, corr(b.vb, a.va) AS ncc
      FROM tmpl b CROSS JOIN offs o
      JOIN px a ON a.row = b.row - {off} + o.u AND a.col = b.col - {off} + o.v
      GROUP BY b.tr, b.tc, o.u, o.v
    ),
    peak AS (
      SELECT tr, tc, u, v, ncc,
             row_number() OVER (PARTITION BY tr, tc ORDER BY ncc DESC, u, v) AS rn
      FROM surf
    ),
    best AS (
      SELECT tr, tc, u AS pu, v AS pv, ncc AS peak_ncc
      FROM peak
      WHERE rn = 1 AND u BETWEEN 1 AND {nsurf - 2} AND v BETWEEN 1 AND {nsurf - 2}
    ),
    nbr AS (
      SELECT s.tr, s.tc, b.pu, b.pv, b.peak_ncc, {cells9}
      FROM surf s JOIN best b ON s.tr = b.tr AND s.tc = b.tc
      GROUP BY s.tr, s.tc, b.pu, b.pv, b.peak_ncc
    )
    SELECT tr AS tile_r, tc AS tile_c,
           CAST(tc AS DOUBLE) * {step} + {half} - {sub!r} AS origin_x_px,
           CAST(tr AS DOUBLE) * {step} + {half} - {sub!r} AS origin_y_px,
           round(pv - {-(-T // 2)} + {spx["hz_delta"]}, 5) AS dx_px,
           round(pu - {-(-T // 2)} + {spx["vt_delta"]}, 5) AS dy_px,
           round(peak_ncc, 5) AS peak_ncc
    FROM nbr
    """


@register("piv_sql", _piv_sql(DUCKDB))
def q_piv_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_piv_sql(SPARK))


@register("piv_kernel", _piv_sql(DUCKDB))
def q_piv_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production kernel path, judged against the relational oracle."""
    before = hash_raster_df(spark, CFG.dim)
    after = hash_raster_df(spark, CFG.dim, SHIFT)
    res = piv_op.run_piv(spark, before, after, CFG)
    return res.select(
        F.col("tile_r").cast("long"),
        F.col("tile_c").cast("long"),
        "origin_x_px",
        "origin_y_px",
        F.round("dx_px", 5).alias("dx_px"),
        F.round("dy_px", 5).alias("dy_px"),
        F.round("peak_ncc", 5).alias("peak_ncc"),
    )
