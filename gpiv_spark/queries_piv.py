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


def _piv_cte_prefix(d: Dialect) -> str:
    """Shared CTE chain px..best: raster synthesis, tiling, NCC surface,
    windowed argmax with the F3 interior guard. px carries the two
    deterministic uncertainty fields (ub for the 'before'/template
    raster, ua for 'after'/search) used by the covariance twin."""
    T, step, dim = CFG.template, CFG.step, CFG.dim
    search = CFG.search
    off = CFG.offset
    nsurf = search - T + 1  # 9
    dy, dx = SHIFT
    vb = hash_value_expr(d, "r.i", "c.i")
    va = hash_value_expr(d, f"(r.i - {dy})", f"(c.i - {dx})")
    ub = hash_value_expr(d, "(r.i + 101)", "(c.i + 211)")
    ua = hash_value_expr(d, "(r.i + 307)", "(c.i + 499)")
    return f"""
    px AS (
      SELECT r.i AS row, c.i AS col, {vb} AS vb, {va} AS va,
             (0.05 + 0.1 * {ub}) AS ub, (0.05 + 0.1 * {ua}) AS ua
      FROM {d.range_sql(dim, "r")} CROSS JOIN {d.range_sql(dim, "c")}
    ),
    tiles AS (
      SELECT tr.i AS tr, tc.i AS tc
      FROM {d.range_sql(CFG.count, "tr")} CROSS JOIN {d.range_sql(CFG.count, "tc")}
    ),
    tmpl AS (
      SELECT t.tr, t.tc, p.row, p.col, p.vb, p.ub
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
    )"""


def _piv_sql(d: Dialect) -> str:
    T, step = CFG.template, CFG.step
    search = CFG.search
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
    WITH {_piv_cte_prefix(d)},
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


@register("piv_sql", _piv_sql(DUCKDB), gate=False)  # relational twin of piv_kernel (same oracle)
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


# --- E1/E2 covariance propagation in the driver gate -------------------------
#
# The flagship error-propagation numbers (piv_functions.py:239-326) as a
# RELATIONAL twin of the analytic kernel:
#   E1: contrib rows carry one Jacobian entry per (tile, ncc cell a,
#       input pixel); a self-join on the pixel key folds the diagonal
#       input covariance into the 9x9 correlation covariance
#       cov_ab = sum_k J[a,k] var_k J[b,k].
#   E2: the reference's 2x9 NUMERIC Jacobian — nine re-evaluations of
#       the closed-form sub-pixel peak with one cell nudged by h — is
#       nine UNION ALL arms of the same perturbed expression template;
#       the final join contracts J . cov . J^T.
# The kernel path (run_piv propagate=True, analytic Jacobian, FFT NCC)
# is gated against this twin: the two share no code below the tiling
# constants and the subpixel/Jacobian formula templates.

_E2_H = 1e-6  # reference numeric-diff increment (piv_functions.py:98)
_COV_ROUND = 10  # c values ~1e-4..1e-3; cross-engine noise < 1e-12


def _piv_cov_sql(d: Dialect) -> str:
    T, step = CFG.template, CFG.step
    off = CFG.offset
    n = T * T

    # E2 closed form on patch columns n00..n22, plus 9 perturbed variants
    def spx_of(cells: dict[str, str]) -> dict[str, str]:
        return piv_math.subpixel_peak_exprs(
            {f"c{u}{v}": cells[f"n{u}{v}"] for u in range(3) for v in range(3)}
        )

    base_cells = {f"n{u}{v}": f"n{u}{v}" for u in range(3) for v in range(3)}
    base = spx_of(base_cells)
    jac2_arms = []
    for pr in range(3):
        for pc in range(3):
            pert = dict(base_cells)
            pert[f"n{pr}{pc}"] = f"(n{pr}{pc} + {_E2_H!r})"
            p = spx_of(pert)
            a = pr * 3 + pc
            jac2_arms.append(
                f"SELECT tr, tc, {a} AS a, "
                f"(({p['hz_delta']}) - ({base['hz_delta']})) / {_E2_H!r} AS j0, "
                f"(({p['vt_delta']}) - ({base['vt_delta']})) / {_E2_H!r} AS j1 "
                f"FROM npatch"
            )
    jac2_sql = " UNION ALL ".join(jac2_arms)

    patch9 = ", ".join(
        f"max(CASE WHEN ar = {u} AND ac = {v} THEN f END) AS n{u}{v}"
        for u in range(3)
        for v in range(3)
    )
    return f"""
    WITH {_piv_cte_prefix(d)},
    cells AS (
      SELECT b.tr, b.tc, ar.i AS ar, ac.i AS ac, b.pu, b.pv
      FROM best b
      CROSS JOIN {d.range_sql(3, "ar")} CROSS JOIN {d.range_sql(3, "ac")}
    ),
    tstat AS (
      SELECT tr, tc, avg(vb) AS mean_t, stddev_pop(vb) AS sig_t
      FROM tmpl GROUP BY tr, tc
    ),
    sub AS (
      SELECT c.tr, c.tc, c.ar, c.ac, t.row, t.col, t.vb, t.ub,
             p.va AS vs, p.ua,
             t.row - {off} + (c.pu - 1 + c.ar) AS srow,
             t.col - {off} + (c.pv - 1 + c.ac) AS scol
      FROM cells c
      JOIN tmpl t ON t.tr = c.tr AND t.tc = c.tc
      JOIN px p ON p.row = t.row - {off} + (c.pu - 1 + c.ar)
               AND p.col = t.col - {off} + (c.pv - 1 + c.ac)
    ),
    substat AS (
      SELECT tr, tc, ar, ac, avg(vs) AS mean_s, stddev_pop(vs) AS sig_s,
             corr(vb, vs) AS f
      FROM sub GROUP BY tr, tc, ar, ac
    ),
    contrib AS (
      SELECT s.tr, s.tc, (s.ar * 3 + s.ac) AS a, 0 AS kind,
             s.row AS kr, s.col AS kc,
             ((s.vs - st.mean_s) / st.sig_s
              - st.f * (s.vb - t.mean_t) / t.sig_t) / ({n} * t.sig_t) AS j,
             s.ub * s.ub AS var
      FROM sub s
      JOIN tstat t ON t.tr = s.tr AND t.tc = s.tc
      JOIN substat st ON st.tr = s.tr AND st.tc = s.tc
                     AND st.ar = s.ar AND st.ac = s.ac
      UNION ALL
      SELECT s.tr, s.tc, (s.ar * 3 + s.ac) AS a, 1 AS kind,
             s.srow AS kr, s.scol AS kc,
             ((s.vb - t.mean_t) / t.sig_t
              - st.f * (s.vs - st.mean_s) / st.sig_s) / ({n} * st.sig_s) AS j,
             s.ua * s.ua AS var
      FROM sub s
      JOIN tstat t ON t.tr = s.tr AND t.tc = s.tc
      JOIN substat st ON st.tr = s.tr AND st.tc = s.tc
                     AND st.ar = s.ar AND st.ac = s.ac
    ),
    cov AS (
      SELECT c1.tr, c1.tc, c1.a AS a1, c2.a AS a2,
             sum(c1.j * c2.j * c1.var) AS cv
      FROM contrib c1
      JOIN contrib c2 ON c1.tr = c2.tr AND c1.tc = c2.tc
                     AND c1.kind = c2.kind AND c1.kr = c2.kr AND c1.kc = c2.kc
      GROUP BY c1.tr, c1.tc, c1.a, c2.a
    ),
    npatch AS (
      SELECT tr, tc, {patch9}
      FROM substat GROUP BY tr, tc
    ),
    jac2 AS (
      {jac2_sql}
    )
    SELECT c.tr AS tile_r, c.tc AS tile_c,
           round(sum(ja.j0 * c.cv * jb.j0), {_COV_ROUND}) AS c00,
           round(sum(ja.j0 * c.cv * jb.j1), {_COV_ROUND}) AS c01,
           round(sum(ja.j1 * c.cv * jb.j1), {_COV_ROUND}) AS c11
    FROM cov c
    JOIN jac2 ja ON ja.tr = c.tr AND ja.tc = c.tc AND ja.a = c.a1
    JOIN jac2 jb ON jb.tr = c.tr AND jb.tc = c.tc AND jb.a = c.a2
    GROUP BY c.tr, c.tc
    """


def _unc_df(spark: SparkSession, seed_shift: tuple[int, int], base: float,
            scale: float) -> DataFrame:
    """Deterministic uncertainty raster from the same hash field family."""
    v = hash_raster_df(spark, CFG.dim, seed_shift)
    return v.select("row", "col",
                    (F.lit(base) + F.lit(scale) * F.col("value")).alias("value"))


@register("piv_cov_sql", _piv_cov_sql(DUCKDB), gate=False)  # relational twin of piv_covariance (same oracle)
def q_piv_cov_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialect parity of the E1/E2 relational twin itself."""
    return spark.sql(_piv_cov_sql(SPARK))


@register("piv_covariance", _piv_cov_sql(DUCKDB))
def q_piv_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel E1/E2 (analytic Jacobian, FFT NCC) vs the relational twin."""
    before = hash_raster_df(spark, CFG.dim)
    after = hash_raster_df(spark, CFG.dim, SHIFT)
    bu = _unc_df(spark, (-101, -211), 0.05, 0.1)
    au = _unc_df(spark, (-307, -499), 0.05, 0.1)
    res = piv_op.run_piv(spark, before, after, CFG, propagate=True,
                         before_unc=bu, after_unc=au)
    return res.select(
        F.col("tile_r").cast("long"),
        F.col("tile_c").cast("long"),
        F.round("c00", _COV_ROUND).alias("c00"),
        F.round("c01", _COV_ROUND).alias("c01"),
        F.round("c11", _COV_ROUND).alias("c11"),
    )
