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

# The driver's correctness gate verifies only the FIRST 50 ``queries()``
# entries (observed: round-3 registry held 57 and the 7 newest got no
# CORRECTNESS row). Queries whose operator is already pinned by a
# surviving gate query live here instead: same Q contract, verified by
# tests/test_retired_oracles.py and tools/check_oracles.py with the
# identical rows+schema+hash check, just not burning a driver slot.
RETIRED: dict[str, Q] = {}

GATE_CAP = 50


def register(name: str, oracle: str | None, gate: bool = True):
    def deco(fn):
        (REGISTRY if gate else RETIRED)[name] = Q(spark=fn, oracle=oracle)
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
    gate=False,  # hex twin of the gated cells_zorder encode
    oracle=f"""
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


# ===========================================================================
# Batch 2 — spatial joins (J2/kNN) + TIN (P2/P3/P5/E3) + PIV scalar math
# (P6/P4/P9/A4/A5). Spark side: DataFrame API or spark.sql over the SAME
# rendered expressions as the DuckDB oracle.
# ===========================================================================

from gpiv_spark.operators import knn as knn_op
from gpiv_spark.operators import pip as pip_op
from gpiv_spark.operators import piv_math, tin_math


def _docs_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _geo_cols_spark()
    return _docs(spark, sf_dir).select(
        "doc_id", F.expr(g["x"]).alias("x"), F.expr(g["y"]).alias("y")
    )


def _geo_cte_duck() -> str:
    g = _geo_cols_duck()
    return f"SELECT doc_id, {g['x']} AS x, {g['y']} AS y FROM documents"


# --- q_pip_triangles: broadcast PIP left join (J2; null = outside, F4) -----

_PIP_PRED = pip_op.inside_triangle_pred(
    "g.x", "g.y",
    {k: f"r.{k}" for k in ("x1", "y1", "x2", "y2", "x3", "y3")},
)


@register(
    "pip_triangles",
    f"""
    WITH geo AS ({_geo_cte_duck()})
    SELECT g.doc_id, r.roi_id
    FROM geo g LEFT JOIN {pip_op.roi_values_sql("r")} ON {_PIP_PRED}
    """,
)
def q_pip_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = _docs_geo(spark, sf_dir).alias("g")
    roi = spark.createDataFrame(
        pip_op.roi_triangles(),
        "roi_id int, x1 double, y1 double, x2 double, y2 double, x3 double, y3 double",
    ).alias("r")
    return geo.join(F.broadcast(roi), F.expr(_PIP_PRED), "left").select(
        "g.doc_id", "r.roi_id"
    )


# --- q_knn_anchors: exact kNN via broadcast + Window rank ------------------


@register(
    "knn_anchors",
    f"""
    WITH geo AS ({_geo_cte_duck()})
    SELECT doc_id, anchor_id, rnk, dist_sq FROM (
      SELECT g.doc_id, a.anchor_id,
             (g.x-a.ax)*(g.x-a.ax) + (g.y-a.ay)*(g.y-a.ay) AS dist_sq,
             row_number() OVER (
               PARTITION BY g.doc_id
               ORDER BY (g.x-a.ax)*(g.x-a.ax) + (g.y-a.ay)*(g.y-a.ay), a.anchor_id
             ) AS rnk
      FROM geo g CROSS JOIN {knn_op.anchors_values_sql("a")}
    ) t WHERE rnk <= 3
    """,
)
def q_knn_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = _docs_geo(spark, sf_dir)
    adf = spark.createDataFrame(knn_op.anchors(), "anchor_id int, ax double, ay double")
    return knn_op.knn_bruteforce(geo, adf, k=3)


# --- TIN chain: triangles from doc triples, conditioning constants ---------
# Conditioning "centroid" is a documented constant (extent center) so both
# engines stay bit-identical; the true data-centroid path (P1) is covered by
# the numpy-oracle pytest goldens.

_CCX, _CCY, _CCZ = geocode.X0 + 239.0, geocode.Y0 + 239.0, 10.0


def _z_expr(x: str, y: str) -> str:
    """Synthetic smooth surface z(x,y) — dialect-independent arithmetic."""
    return (
        f"(0.05 * ({x} - {geocode.X0!r}) + 0.03 * ({y} - {geocode.Y0!r})"
        f" + 0.0002 * (({x} - {geocode.X0!r}) * ({y} - {geocode.Y0!r})))"
    )


def _tri_cte(d) -> str:
    """Shared CTE: centroid-removed triangle vertices from doc triples.

    Uses the quadratic-scramble geocode — the linear LCG walk makes
    consecutive doc ids collinear, which degenerates every triangle.
    """
    g_x = geocode.xq_expr(d, "doc_id")
    g_y = geocode.yq_expr(d, "doc_id")
    z = _z_expr("x", "y")
    vcols = []
    for vs, sfx in ((0, "1"), (1, "2"), (2, "3")):
        for c in ("x", "y", "z"):
            vcols.append(f"max(CASE WHEN vseq = {vs} THEN {c} END) AS {c}{sfx}")
    return f"""
    v AS (
      SELECT {d.idiv('doc_id', 3)} AS tri_id, (doc_id % 3) AS vseq,
             (x - {_CCX!r}) AS x, (y - {_CCY!r}) AS y, ({z} - {_CCZ!r}) AS z
      FROM (SELECT doc_id, {g_x} AS x, {g_y} AS y FROM documents) raw
    ),
    tri AS (
      SELECT tri_id, {', '.join(vcols)}
      FROM v GROUP BY tri_id HAVING count(*) = 3
    )
    """


_V9 = {k: k for k in tin_math.V9}
_TCO = tin_math.tin_coeffs_exprs(_V9)
# grid point per triangle: vertex mean (already centroid-removed)
_GXP = "((x1 + x2 + x3) / 3)"
_GYP = "((y1 + y2 + y3) / 3)"


def _tin_sql(d, body: str) -> str:
    return f"WITH {_tri_cte(d)} {body}"


def _run_both(spark: SparkSession, sf_dir: str, sql_spark: str) -> DataFrame:
    _docs(spark, sf_dir).createOrReplaceTempView("documents")
    return spark.sql(sql_spark)


_TIN_COEFFS_BODY = f"""
    SELECT tri_id, {_TCO['A']} AS a, {_TCO['B']} AS b,
           {_TCO['C']} AS c, {_TCO['D']} AS dd
    FROM tri WHERE abs({_TCO['C']}) > 1e-9
"""


@register("tin_coeffs", _tin_sql(DUCKDB, _TIN_COEFFS_BODY),
          gate=False)  # r5 rotation: plane-coefficient math runs inside the
# gated tin_plane_kernel/tin_var_kernel distributed path and is pinned by
# the closed-form pytest oracles; slot freed for repetition_score
def q_tin_coeffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _tin_sql(SPARK, _TIN_COEFFS_BODY))


_TIN_INTERP_BODY = f"""
    SELECT tri_id,
           {tin_math.tin_interp_expr(_TCO['A'], _TCO['B'], _TCO['C'], _TCO['D'],
                                     _GXP, _GYP, repr(_CCZ))} AS zp
    FROM tri WHERE abs({_TCO['C']}) > 1e-9
"""


@register("tin_interp", _tin_sql(DUCKDB, _TIN_INTERP_BODY),
          gate=False)  # r5 rotation: interpolation is the gated tin_interp
# term inside tin_plane_kernel's probe; slot freed for sample_stratified
def q_tin_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _tin_sql(SPARK, _TIN_INTERP_BODY))


_TPD = tin_math.tin_partials_exprs(_V9, _GXP, _GYP,
                                   _TCO["A"], _TCO["B"], _TCO["C"], _TCO["D"])
_TIN_PARTIALS_BODY = f"""
    SELECT tri_id, {', '.join(f"{_TPD[f'd{i}']} AS d{i}" for i in range(1, 10))}
    FROM tri WHERE abs({_TCO['C']}) > 1e-9
"""


@register("tin_partials", _tin_sql(DUCKDB, _TIN_PARTIALS_BODY))
def q_tin_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _tin_sql(SPARK, _TIN_PARTIALS_BODY))


# E3: var_Z = sum_k d_k C_k d_k^T with synthetic per-vertex TPU derived from
# the vertex doc_id (vertex k of tri t is doc 3t+k).
def _tpu_of(doc: str) -> dict[str, str]:
    return {
        "var_x": f"((1 + ({doc}) % 7) * 0.0001)",
        "var_y": f"((1 + ({doc}) % 5) * 0.0001)",
        "var_z": f"((1 + ({doc}) % 3) * 0.0001)",
        "cov_xy": f"((({doc}) % 2) * 0.00001)",
        "cov_xz": f"((({doc}) % 3 - 1) * 0.00001)",
        "cov_yz": f"((({doc}) % 5 - 2) * 0.00001)",
    }


_TIN_PROP_BODY = f"""
    SELECT tri_id,
           {tin_math.tin_propagate_expr(
               _TPD,
               [_tpu_of(f"(tri_id * 3 + {k})") for k in range(3)])} AS var_zp
    FROM tri WHERE abs({_TCO['C']}) > 1e-9
"""


@register("tin_propagate", _tin_sql(DUCKDB, _TIN_PROP_BODY))
def q_tin_propagate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _tin_sql(SPARK, _TIN_PROP_BODY))


# --- q_subpixel_peak (P6): 3x3 quadratic-fit peak over event-value patches -

_SPX = piv_math.subpixel_peak_exprs(
    {f"c{r}{c}": f"c{r}{c}" for r in range(3) for c in range(3)}
)

_SUBPIXEL_SQL = f"""
    WITH e AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
    ),
    p AS (
      SELECT user_id,
             {', '.join(
                 f"max(CASE WHEN rn = {r * 3 + c + 1} THEN value END) AS c{r}{c}"
                 for r in range(3) for c in range(3))}
      FROM e WHERE rn <= 9 GROUP BY user_id HAVING max(rn) = 9
    )
    SELECT user_id, round({_SPX['hz_delta']}, 6) AS hz_delta,
           round({_SPX['vt_delta']}, 6) AS vt_delta
    FROM p WHERE abs({_SPX['den']}) > 1e-6
"""


@register("subpixel_peak", _SUBPIXEL_SQL)
def q_subpixel_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    return spark.sql(_SUBPIXEL_SQL)


# --- q_vector_ground (P4): pixel->ground export of tile vectors ------------

_GEXP = piv_math.ground_export_exprs(
    "origin_x_px", "origin_y_px", "dx_px", "dy_px"
)


def _vector_ground_sql(d) -> str:
    g = _geo_cols_duck() if d is DUCKDB else _geo_cols_spark()
    tr = tiling.tile_k_expr(d, "px_row", _CFG)
    tc = tiling.tile_k_expr(d, "px_col", _CFG)
    return f"""
    WITH geo AS (
      SELECT doc_id, {g['px_row']} AS px_row, {g['px_col']} AS px_col FROM documents
    ),
    t AS (
      SELECT CAST({tr} AS BIGINT) AS tile_r, CAST({tc} AS BIGINT) AS tile_c, count(*) AS n
      FROM geo GROUP BY 1, 2
    ),
    px AS (
      SELECT tile_r, tile_c,
             {tiling.origin_expr(d, 'tile_c', _CFG)} AS origin_x_px,
             {tiling.origin_expr(d, 'tile_r', _CFG)} AS origin_y_px,
             CAST(n AS DOUBLE) * 0.01 AS dx_px, CAST(n AS DOUBLE) * 0.02 AS dy_px
      FROM t WHERE tile_r >= 0 AND tile_c >= 0
    )
    SELECT tile_r, tile_c,
           {_GEXP['origin_x']} AS origin_x, {_GEXP['origin_y']} AS origin_y,
           {_GEXP['dx']} AS dx, {_GEXP['dy']} AS dy,
           {_GEXP['end_x']} AS end_x, {_GEXP['end_y']} AS end_y
    FROM px
    """


@register("vector_ground", _vector_ground_sql(DUCKDB))
def q_vector_ground(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _vector_ground_sql(SPARK))


# --- q_ellipse_params (P9): closed-form 2x2 eigen ---------------------------

_ELL = piv_math.ellipse_exprs("c00", "c01", "c11")

_ELLIPSE_SQL = f"""
    WITH c AS (
      SELECT doc_id,
             (1.0 + (doc_id % 10) * 0.1) AS c00,
             (0.05 * ((doc_id % 5) - 2)) AS c01,
             (1.0 + (doc_id % 7) * 0.2) AS c11
      FROM documents
    )
    SELECT doc_id, round({_ELL['semimajor']}, 6) AS semimajor,
           round({_ELL['semiminor']}, 6) AS semiminor,
           round({_ELL['angle_deg']}, 6) AS angle_deg
    FROM c
"""


# r5 rotation: closed-form column math, pytest-pinned — retired so
# round-4 work gets driver rows
@register("ellipse_params", _ELLIPSE_SQL, gate=False)
def q_ellipse_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _ELLIPSE_SQL)


# --- q_bias_variance (A4 + A5): two-pass bias patch -------------------------

_BIAS_SQL = """
    WITH v AS (
      SELECT doc_id,
             ((doc_id % 11) - 5) * 0.1 AS dx,
             ((doc_id % 13) - 6) * 0.05 AS dy,
             (1.0 + (doc_id % 10) * 0.1) AS c00,
             (1.0 + (doc_id % 7) * 0.2) AS c11
      FROM documents
    ),
    b AS (SELECT var_pop(dx) AS vx, var_pop(dy) AS vy FROM v)
    SELECT v.doc_id, round(v.c00 + b.vx, 6) AS c00p, round(v.c11 + b.vy, 6) AS c11p
    FROM v CROSS JOIN b
"""


@register("bias_variance", _BIAS_SQL)
def q_bias_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _BIAS_SQL)


# Register the training-data pipeline queries (batch 3).
from gpiv_spark import queries_text as _queries_text  # noqa: E402,F401
from gpiv_spark import queries_piv as _queries_piv  # noqa: E402,F401
from gpiv_spark import queries_tin as _queries_tin  # noqa: E402,F401
from gpiv_spark import queries_misc as _queries_misc  # noqa: E402,F401

# Hard invariant: every driver-facing entry gets a CORRECTNESS row.
# (import-time, so any registration past the cap fails tests instantly;
# a real raise, not assert — python -O must not strip the gate guard)
if len(REGISTRY) > GATE_CAP:
    raise RuntimeError(
        f"driver gate verifies only the first {GATE_CAP} queries; REGISTRY "
        f"holds {len(REGISTRY)} — move redundant ones to gate=False"
    )
