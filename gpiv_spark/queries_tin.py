"""TIN pipeline queries for the driver's correctness gate.

``tin_plane_kernel`` runs the ENTIRE distributed TIN path — Z-order
cell partitioning, halo fan-out, per-cell Bowyer-Watson Delaunay,
containment join, centroid conditioning, plane-coefficient
interpolation — on a planar point cloud derived from the documents
table. Linear TIN interpolation reproduces a plane EXACTLY regardless
of which (valid) triangulation the engine built, so the DuckDB oracle
is the closed-form plane evaluated at the grid — a genuine end-to-end
check of a kernel DuckDB could never run itself.

``tin_var_kernel`` adds E3 variance propagation on a curved surface.
The triangle choice is not SQL-computable, so its oracle is a golden
parquet produced by the GLOBAL-Delaunay NumPy path (one triangulation
of the whole cloud — none of the distributed partitioning/halo/cogroup
machinery; tools/make_goldens.py), keyed by the documents row count so
the same file serves every test SF. tests/test_tin_spark.py pins the
same property with tolerance; the gate pins it with a value hash.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpiv_spark.dialect import DUCKDB, SPARK
from gpiv_spark.functions import geocode
from gpiv_spark.operators.tin import tin_interpolate
from gpiv_spark.queries import register

X0, Y0, EXT = geocode.X0, geocode.Y0, geocode.EXTENT

# interior grid window: 36x36 at 10 m, inset 60 m (safely inside the hull
# of >= 4000 scattered points)
_GN, _GSTEP, _GINSET = 36, 10.0, 60.0

# points: 8 derived points per doc via the quadratic-scramble geocode
_PPD = 8


def _points_df(spark: SparkSession, sf_dir: str, planar: bool) -> DataFrame:
    d = SPARK
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pts = (
        docs.select(
            F.explode(F.expr(f"sequence(0, {_PPD - 1})")).alias("j"), "doc_id"
        )
        .withColumn("pid", F.col("doc_id") * _PPD + F.col("j"))
        .select(
            F.expr(geocode.xq_expr(d, "pid")).alias("x"),
            F.expr(geocode.yq_expr(d, "pid")).alias("y"),
            F.col("pid"),
        )
    )
    if planar:
        z = F.expr(f"0.01 * (x - {X0!r}) - 0.02 * (y - {Y0!r}) + 5.0")
    else:
        z = F.expr(
            f"5.0 + 0.01 * (x - {X0!r}) + 0.004 * (y - {Y0!r})"
            f" + 0.00005 * ((x - {X0!r}) * (y - {Y0!r}))"
        )
    return pts.select(
        "x",
        "y",
        z.alias("z"),
        F.expr("(1 + pid % 7) * 0.0001").alias("var_x"),
        F.expr("(1 + pid % 5) * 0.0001").alias("var_y"),
        F.expr("(1 + pid % 3) * 0.0001").alias("var_z"),
        F.lit(0.0).alias("cov_xy"),
        F.lit(0.0).alias("cov_xz"),
        F.lit(0.0).alias("cov_yz"),
    )


def _grid_df(spark: SparkSession) -> DataFrame:
    gy = spark.range(_GN).select(F.col("id").alias("gy"))
    gx = spark.range(_GN).select(F.col("id").alias("gx"))
    return gy.crossJoin(gx).select(
        (F.col("gy") * _GN + F.col("gx")).alias("grid_id"),
        (F.lit(X0 + _GINSET) + F.col("gx") * _GSTEP).alias("x"),
        (F.lit(Y0 + _GINSET) + F.col("gy") * _GSTEP).alias("y"),
    )


_CEN = (X0 + 239.0, Y0 + 239.0, 5.0)

_PLANE_ORACLE = f"""
    SELECT gy.i * {_GN} + gx.i AS grid_id,
           round(0.01 * ({_GINSET!r} + gx.i * {_GSTEP!r})
                 - 0.02 * ({_GINSET!r} + gy.i * {_GSTEP!r}) + 5.0, 5) AS zp
    FROM {DUCKDB.range_sql(_GN, "gy")} CROSS JOIN {DUCKDB.range_sql(_GN, "gx")}
"""


@register("tin_plane_kernel", _PLANE_ORACLE)
def q_tin_plane_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points_df(spark, sf_dir, planar=True)
    res = tin_interpolate(spark, pts, _grid_df(spark), cell_res=3, centroid=_CEN)
    return res.filter("found").select(
        "grid_id", F.round("zp", 5).alias("zp")
    )


_GOLDEN = (
    Path(__file__).resolve().parent.parent / "tests" / "golden" / "tin_var.parquet"
)

_TIN_VAR_ORACLE = f"""
    SELECT grid_id, zp, var_zp
    FROM read_parquet('{_GOLDEN.as_posix()}')
    WHERE n_docs = (SELECT count(*) FROM documents)
"""


@register("tin_var_kernel", _TIN_VAR_ORACLE)
def q_tin_var_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points_df(spark, sf_dir, planar=False)
    res = tin_interpolate(spark, pts, _grid_df(spark), cell_res=3, centroid=_CEN)
    return res.filter("found").select(
        "grid_id", F.round("zp", 6).alias("zp"),
        F.round("var_zp", 10).alias("var_zp"),
    )
