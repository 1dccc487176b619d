"""Distributed TIN vs single-process global oracle."""

import numpy as np
import pandas as pd
import pytest

from gpiv_spark import fixtures
from gpiv_spark.functions import delaunay as dl
from gpiv_spark.functions.geocode import EXTENT, X0, Y0
from gpiv_spark.operators.tin import TPU_COLS, tin_interpolate, tin_numpy


def _grid_df(spark, n=40, inset=40.0):
    xs = np.linspace(X0 + inset, X0 + EXTENT - inset, n)
    ys = np.linspace(Y0 + inset, Y0 + EXTENT - inset, n)
    gx, gy = np.meshgrid(xs, ys)
    pdf = pd.DataFrame(
        {
            "grid_id": np.arange(n * n, dtype=np.int64),
            "x": gx.ravel(),
            "y": gy.ravel(),
        }
    )
    return pdf, spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def cloud():
    return fixtures.points_cloud(n=4000, seed=42)


def test_distributed_matches_global_oracle(spark, cloud):
    """Tile+halo local Delaunay == global Delaunay interpolation a.e."""
    gpdf, gdf = _grid_df(spark, n=40)
    pdf_pts = spark.createDataFrame(cloud)
    cen = cloud[["x", "y", "z"]].to_numpy().mean(axis=0)
    res = (
        tin_interpolate(spark, pdf_pts, gdf, cell_res=3, centroid=tuple(cen))
        .toPandas()
        .sort_values("grid_id")
        .reset_index(drop=True)
    )
    assert len(res) == len(gpdf)

    p = cloud[["x", "y", "z"]].to_numpy()
    tpu = cloud[TPU_COLS].to_numpy()
    g = gpdf[["x", "y"]].to_numpy()
    zp, var, found = tin_numpy(p, tpu, g, cen)

    assert found.mean() > 0.999  # interior grid fully inside the hull
    both = found & res["found"].to_numpy()
    agree = both.mean()
    assert agree > 0.995  # halo boundary tolerance (SURVEY §7.3)
    # where both found: different triangulations can only differ on
    # co-circular ties; interpolated values must agree numerically
    np.testing.assert_allclose(res["zp"][both], zp[both], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(res["var_zp"][both], var[both], rtol=1e-6)


def test_planar_exactness_and_outside_nan(spark):
    """Any triangulation interpolates a plane exactly; outside -> NaN."""
    cloud = fixtures.points_cloud(n=2000, seed=1, planar=True)
    pdf_pts = spark.createDataFrame(cloud)
    gpdf, gdf = _grid_df(spark, n=20, inset=30.0)
    # add 4 points far outside the hull
    far = pd.DataFrame(
        {
            "grid_id": [10_000, 10_001, 10_002, 10_003],
            "x": [X0 - 500.0, X0 + EXTENT + 500.0, X0 - 500.0, X0 + 900.0],
            "y": [Y0 - 500.0, Y0 + EXTENT + 500.0, Y0 + 900.0, Y0 - 500.0],
        }
    )
    import pyspark.sql.functions as F

    gdf2 = gdf.unionByName(spark.createDataFrame(far))
    res = tin_interpolate(spark, pdf_pts, gdf2, cell_res=3).toPandas()
    inside = res[res["grid_id"] < 10_000]
    outside = res[res["grid_id"] >= 10_000]
    assert inside["found"].all()
    expected = 0.01 * (inside["x"] - X0) - 0.02 * (inside["y"] - Y0) + 5.0
    np.testing.assert_allclose(inside["zp"], expected, atol=1e-7)
    # F4: outside-hull rows kept with NaN, not dropped
    assert len(outside) == 4
    assert (~outside["found"]).all()
    assert outside["zp"].isna().all()


def test_propagated_variance_positive(spark, cloud):
    gpdf, gdf = _grid_df(spark, n=10)
    res = tin_interpolate(
        spark, spark.createDataFrame(cloud), gdf, cell_res=3
    ).toPandas()
    ok = res[res["found"]]
    assert len(ok) > 90
    assert (ok["var_zp"] > 0).all()  # PSD propagation (SURVEY §5 prop test)
