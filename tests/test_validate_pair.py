"""S2 validation stage: a mismatched raster pair must fail the job
before any NCC work runs (reference exits at piv_functions.py:82-84)."""

import numpy as np
import pytest

from gpiv_spark.operators.piv import run_piv
from gpiv_spark.operators.tiling import PivConfig
from gpiv_spark.sources.raster import (
    RasterPairMismatch,
    array_to_df,
    validate_geo_sidecars,
    validate_raster_pair,
)

CFG = PivConfig(template=8, step=8, scale=2, dim=64)


def test_mismatched_dims_raise_before_ncc(spark):
    before = array_to_df(spark, np.random.default_rng(0).random((64, 64)))
    after = array_to_df(spark, np.random.default_rng(1).random((60, 64)))
    with pytest.raises(RasterPairMismatch, match="shape mismatch"):
        run_piv(spark, before, after, CFG)


def test_matched_pair_passes_validation(spark):
    a = np.random.default_rng(0).random((64, 64))
    before = array_to_df(spark, a)
    after = array_to_df(spark, a)
    validate_raster_pair(before, after, deep=True)  # no raise


def test_deep_check_catches_ragged_coverage(spark):
    a = np.random.default_rng(0).random((32, 32))
    before = array_to_df(spark, a)
    # same bounds and count, but one interior pixel swapped for a
    # duplicate of another coordinate: bounds agg cannot see it
    after_pdf = array_to_df(spark, a).toPandas()
    after_pdf.loc[33, ["row", "col"]] = after_pdf.loc[34, ["row", "col"]]
    after = spark.createDataFrame(after_pdf)
    validate_raster_pair(before, after)  # cheap path passes
    with pytest.raises(RasterPairMismatch, match="coordinate sets"):
        validate_raster_pair(before, after, deep=True)


def test_geo_sidecar_mismatch_raises():
    g1 = {"ul_x": 273111.0, "ul_y": 3289789.0, "pixel_width": 1.0,
          "pixel_height": 1.0, "epsg": 6344, "nodata": 9999.0}
    g2 = dict(g1, pixel_width=0.5)
    validate_geo_sidecars(g1, dict(g1))  # no raise
    with pytest.raises(RasterPairMismatch, match="pixel_width"):
        validate_geo_sidecars(g1, g2)
