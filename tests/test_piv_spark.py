"""End-to-end tests of the distributed PIV operator vs the NumPy oracle."""

import numpy as np
import pandas as pd
import pytest

from gpiv_spark.operators.piv import add_bias_variance, bias_variance, run_piv
from gpiv_spark.operators.tiling import PivConfig
from gpiv_spark.sources.raster import array_to_df, translated_pair
from tests.oracle import piv_oracle


@pytest.fixture(scope="module")
def translation_case(spark):
    """96x96 smooth field, pure translation (dy=3, dx=-2)."""
    before, after = translated_pair(96, (3, -2), seed=42)
    return before, after, array_to_df(spark, before), array_to_df(spark, after)


def test_pure_translation_recovered(spark, translation_case):
    """Property (Readme.md:12): integer translation -> exact vectors."""
    before, after, bdf, adf = translation_case
    cfg = PivConfig(template=16, step=8, scale=2, dim=96)
    res = run_piv(spark, bdf, adf, cfg).toPandas()
    assert len(res) == cfg.count * cfg.count == 64
    # exact-translation: NCC peak is exactly 1 at the integer shift; the
    # quadratic sub-pixel fit wiggles ~0.1 px on finite windows (the
    # reference author's own observation, Readme.md:12)
    np.testing.assert_allclose(res["peak_ncc"], 1.0, atol=1e-9)
    np.testing.assert_allclose(res["dx_px"], -2.0, atol=0.15)
    np.testing.assert_allclose(res["dy_px"], 3.0, atol=0.15)
    assert (res["dx_px"].round() == -2).all()
    assert (res["dy_px"].round() == 3).all()


def test_vectors_match_oracle_exactly(spark, translation_case):
    before, after, bdf, adf = translation_case
    cfg = PivConfig(template=16, step=8, scale=2, dim=96)
    res = (
        run_piv(spark, bdf, adf, cfg)
        .toPandas()
        .sort_values(["tile_r", "tile_c"])
        .reset_index(drop=True)
    )
    ora = (
        pd.DataFrame(piv_oracle(before, after, 16, 8, 2))
        .sort_values(["tile_r", "tile_c"])
        .reset_index(drop=True)
    )
    assert len(res) == len(ora)
    for col in ("origin_x_px", "origin_y_px", "dx_px", "dy_px"):
        np.testing.assert_allclose(res[col], ora[col], atol=1e-9, err_msg=col)


def test_propagation_matches_numeric_oracle(spark):
    """E1/E2: engine's analytic Jacobian vs reference-semantics numeric."""
    rng = np.random.default_rng(7)
    before, after = translated_pair(48, (1, -1), seed=7)
    bu = np.abs(rng.normal(0.1, 0.02, before.shape))
    au = np.abs(rng.normal(0.1, 0.02, after.shape))
    cfg = PivConfig(template=8, step=8, scale=2, dim=48)
    res = (
        run_piv(
            spark,
            array_to_df(spark, before),
            array_to_df(spark, after),
            cfg,
            propagate=True,
            before_unc=array_to_df(spark, bu),
            after_unc=array_to_df(spark, au),
        )
        .toPandas()
        .sort_values(["tile_r", "tile_c"])
        .reset_index(drop=True)
    )
    ora = (
        pd.DataFrame(piv_oracle(before, after, 8, 8, 2, True, bu, au))
        .sort_values(["tile_r", "tile_c"])
        .reset_index(drop=True)
    )
    assert len(res) == len(ora) > 0
    for col in ("dx_px", "dy_px"):
        np.testing.assert_allclose(res[col], ora[col], atol=1e-9)
    # analytic vs forward-difference: agreement to ~1e-4 relative
    for col in ("c00", "c01", "c10", "c11"):
        np.testing.assert_allclose(res[col], ora[col], rtol=2e-3, atol=1e-12,
                                   err_msg=col)
    # covariances symmetric + PSD
    assert np.allclose(res["c01"], res["c10"], rtol=1e-6)
    assert ((res["c00"] * res["c11"] - res["c01"] * res["c10"]) > -1e-18).all()


def test_bias_two_pass(spark, translation_case):
    """A4/A5: self-PIV bias variance added to covariance diagonal."""
    before, _, bdf, _ = translation_case
    cfg = PivConfig(template=16, step=8, scale=2, dim=96)
    selfres = run_piv(spark, bdf, bdf, cfg)
    bias = bias_variance(selfres)
    b = bias.collect()[0]
    # self-correlation: integer part of every vector is exactly 0; the
    # variance of the sub-pixel wiggle IS the method bias (~1e-3 px^2)
    sp = selfres.toPandas()
    assert (sp["dx_px"].round() == 0).all() and (sp["dy_px"].round() == 0).all()
    assert 0 <= b["x_bias_variance"] < 0.01
    assert 0 <= b["y_bias_variance"] < 0.01
    base = selfres.withColumns(
        {"c00": selfres.peak_ncc * 0 + 1.0, "c11": selfres.peak_ncc * 0 + 2.0}
    )
    patched = add_bias_variance(base, bias).toPandas()
    np.testing.assert_allclose(
        patched["c00"], 1.0 + b["x_bias_variance"], rtol=1e-12
    )
    np.testing.assert_allclose(
        patched["c11"], 2.0 + b["y_bias_variance"], rtol=1e-12
    )
