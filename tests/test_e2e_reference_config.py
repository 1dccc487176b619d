"""Golden end-to-end at the REFERENCE config (SURVEY §5.2 #3).

478x478 raster, template=100, step=50, search_scale=2
(run_test_v1.py:148-150) -> exactly 5x5 = 25 PIV cells with origins at
k*50 + 100 - 0.5; pure translation recovered; two-pass bias flow; JSON
sinks produce reference-shaped rows.
"""

import json
import tempfile
from pathlib import Path

import numpy as np
import pytest

from gpiv_spark.operators.piv import add_bias_variance, bias_variance, run_piv
from gpiv_spark.operators.tiling import PivConfig
from gpiv_spark.sources.raster import array_to_df, translated_pair
from gpiv_spark.sources.sinks import export_covariances, export_vectors, write_raster_tiles


@pytest.fixture(scope="module")
def ref_case(spark):
    before, after = translated_pair(478, (3, -2), seed=42)
    return array_to_df(spark, before), array_to_df(spark, after)


def test_reference_config_25_cells(spark, ref_case):
    bdf, adf = ref_case
    cfg = PivConfig()  # template=100, step=50, scale=2, dim=478
    assert cfg.count == 5 and cfg.search == 200 and cfg.offset == 50
    res = run_piv(spark, bdf, adf, cfg).toPandas()
    assert len(res) == 25
    # origins: k*50 + floor(200/2) - 0.5 (piv_functions.py:152-153)
    assert sorted(res["origin_x_px"].unique()) == [
        99.5, 149.5, 199.5, 249.5, 299.5
    ]
    assert (res["dx_px"].round() == -2).all()
    assert (res["dy_px"].round() == 3).all()
    np.testing.assert_allclose(res["peak_ncc"], 1.0, atol=1e-9)


def test_fused_bias_equals_two_pass(spark, ref_case):
    """run_piv(with_bias=True) must reproduce the separate self-PIV pass
    exactly — same vectors, same bias variances — in one pipeline; and
    the driver-side array patch packing must match the shuffled packing."""
    import numpy as np

    from gpiv_spark.operators.piv import bias_variance_fused, run_piv_arrays
    from gpiv_spark.sources.raster import translated_pair

    before, after = translated_pair(478, (3, -2), seed=42)
    cfg = PivConfig()
    bdf, adf = ref_case
    fused = run_piv_arrays(spark, before, after, cfg, with_bias=True).toPandas()
    main = run_piv(spark, bdf, adf, cfg).toPandas()
    self_piv = run_piv(spark, bdf, bdf, cfg).toPandas()
    f = fused.sort_values(["tile_r", "tile_c"]).reset_index(drop=True)
    m = main.sort_values(["tile_r", "tile_c"]).reset_index(drop=True)
    s = self_piv.sort_values(["tile_r", "tile_c"]).reset_index(drop=True)
    assert len(f) == len(m) == len(s) == 25
    np.testing.assert_array_equal(f["dx_px"], m["dx_px"])
    np.testing.assert_array_equal(f["dy_px"], m["dy_px"])
    np.testing.assert_array_equal(f["bias_dx"], s["dx_px"])
    np.testing.assert_array_equal(f["bias_dy"], s["dy_px"])
    bv = bias_variance_fused(
        run_piv_arrays(spark, before, after, cfg, with_bias=True)
    ).collect()[0]
    want = bias_variance(run_piv(spark, bdf, bdf, cfg)).collect()[0]
    np.testing.assert_allclose(bv["x_bias_variance"], want["x_bias_variance"])
    np.testing.assert_allclose(bv["y_bias_variance"], want["y_bias_variance"])


def test_fused_bias_survives_after_raster_nodata(spark, ref_case):
    """A tile whose AFTER window fails the F1/F2 guards must still feed
    the fused bias sample set (the reference derives bias from a
    standalone before-vs-before run whose guards never see the after
    raster): the fused result keeps a bias-only row with NaN main
    fields, and bias_variance_fused equals the two-pass value over ALL
    tiles — not just the main-surviving ones."""
    from gpiv_spark.operators.piv import bias_variance_fused, run_piv_arrays
    from gpiv_spark.sources.raster import translated_pair

    before, after = translated_pair(478, (3, -2), seed=42)
    after = after.copy()
    after[0, 0] = np.nan  # poisons exactly tile (0,0)'s search window
    cfg = PivConfig()

    fused = (
        run_piv_arrays(spark, before, after, cfg, with_bias=True)
        .toPandas().sort_values(["tile_r", "tile_c"]).reset_index(drop=True)
    )
    assert len(fused) == 25  # tile (0,0) is bias-only, not dropped
    row00 = fused[(fused.tile_r == 0) & (fused.tile_c == 0)].iloc[0]
    assert np.isnan(row00["dx_px"]) and np.isnan(row00["peak_ncc"])
    assert not np.isnan(row00["bias_dx"])

    main = run_piv_arrays(spark, before, after, cfg).toPandas()
    assert len(main) == 24  # the plain result still drops the tile

    bdf, _ = ref_case
    self_piv = (
        run_piv(spark, bdf, bdf, cfg)
        .toPandas().sort_values(["tile_r", "tile_c"]).reset_index(drop=True)
    )
    np.testing.assert_array_equal(fused["bias_dx"], self_piv["dx_px"])
    np.testing.assert_array_equal(fused["bias_dy"], self_piv["dy_px"])

    bv = bias_variance_fused(
        run_piv_arrays(spark, before, after, cfg, with_bias=True)
    ).collect()[0]
    want = bias_variance(run_piv(spark, bdf, bdf, cfg)).collect()[0]
    np.testing.assert_allclose(bv["x_bias_variance"], want["x_bias_variance"])
    np.testing.assert_allclose(bv["y_bias_variance"], want["y_bias_variance"])


def test_two_pass_bias_and_sinks(spark, ref_case):
    bdf, adf = ref_case
    cfg = PivConfig()
    rng = np.random.default_rng(3)
    unc = np.abs(rng.normal(0.08, 0.01, (478, 478)))
    udf_ = array_to_df(spark, unc)
    piv = run_piv(spark, bdf, adf, cfg, propagate=True,
                  before_unc=udf_, after_unc=udf_)
    bias = bias_variance(run_piv(spark, bdf, bdf, cfg))
    final = add_bias_variance(piv, bias)
    pdf = final.toPandas()
    assert len(pdf) == 25
    assert (pdf["c00"] > 0).all() and (pdf["c11"] > 0).all()

    with tempfile.TemporaryDirectory() as tmp:
        export_vectors(final, f"{tmp}/vectors")
        export_covariances(final, f"{tmp}/covariances")
        vec_rows = [
            json.loads(line)
            for p in Path(f"{tmp}/vectors").glob("part-*")
            for line in p.read_text().splitlines()
        ]
        assert len(vec_rows) == 25
        # reference row shape [x0, y0, dx, dy] in ground units
        assert all(len(r) == 4 for r in vec_rows)
        xs = sorted({r[0] for r in vec_rows})
        assert xs[0] == pytest.approx(273111.0 + 99.5)
        cov_rows = [
            json.loads(line)
            for p in Path(f"{tmp}/covariances").glob("part-*")
            for line in p.read_text().splitlines()
        ]
        assert len(cov_rows) == 25
        assert all(len(r["cov"]) == 2 and len(r["cov"][0]) == 2 for r in cov_rows)

        write_raster_tiles(bdf, f"{tmp}/raster")
        geo = json.loads(Path(f"{tmp}/raster/geo.json").read_text())
        assert geo["epsg"] == 6344 and geo["nodata"] == 9999.0
        tiles = spark.read.parquet(f"{tmp}/raster/tiles")
        assert tiles.count() == 478 * 478
        # partition pruning: one tile touches only its 128x128 block
        one = tiles.filter("tile_r = 0 AND tile_c = 0")
        assert one.count() == 128 * 128
