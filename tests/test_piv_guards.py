"""PIV guard filters F1-F3 (piv_functions.py:130-146) drop tiles, not crash."""

import numpy as np

from gpiv_spark.operators.piv import run_piv
from gpiv_spark.operators.tiling import PivConfig
from gpiv_spark.sources.raster import array_to_df, translated_pair


def test_flat_and_nan_tiles_skipped(spark):
    before, after = translated_pair(96, (2, -1), seed=5)
    # F1: flatten one tile's search region entirely (tile (0,0): rows/cols 0..32)
    before = before.copy()
    after = after.copy()
    before[0:24, 0:24] = 7.0
    after[0:24, 0:24] = 7.0
    # F2: poison the far corner with NaN
    after[80:96, 80:96] = np.nan
    cfg = PivConfig(template=16, step=8, scale=2, dim=96)
    res = run_piv(spark, array_to_df(spark, before), array_to_df(spark, after),
                  cfg).toPandas()
    total = cfg.count ** 2
    assert 0 < len(res) < total  # some tiles survived, some were dropped
    # the flat tile is gone
    assert not ((res["tile_r"] == 0) & (res["tile_c"] == 0)).any()
    # NaN-region tiles are gone (search windows covering rows/cols >= 70)
    assert not ((res["tile_r"] == 7) & (res["tile_c"] == 7)).any()
    # survivors AWAY from the corrupted regions still recover the
    # translation (tiles overlapping the flat patch correctly lock to 0:
    # the flat region genuinely did not move)
    clean = res[
        (res["tile_r"].between(3, 6)) & (res["tile_c"].between(3, 6))
    ]
    assert len(clean) >= 9
    assert (clean["dx_px"].round() == -1).all()
    assert (clean["dy_px"].round() == 2).all()


def test_edge_peak_guard(spark):
    """F3: shift larger than the search margin pushes the peak to the
    correlation border -> those tiles are dropped, none mis-report."""
    # search margin is (search - template)/2 = 8 px; shift by 10 > 8
    before, after = translated_pair(96, (10, 0), seed=6)
    cfg = PivConfig(template=16, step=8, scale=2, dim=96)
    res = run_piv(spark, array_to_df(spark, before), array_to_df(spark, after),
                  cfg).toPandas()
    # peak at vt offset 8+10=18 > 16 (surface max index) -> clipped to the
    # border -> F3 drops essentially everything; the odd tile may keep a
    # spurious low secondary peak, but never a confident one
    assert len(res) <= 2
    if len(res):
        assert (res["peak_ncc"] < 0.95).all()
