"""Unit tests for the NumPy kernel layer (no Spark)."""

import numpy as np
import pytest

from gpiv_spark.functions import ncc as K
from gpiv_spark.functions.delaunay import _circumcircles, delaunay, find_simplex


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


class TestDelaunay:
    def test_empty_circumcircle_property(self, rng):
        pts = rng.uniform(0, 100, (500, 2))
        tri = delaunay(pts)
        assert len(tri) > 900  # ~2n triangles expected
        cc, rr = _circumcircles(pts, tri.astype(np.int64))
        for i in range(0, len(tri), 11):
            d2 = (pts[:, 0] - cc[i, 0]) ** 2 + (pts[:, 1] - cc[i, 1]) ** 2
            mask = d2 < rr[i] * (1 - 1e-9)
            mask[tri[i]] = False
            assert not mask.any()

    def test_ccw_winding(self, rng):
        pts = rng.uniform(0, 10, (100, 2))
        tri = delaunay(pts)
        a, b, c = pts[tri[:, 0]], pts[tri[:, 1]], pts[tri[:, 2]]
        cross = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (
            c[:, 0] - a[:, 0]
        )
        assert (cross > 0).all()

    def test_find_simplex_interior_and_exterior(self, rng):
        pts = rng.uniform(0, 100, (300, 2))
        tri = delaunay(pts)
        inner = rng.uniform(20, 80, (200, 2))
        outer = np.array([[200.0, 200.0], [-50.0, 10.0]])
        fs_in = find_simplex(pts, tri, inner)
        fs_out = find_simplex(pts, tri, outer)
        assert (fs_in >= 0).all()
        assert (fs_out == -1).all()  # -1 -> NaN row semantics (F4)

    def test_plane_interpolation_exact(self, rng):
        pts = rng.uniform(0, 50, (200, 2))
        z = 1.5 * pts[:, 0] - 0.75 * pts[:, 1] + 3.0
        tri = delaunay(pts)
        q = rng.uniform(10, 40, (100, 2))
        fs = find_simplex(pts, tri, q)
        t = tri[fs]
        p3 = np.stack([pts[t[:, k]] for k in range(3)], axis=1)
        z3 = np.stack([z[t[:, k]] for k in range(3)], axis=1)
        # barycentric interpolation
        d = (p3[:, 1, 1] - p3[:, 2, 1]) * (p3[:, 0, 0] - p3[:, 2, 0]) + (
            p3[:, 2, 0] - p3[:, 1, 0]
        ) * (p3[:, 0, 1] - p3[:, 2, 1])
        w0 = ((p3[:, 1, 1] - p3[:, 2, 1]) * (q[:, 0] - p3[:, 2, 0])
              + (p3[:, 2, 0] - p3[:, 1, 0]) * (q[:, 1] - p3[:, 2, 1])) / d
        w1 = ((p3[:, 2, 1] - p3[:, 0, 1]) * (q[:, 0] - p3[:, 2, 0])
              + (p3[:, 0, 0] - p3[:, 2, 0]) * (q[:, 1] - p3[:, 2, 1])) / d
        zp = w0 * z3[:, 0] + w1 * z3[:, 1] + (1 - w0 - w1) * z3[:, 2]
        expected = 1.5 * q[:, 0] - 0.75 * q[:, 1] + 3.0
        np.testing.assert_allclose(zp, expected, atol=1e-8)


class TestNcc:
    def test_fft_surface_matches_spatial(self, rng):
        t = rng.normal(10, 2, (8, 8))
        s = rng.normal(10, 2, (24, 24))
        surf = K.ncc_surface(s, t)
        for r in (0, 5, 16):
            for c in (0, 9, 16):
                assert surf[r, c] == pytest.approx(
                    K.ncc_spatial(s[r : r + 8, c : c + 8], t), abs=1e-11
                )

    def test_self_correlation_peak_is_one(self, rng):
        t = rng.normal(0, 1, (8, 8))
        s = np.pad(t, 4, mode="linear_ramp")
        surf = K.ncc_surface(s, t)
        assert surf[4, 4] == pytest.approx(1.0, abs=1e-9)
        assert surf.max() == pytest.approx(surf[4, 4], abs=1e-9)

    def test_analytic_jacobian_matches_numeric(self, rng):
        t = rng.normal(5, 1.5, (6, 6))
        s = rng.normal(5, 1.5, (8, 8))
        surf = np.array(
            [[K.ncc_spatial(s[r : r + 6, c : c + 6], t) for c in range(3)]
             for r in range(3)]
        )
        ja = K.analytic_correlation_jacobian(t, s)
        jn = K.numeric_correlation_jacobian(t, s, surf)
        np.testing.assert_allclose(ja, jn, atol=5e-6)

    def test_subpixel_peak_symmetric_patch_is_zero(self):
        p = np.array([[0.5, 0.8, 0.5], [0.8, 1.0, 0.8], [0.5, 0.8, 0.5]])
        hz, vt = K.subpixel_peak(p)
        assert hz == pytest.approx(0.0, abs=1e-12)
        assert vt == pytest.approx(0.0, abs=1e-12)

    def test_propagation_psd_and_symmetric(self, rng):
        t = rng.normal(5, 1.5, (6, 6))
        s = rng.normal(5, 1.5, (8, 8))
        ut = np.abs(rng.normal(0.1, 0.02, (6, 6)))
        us = np.abs(rng.normal(0.1, 0.02, (8, 8)))
        jac = K.analytic_correlation_jacobian(t, s)
        cc = K.propagate_pixel_into_correlation(jac, ut, us)
        assert np.allclose(cc, cc.T)
        assert (np.linalg.eigvalsh(cc) > -1e-15).all()
        surf = np.array(
            [[K.ncc_spatial(s[r : r + 6, c : c + 6], t) for c in range(3)]
             for r in range(3)]
        )
        peak = K.subpixel_peak(surf)
        pc = K.propagate_correlation_into_subpixel_peak(surf, cc, peak)
        assert pc.shape == (2, 2)
        assert pc[0, 1] == pytest.approx(pc[1, 0], rel=1e-6)
