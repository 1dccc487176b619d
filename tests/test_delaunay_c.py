"""The C Bowyer-Watson core must be a BIT-IDENTICAL twin of the NumPy
insertion loop (same insertion order, float expression order, tie
handling) — the tin_var golden and every TIN oracle depend on the
triangulation being reproducible to the last ulp. These tests compare
the two paths' raw index arrays with array_equal (not set equality):
row order and vertex order must match too."""

import numpy as np
import pytest

import gpiv_spark.functions.delaunay as dl
from gpiv_spark.functions import _delaunay_cc


def _numpy_twin(pts):
    saved = _delaunay_cc._lib, _delaunay_cc._tried
    _delaunay_cc._lib, _delaunay_cc._tried = None, True
    try:
        return dl.delaunay(pts)
    finally:
        _delaunay_cc._lib, _delaunay_cc._tried = saved


def test_c_core_available():
    assert _delaunay_cc.load() is not None, (
        "C core failed to build — the NumPy fallback keeps results "
        "correct but the build loses its round-6 kernel speedup"
    )


@pytest.mark.parametrize("name", [
    "uniform", "lattice", "collinear", "duplicates", "clustered", "tiny",
])
def test_c_matches_numpy_bitwise(name):
    rng = np.random.default_rng(17)
    base = np.array([273111.0, 3289311.0])
    if name == "uniform":
        pts = rng.random((3000, 2)) * 478.0 + base
    elif name == "lattice":
        g = np.stack(np.meshgrid(np.arange(45.0), np.arange(45.0)), -1)
        pts = g.reshape(-1, 2) * 3.3 + base
    elif name == "collinear":
        pts = np.stack([np.arange(400.0), np.arange(400.0) * 1e-9], -1) + base
    elif name == "duplicates":
        p = rng.random((500, 2)) * 478.0 + base
        pts = np.concatenate([p, p[:100]])  # exact duplicate XY rows
    elif name == "clustered":
        centers = rng.random((4, 2)) * 478.0 + base
        pts = np.concatenate(
            [c + rng.normal(0, 8.0, (250, 2)) for c in centers])
    else:
        pts = rng.random((4, 2)) * 10.0 + base
    a = dl.delaunay(pts)
    b = _numpy_twin(pts)
    assert np.array_equal(a, b)


def test_capacity_growth_retry_identical():
    # tiny inputs keep cap at the 64 floor; growth paths must agree too
    rng = np.random.default_rng(3)
    for n in (3, 4, 7, 12, 33):
        pts = rng.random((n, 2)) * 100.0
        assert np.array_equal(dl.delaunay(pts), _numpy_twin(pts))
