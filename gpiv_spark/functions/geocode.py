"""Deterministic geocoding of documents into the GPIV fixture extent.

The reference operates on a fixed georeferenced extent: 478x478 px at
1 m/px, upper-left (273111, 3289789), EPSG:6344 (measured from
/root/reference/data/output/*.tif; UL at run_test_v1.py:72-75, pixel
size at rasters.py:25). The north-rule input is a documents table with
no coordinates, so the engine derives a reproducible location per doc
from a documented pure function of ``doc_id`` — two independent
Lehmer-style congruential mixes mapped into the fixture extent. The
same arithmetic renders to Spark Column exprs AND DuckDB oracle SQL
(gpiv_spark.dialect), so engine and oracle agree bit-for-bit: all
intermediate values stay exact in int64, the only float op is one
divide + fma-free affine map, identical IEEE754 in both engines.
"""

from __future__ import annotations

from gpiv_spark.dialect import Dialect

# Fixture extent (ground units, metres).
X0 = 273111.0  # min x  (UL x)
Y1 = 3289789.0  # max y  (UL y)
EXTENT = 478.0  # width == height, 478 px * 1 m
Y0 = Y1 - EXTENT  # min y
PIXEL = 1.0  # m / px
NPIX = 478  # raster dim
NODATA = 9999.0  # rasters.py:31

# Lehmer mix constants (primes; classic MINSTD multipliers).
M1, A1, B1 = 1_000_003, 48_271, 11
M2, A2, B2 = 999_983, 16_807, 7


def u_expr(d: Dialect, doc_id: str, m: int, a: int, b: int) -> str:
    """((doc_id % m) * a + b) % m — int64-exact in both engines."""
    return d.imod(f"({d.imod(d.big(doc_id), m)} * {a} + {b})", m)


def x_expr(d: Dialect, doc_id: str) -> str:
    """Ground x in [X0, X0+EXTENT)."""
    u = u_expr(d, doc_id, M1, A1, B1)
    return f"({X0!r} + {d.dbl(u)} / {float(M1)!r} * {EXTENT!r})"


def y_expr(d: Dialect, doc_id: str) -> str:
    """Ground y in [Y0, Y1)."""
    v = u_expr(d, doc_id, M2, A2, B2)
    return f"({Y0!r} + {d.dbl(v)} / {float(M2)!r} * {EXTENT!r})"


def px_col_expr(d: Dialect, x: str) -> str:
    """Pixel column from ground x (mirror of piv_functions.py:337: x/gt - off)."""
    return d.big(f"floor(({x} - {X0!r}) / {PIXEL!r})")


def px_row_expr(d: Dialect, y: str) -> str:
    """Pixel row from ground y — north-up flip (piv_functions.py:339: gt_y - y)."""
    return d.big(f"floor(({Y1!r} - {y}) / {PIXEL!r})")


def xq_expr(d: Dialect, doc_id: str) -> str:
    """Quadratic-scramble x: like x_expr but mixing doc_id^2 — breaks the
    collinearity of consecutive ids that a pure LCG walk produces (needed
    wherever 3 consecutive docs must form a non-degenerate triangle)."""
    r = d.imod(d.big(doc_id), M1)
    w = d.imod(f"({r} * {r})", M1)
    u = d.imod(f"({w} * {A1} + {B1})", M1)
    return f"({X0!r} + {d.dbl(u)} / {float(M1)!r} * {EXTENT!r})"


def yq_expr(d: Dialect, doc_id: str) -> str:
    s = d.imod(d.big(doc_id), M2)
    w = d.imod(f"({s} * {s})", M2)
    v = d.imod(f"({w} * {A2} + {B2})", M2)
    return f"({Y0!r} + {d.dbl(v)} / {float(M2)!r} * {EXTENT!r})"


def numpy_geocode_q(doc_id):
    """NumPy twin of xq_expr/yq_expr."""
    import numpy as np

    did = np.asarray(doc_id, dtype=np.int64)
    r = did % M1
    u = ((r * r % M1) * A1 + B1) % M1
    s = did % M2
    v = ((s * s % M2) * A2 + B2) % M2
    x = X0 + u.astype(np.float64) / float(M1) * EXTENT
    y = Y0 + v.astype(np.float64) / float(M2) * EXTENT
    return x, y


def numpy_geocode(doc_id):
    """NumPy twin of x_expr/y_expr for kernel-side use and tests."""
    import numpy as np

    did = np.asarray(doc_id, dtype=np.int64)
    u = ((did % M1) * A1 + B1) % M1
    v = ((did % M2) * A2 + B2) % M2
    x = X0 + u.astype(np.float64) / float(M1) * EXTENT
    y = Y0 + v.astype(np.float64) / float(M2) * EXTENT
    return x, y
