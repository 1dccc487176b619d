"""PIV scalar math: sub-pixel peak, ground export, ellipse, bias variance.

Exact closed forms from the reference:

- P6 sub-pixel peak (2-D quadratic fit)   piv_functions.py:224-236
- P7 vector assembly                      piv_functions.py:154-155
- P4 pixel->ground export                 piv_functions.py:329-345,348-375
- P9 ellipse parameters (2x2 eigen)       show_functions.py:117-129
- A4 bias variance (var over dx, dy)      piv_functions.py:378-386
- A5 bias-variance add to c00/c11         piv_functions.py:389-396

Dialect-neutral strings -> Spark codegen + DuckDB oracle.
"""

from __future__ import annotations

from gpiv_spark.functions.geocode import PIXEL, X0, Y1


def subpixel_peak_exprs(n: dict[str, str]) -> dict[str, str]:
    """hz/vt delta from a 3x3 NCC patch; keys c00..c22 (row, col)."""
    dx = f"(({n['c12']} - {n['c10']}) / 2)"
    dxx = f"({n['c12']} + {n['c10']} - 2*{n['c11']})"
    dy = f"(({n['c21']} - {n['c01']}) / 2)"
    dyy = f"({n['c21']} + {n['c01']} - 2*{n['c11']})"
    dxy = f"(({n['c22']} - {n['c20']} - {n['c02']} + {n['c00']}) / 4)"
    den = f"({dxx}*{dyy} - {dxy}*{dxy})"
    return {
        "den": den,
        "hz_delta": f"(-({dyy}*{dx} - {dxy}*{dy}) / {den})",
        "vt_delta": f"(-({dxx}*{dy} - {dxy}*{dx}) / {den})",
    }


def ground_export_exprs(origin_x_px: str, origin_y_px: str, dx_px: str,
                        dy_px: str) -> dict[str, str]:
    """Pixel -> ground: scale by gt[0,0], offset x, flip y; end=origin+(dx,-dy)."""
    ox = f"({origin_x_px} * {PIXEL!r} + {X0!r})"
    oy = f"({Y1!r} - {origin_y_px} * {PIXEL!r})"
    dxg = f"({dx_px} * {PIXEL!r})"
    dyg = f"({dy_px} * {PIXEL!r})"
    return {
        "origin_x": ox,
        "origin_y": oy,
        "dx": dxg,
        "dy": dyg,
        "end_x": f"({ox} + {dxg})",
        "end_y": f"({oy} - {dyg})",
        "cov_scale": f"({PIXEL!r} * {PIXEL!r})",
    }


def ellipse_exprs(c00: str, c01: str, c11: str) -> dict[str, str]:
    """Closed-form 2x2 symmetric eigen -> semimajor/minor (sqrt(2.298*lam))."""
    half_tr = f"(({c00} + {c11}) / 2)"
    det = f"({c00}*{c11} - {c01}*{c01})"
    disc = f"sqrt({half_tr}*{half_tr} - {det})"
    lam1 = f"({half_tr} + {disc})"
    lam2 = f"({half_tr} - {disc})"
    return {
        "lam1": lam1,
        "lam2": lam2,
        "semimajor": f"sqrt(2.298 * {lam1})",
        "semiminor": f"sqrt(2.298 * greatest({lam2}, 0.0))",
        # eigvec for lam1 is (c01, lam1-c00); angle = atan(vy/vx) in degrees.
        # c01 = 0 (axis-aligned covariance) makes atan 0/0 = NaN: the
        # eigenvectors are the axes, so the angle is 0 or 90 exactly
        # (atan2-equivalent semantics, guarded in the template itself).
        "angle_deg": (
            f"(CASE WHEN {c01} = 0 THEN "
            f"(CASE WHEN {c00} >= {c11} THEN 0.0 ELSE 90.0 END) "
            f"ELSE degrees(atan(({lam1} - {c00}) / {c01})) END)"
        ),
    }
