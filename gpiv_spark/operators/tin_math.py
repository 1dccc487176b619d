"""TIN interpolation + error-propagation scalar math (SURVEY §2.4/§2.7).

Exact closed forms from the reference (Bui et al. 2021,
DOI 10.1109/LGRS.2021.3134587, cited at tin_interpolation.py:9-13):

- P2 plane coefficients     get_tin_coeffs        tin_interpolation.py:125-141
- P3 interpolation          Interpolate_TIN       tin_interpolation.py:185-211
- P5 partial derivatives    get_partial_derivatives tin_interpolation.py:88-119
- E3 variance propagation   propagate_tin_error   tin_interpolation.py:146-181
  (block-diagonal Sigma -> var_Z = sum_k d_k C_k d_k^T, pure column math)

All inputs are centroid-removed coordinates (P1, tin_interpolation.py:49-51).
Rendered as dialect-neutral strings -> Catalyst column exprs (JVM-side,
whole-stage codegen) and DuckDB oracle SQL. NumPy twins in tests/oracle.py.
"""

from __future__ import annotations

from gpiv_spark.dialect import Dialect

V9 = ("x1", "y1", "z1", "x2", "y2", "z2", "x3", "y3", "z3")


def tin_coeffs_exprs(c: dict[str, str]) -> dict[str, str]:
    """A, B, C, D from triangle vertices (term order exactly as reference)."""
    x1, y1, z1, x2, y2, z2, x3, y3, z3 = (c[k] for k in V9)
    return {
        "A": f"(({y1}*{z3}) - ({y1}*{z2}) + ({y2}*{z1}) - ({y2}*{z3}) + ({y3}*{z2}) - ({y3}*{z1}))",
        "B": f"(({x1}*{z2}) - ({x1}*{z3}) + ({x2}*{z3}) - ({x2}*{z1}) + ({x3}*{z1}) - ({x3}*{z2}))",
        "C": f"(({x1}*{y2}) - ({x1}*{y3}) + ({x2}*{y3}) - ({x2}*{y1}) + ({x3}*{y1}) - ({x3}*{y2}))",
        "D": f"(({x1}*{y2}*{z3}) - ({x1}*{y3}*{z2}) + ({x2}*{y3}*{z1}) - ({x2}*{y1}*{z3}) + ({x3}*{y1}*{z2}) - ({x3}*{y2}*{z1}))",
    }


def tin_interp_expr(A: str, B: str, C: str, D: str, xp: str, yp: str,
                    centroid_z: str = "0.0") -> str:
    """Zp = (A/C)*Xp + (B/C)*Yp + D/C + centroid_z (coords centroid-removed)."""
    return f"(({A}/{C}) * {xp} + ({B}/{C}) * {yp} + ({D}/{C}) + {centroid_z})"


def tin_partials_exprs(c: dict[str, str], xp: str, yp: str,
                       A: str, B: str, C: str, D: str) -> dict[str, str]:
    """d1..d9 = dZp/d(x1,y1,z1,x2,y2,z2,x3,y3,z3), reference order d[:,0..8]."""
    x1, y1, z1, x2, y2, z2, x3, y3, z3 = (c[k] for k in V9)
    C2 = f"({C}*{C})"
    E = f"(({xp}*{A}) + ({yp}*{B}) + {D})"
    return {
        # dZ/dx_i  (reference d[:,0], d[:,3], d[:,6])
        "d1": f"(((({y3}-{y2}) * {E}) + ((({z2}-{z3})*{yp}) + (({y2}*{z3}) - ({y3}*{z2}))) * {C}) / {C2})",
        "d4": f"(((({y1}-{y3}) * {E}) + ((({z3}-{z1})*{yp}) + (({y3}*{z1}) - ({y1}*{z3}))) * {C}) / {C2})",
        "d7": f"(((({y2}-{y1}) * {E}) + ((({z1}-{z2})*{yp}) + (({y1}*{z2}) - ({y2}*{z1}))) * {C}) / {C2})",
        # dZ/dy_i  (reference d[:,1], d[:,4], d[:,7])
        "d2": f"(((({x2}-{x3}) * {E}) + ((({z3}-{z2})*{xp}) + (({x3}*{z2}) - ({x2}*{z3}))) * {C}) / {C2})",
        "d5": f"(((({x3}-{x1}) * {E}) + ((({z1}-{z3})*{xp}) + (({x1}*{z3}) - ({x3}*{z1}))) * {C}) / {C2})",
        "d8": f"(((({x1}-{x2}) * {E}) + ((({z2}-{z1})*{xp}) + (({x2}*{z1}) - ({x1}*{z2}))) * {C}) / {C2})",
        # dZ/dz_i  (reference d[:,2], d[:,5], d[:,8])
        "d3": f"(((({y2}-{y3})*{xp}) + (({x3}-{x2})*{yp}) + (({x2}*{y3}) - ({x3}*{y2}))) / {C})",
        "d6": f"(((({y3}-{y1})*{xp}) + (({x1}-{x3})*{yp}) + (({x3}*{y1}) - ({x1}*{y3}))) / {C})",
        "d9": f"(((({y1}-{y2})*{xp}) + (({x2}-{x1})*{yp}) + (({x1}*{y2}) - ({x2}*{y1}))) / {C})",
    }


def tin_propagate_expr(d9: dict[str, str], tpu: list[dict[str, str]]) -> str:
    """var_Z = d Sigma d^T with Sigma = blockdiag(C1, C2, C3).

    Because Sigma is block-diagonal (tin_interpolation.py:175-179), the
    9x9 quadratic form reduces to three 3x3 forms — pure column math,
    no matmul kernel needed. tpu[k] keys: var_x var_y var_z cov_xy
    cov_xz cov_yz (the FIXED order; the draft 'correct code.txt:257-259'
    had them scrambled — named columns kill that bug class).
    """
    terms = []
    for k in range(3):
        dx, dy, dz = d9[f"d{3 * k + 1}"], d9[f"d{3 * k + 2}"], d9[f"d{3 * k + 3}"]
        t = tpu[k]
        terms.append(
            f"({dx}*{dx}*{t['var_x']} + {dy}*{dy}*{t['var_y']} + {dz}*{dz}*{t['var_z']}"
            f" + 2*{dx}*{dy}*{t['cov_xy']} + 2*{dx}*{dz}*{t['cov_xz']}"
            f" + 2*{dy}*{dz}*{t['cov_yz']})"
        )
    return "(" + " + ".join(terms) + ")"
