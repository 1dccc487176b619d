"""Spatial cell encoders: S2-style Z-order quadkeys + H3-style axial hex.

True H3/S2 cell ids are not reproducible without their native libs
(absent in this environment), so the engine defines its own documented
pure-function cell ids with the same *semantics* (hierarchical
containment, k-ring neighborhoods) over the fixture extent:

- ``zorder``: square cells, 2^res per axis, id = Morton interleave of
  (ix, iy). Hierarchical: parent id = child id >> 2. This is also the
  engine's range-partitioning key (space-filling-curve locality).
- ``hex``: pointy-top axial-hex cells with H3-ish edge lengths, cube
  rounding; k-ring = axial offsets at hex distance <= k.

Both are implemented as dialect-neutral SQL templates (Catalyst column
arithmetic on Spark — no Python in the path) plus NumPy twins for the
applyInPandas kernels. Coverage semantics mirror the reference's
containment query (tin_interpolation.py:76-83): a point's cell is the
join key, exact geometry refines after the equi-join.
"""

from __future__ import annotations

import math

import numpy as np

from gpiv_spark.dialect import Dialect
from gpiv_spark.functions.geocode import EXTENT, X0, Y0

# Masks for 16-bit Morton spread (classic magic numbers).
_SPREAD = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]

# H3 edge lengths in metres for res 7..10 (published H3 table, rounded);
# scaled semantics only — ids are engine-local.
HEX_EDGE_M = {7: 1220.63, 8: 461.35, 9: 174.38, 10: 65.91}

SQRT3 = math.sqrt(3.0)


# ---------------------------------------------------------------------------
# Z-order quadkey
# ---------------------------------------------------------------------------

def zcell_ix_expr(d: Dialect, x: str, res: int) -> str:
    """Cell x-index at resolution res (2^res cells across the extent)."""
    n = 1 << res
    e = d.big(f"floor(({x} - {X0!r}) / {EXTENT!r} * {n})")
    return f"greatest(0, least({n - 1}, {e}))"


def zcell_iy_expr(d: Dialect, y: str, res: int) -> str:
    n = 1 << res
    e = d.big(f"floor(({y} - {Y0!r}) / {EXTENT!r} * {n})")
    return f"greatest(0, least({n - 1}, {e}))"


def _spread_expr(d: Dialect, v: str) -> str:
    """Interleave-ready bit spread: abcd -> 0a0b0c0d (16 -> 32 bits)."""
    e = v
    for shift, mask in _SPREAD:
        e = d.band(d.bor(e, d.shl(e, shift)), str(mask))
    return e


def zorder_expr(d: Dialect, ix: str, iy: str) -> str:
    """Morton code: iy bits in odd positions, ix in even."""
    return d.bor(d.shl(_spread_expr(d, d.big(iy)), 1), _spread_expr(d, d.big(ix)))


def zcell_expr(d: Dialect, x: str, y: str, res: int) -> str:
    return zorder_expr(d, zcell_ix_expr(d, x, res), zcell_iy_expr(d, y, res))


def numpy_spread(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    for shift, mask in _SPREAD:
        v = (v | (v << shift)) & mask
    return v


def numpy_zcell(x, y, res: int):
    n = 1 << res
    ix = np.clip(np.floor((np.asarray(x) - X0) / EXTENT * n).astype(np.int64), 0, n - 1)
    iy = np.clip(np.floor((np.asarray(y) - Y0) / EXTENT * n).astype(np.int64), 0, n - 1)
    return (numpy_spread(iy) << 1) | numpy_spread(ix)


# ---------------------------------------------------------------------------
# Axial hex
# ---------------------------------------------------------------------------

def _hex_frac(x: str, y: str, size: float) -> tuple[str, str]:
    """Fractional axial coords (pointy-top) relative to extent origin."""
    xs = f"({x} - {X0!r})"
    ys = f"({y} - {Y0!r})"
    q = f"(({SQRT3!r} / 3.0 * {xs} - 1.0 / 3.0 * {ys}) / {size!r})"
    r = f"((2.0 / 3.0 * {ys}) / {size!r})"
    return q, r


def hex_qr_expr(d: Dialect, x: str, y: str, res: int) -> tuple[str, str]:
    """Cube-rounded axial (q, r) as int64 expressions.

    Cube rounding (Red Blob Games' published algorithm): round each of
    (x=q, z=r, y=-q-r), then fix the component with the largest
    rounding error so x+y+z == 0 holds.
    """
    size = HEX_EDGE_M[res]
    qf, rf = _hex_frac(x, y, size)
    # Bind the fractional coords once via nested parens; SQL engines CSE this.
    cx, cz = qf, rf
    cy = f"(-{qf} - {rf})"
    rx, ry, rz = f"round({cx})", f"round({cy})", f"round({cz})"
    dx = f"abs({rx} - {cx})"
    dy = f"abs({ry} - {cy})"
    dz = f"abs({rz} - {cz})"
    q_out = (
        f"CASE WHEN {dx} > {dy} AND {dx} > {dz} THEN (-{ry} - {rz}) "
        f"ELSE {rx} END"
    )
    r_out = (
        f"CASE WHEN NOT ({dx} > {dy} AND {dx} > {dz}) AND NOT ({dy} > {dz}) "
        f"THEN (-{rx} - {ry}) ELSE {rz} END"
    )
    return d.big(f"({q_out})"), d.big(f"({r_out})")


def hexcell_expr(d: Dialect, x: str, y: str, res: int) -> str:
    """Single int64 hex cell id: (q + 2^20) * 2^21 + (r + 2^20)."""
    q, r = hex_qr_expr(d, x, y, res)
    return f"(({q} + 1048576) * 2097152 + ({r} + 1048576))"


def numpy_hex_qr(x, y, res: int):
    size = HEX_EDGE_M[res]
    xs = np.asarray(x, dtype=np.float64) - X0
    ys = np.asarray(y, dtype=np.float64) - Y0
    qf = (SQRT3 / 3.0 * xs - ys / 3.0) / size
    rf = (2.0 / 3.0 * ys) / size
    cx, cz = qf, rf
    cy = -qf - rf

    # SQL round() is half-AWAY-from-zero in both Spark and DuckDB;
    # np.round is half-to-even — a .5 tie would give this "twin" a
    # different cell than hex_qr_expr (the CLAUDE.md float-rules trap)
    def _round_half_away(a):
        return np.sign(a) * np.floor(np.abs(a) + 0.5)

    rx, ry, rz = (_round_half_away(cx), _round_half_away(cy),
                  _round_half_away(cz))
    dx, dy, dz = np.abs(rx - cx), np.abs(ry - cy), np.abs(rz - cz)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    q = np.where(fix_x, -ry - rz, rx)
    r = np.where(fix_z, -rx - ry, rz)
    return q.astype(np.int64), r.astype(np.int64)


def hex_kring_offsets(k: int) -> list[tuple[int, int]]:
    """All axial offsets at hex distance <= k (the H3 k-ring)."""
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append((dq, dr))
    return out


def hex_distance(q1, r1, q2, r2):
    """Hex grid distance between axial coords (vectorized)."""
    dq = np.asarray(q1) - np.asarray(q2)
    dr = np.asarray(r1) - np.asarray(r2)
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
