"""Single-process NumPy oracle: faithful reference-semantics PIV.

Independent of the engine's FFT path — NCC computed offset-by-offset
with the spatial-domain formula, Jacobians by numeric forward
difference (increment 1e-6, piv_functions.py:98). Used only by tests.
"""

from __future__ import annotations

import math

import numpy as np

from gpiv_spark.functions import ncc as ncck


def piv_oracle(before: np.ndarray, after: np.ndarray, template: int,
               step: int, scale: int, propagate: bool = False,
               before_unc: np.ndarray | None = None,
               after_unc: np.ndarray | None = None) -> list[dict]:
    """Reference run_piv semantics (piv_functions.py:89-187), pure NumPy."""
    search = template * scale
    pad = search % 2
    nvt = (before.shape[0] - search) // step
    nhz = (before.shape[1] - search) // step
    off = (scale - 1) * template // 2
    out = []
    for vt in range(nvt):
        for hz in range(nhz):
            t = before[vt * step + off : vt * step + off + template,
                       hz * step + off : hz * step + off + template]
            s = after[vt * step : vt * step + search + pad,
                      hz * step : hz * step + search + pad]
            if (np.isnan(t).any() or np.isnan(s).any()
                    or t.max() - t.min() < 1e-10 or s.max() - s.min() < 1e-10):
                continue
            nr = s.shape[0] - template + 1
            nc = s.shape[1] - template + 1
            surf = np.empty((nr, nc))
            for r in range(nr):
                for c in range(nc):
                    surf[r, c] = ncck.ncc_spatial(
                        s[r : r + template, c : c + template], t
                    )
            rmax, cmax = np.unravel_index(int(np.argmax(surf)), surf.shape)
            if rmax in (0, nr - 1) or cmax in (0, nc - 1):
                continue
            p33 = surf[rmax - 1 : rmax + 2, cmax - 1 : cmax + 2]
            hz_d, vt_d = ncck.subpixel_peak(p33)
            rec = {
                "tile_r": vt,
                "tile_c": hz,
                "origin_x_px": hz * step + math.floor(search / 2) - (1 - search % 2) * 0.5,
                "origin_y_px": vt * step + math.floor(search / 2) - (1 - search % 2) * 0.5,
                "dx_px": cmax - math.ceil(template / 2) + hz_d,
                "dy_px": rmax - math.ceil(template / 2) + vt_d,
            }
            if propagate:
                ut = before_unc[vt * step + off : vt * step + off + template,
                                hz * step + off : hz * step + off + template]
                s_sub = s[rmax - 1 : rmax + template + 1,
                          cmax - 1 : cmax + template + 1]
                u_sub = after_unc[vt * step : vt * step + search + pad,
                                  hz * step : hz * step + search + pad][
                    rmax - 1 : rmax + template + 1, cmax - 1 : cmax + template + 1
                ]
                jac = ncck.numeric_correlation_jacobian(t, s_sub, p33)
                cc = ncck.propagate_pixel_into_correlation(jac, ut, u_sub)
                pc = ncck.propagate_correlation_into_subpixel_peak(
                    p33, cc, (hz_d, vt_d)
                )
                rec.update(c00=pc[0, 0], c01=pc[0, 1], c10=pc[1, 0], c11=pc[1, 1])
            out.append(rec)
    return out
