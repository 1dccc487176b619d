"""NCC + sub-pixel peak + covariance propagation kernels (NumPy).

Batched per-tile math used inside applyInPandas (one Python call per
TILE, never per row — the engine's only Python). Reproduces the
reference semantics:

- NCC definition: ncc = sum(t_hat * s_hat) / T^2 with ddof=0
  normalization (piv_functions.py:287-292, the spatial-domain form;
  skimage's FFT match_template computes the same quantity,
  piv_functions.py:138).
- sub-pixel peak: 2-D quadratic fit (piv_functions.py:224-236).
- E1 pixel->correlation: Sigma_ncc = J diag(sigma^2) J^T over template
  + (T+2)^2 search pixels (piv_functions.py:239-303). The reference
  builds J by O(T^4) numeric forward differences (increment 1e-6);
  the engine uses the ANALYTIC derivative of the same function —
  d ncc / d t_k = (s_hat_k - ncc * t_hat_k) / (T^2 sigma_t), and
  symmetrically for search pixels — ~10^4x fewer flops at T=100.
  The numeric variant is kept ONLY as a test oracle.
- E2 correlation->peak: 2x9 numeric Jacobian (cheap: 9 evals of a
  rational function), matching piv_functions.py:306-326.
"""

from __future__ import annotations

import numpy as np

EPS_FLAT = 1e-10  # flat-window guard threshold (piv_functions.py:133)
INCREMENT = 1e-6  # reference numeric-diff increment (piv_functions.py:98)


def _norm(a: np.ndarray) -> tuple[np.ndarray, float]:
    s = a.std()
    return (a - a.mean()) / s, s


def ncc_spatial(search_sub: np.ndarray, template: np.ndarray) -> float:
    """Single-offset NCC (the reference's spatial-domain form)."""
    t_hat, _ = _norm(template)
    s_hat, _ = _norm(search_sub)
    return float(np.sum(t_hat * s_hat) / template.size)


def ncc_surface(search: np.ndarray, template: np.ndarray) -> np.ndarray:
    """Full (S-T+1)^2 NCC surface, FFT cross-correlation + integral images.

    Equivalent to evaluating ncc_spatial at every offset; O(S^2 log S)
    instead of O(S^2 T^2).
    """
    S0, S1 = search.shape
    T0, T1 = template.shape
    out_shape = (S0 - T0 + 1, S1 - T1 + 1)
    n = T0 * T1

    tz = template - template.mean()
    sig_t = template.std()

    # cross-correlation search (x) tz via FFT, 'valid' region
    fs = np.fft.rfft2(search)
    ft = np.fft.rfft2(tz[::-1, ::-1], s=search.shape)
    cc = np.fft.irfft2(fs * ft, s=search.shape)
    num = cc[T0 - 1 : T0 - 1 + out_shape[0], T1 - 1 : T1 - 1 + out_shape[1]]

    # windowed mean/std of search via integral images
    ii1 = np.cumsum(np.cumsum(np.pad(search, ((1, 0), (1, 0))), 0), 1)
    ii2 = np.cumsum(np.cumsum(np.pad(search * search, ((1, 0), (1, 0))), 0), 1)

    def wsum(ii):
        return (
            ii[T0:, T1:]
            - ii[:-T0, T1:]
            - ii[T0:, :-T1]
            + ii[:-T0, :-T1]
        )

    s1 = wsum(ii1)
    s2 = wsum(ii2)
    mean_s = s1 / n
    var_s = np.maximum(s2 / n - mean_s * mean_s, 0.0)
    sig_s = np.sqrt(var_s)

    denom = n * sig_t * sig_s
    with np.errstate(divide="ignore", invalid="ignore"):
        ncc = np.where(denom > 0, num / denom, 0.0)
    return ncc


def subpixel_peak(p: np.ndarray) -> tuple[float, float]:
    """(hz_delta, vt_delta) from a 3x3 NCC patch; quadratic surface fit."""
    dx = (p[1, 2] - p[1, 0]) / 2
    dxx = p[1, 2] + p[1, 0] - 2 * p[1, 1]
    dy = (p[2, 1] - p[0, 1]) / 2
    dyy = p[2, 1] + p[0, 1] - 2 * p[1, 1]
    dxy = (p[2, 2] - p[2, 0] - p[0, 2] + p[0, 0]) / 4
    den = dxx * dyy - dxy * dxy
    return (
        float(-(dyy * dx - dxy * dy) / den),
        float(-(dxx * dy - dxy * dx) / den),
    )


def analytic_correlation_jacobian(template: np.ndarray,
                                  search: np.ndarray) -> np.ndarray:
    """9 x (T^2 + search.size) analytic Jacobian of the 3x3 NCC patch.

    Row r*3+c differentiates ncc(r, c) w.r.t. every template pixel
    (row-major) then every search pixel (row-major) — the exact layout
    the reference's numeric builder produces (piv_functions.py:299-302).
    """
    T0, T1 = template.shape
    n = template.size
    t_hat, sig_t = _norm(template)
    jac = np.zeros((9, n + search.size))
    for r in range(3):
        for c in range(3):
            sub = search[r : r + T0, c : c + T1]
            s_hat, sig_s = _norm(sub)
            if not sig_s > EPS_FLAT:
                # constant shifted sub-window: NCC at this offset is
                # 0/0-undefined even when the FULL search window passed
                # the flat guard (e.g. all variation in the outer 1-px
                # border). Contribute zero gradient instead of the
                # silent inf/NaN covariance a 0-sigma divide produces.
                continue
            f = float(np.sum(t_hat * s_hat) / n)
            d_t = (s_hat - f * t_hat) / (n * sig_t)
            d_s_local = (t_hat - f * s_hat) / (n * sig_s)
            d_s = np.zeros_like(search)
            d_s[r : r + T0, c : c + T1] = d_s_local
            row = r * 3 + c
            jac[row, :n] = d_t.ravel()
            jac[row, n:] = d_s.ravel()
    return jac


def numeric_correlation_jacobian(template: np.ndarray, search: np.ndarray,
                                 ncc33: np.ndarray,
                                 h: float = INCREMENT) -> np.ndarray:
    """Reference-semantics forward-difference Jacobian (TEST ORACLE ONLY).

    Same output layout as analytic_correlation_jacobian; O(T^4).
    """
    T0, T1 = template.shape
    n = template.size
    t_hat, _ = _norm(template)
    jac = np.zeros((9, n + search.size))
    for r in range(3):
        for c in range(3):
            sub = search[r : r + T0, c : c + T1]
            s_hat, _ = _norm(sub)
            base = ncc33[r, c]
            row = r * 3 + c
            dt = np.zeros((T0, T1))
            ds = np.zeros_like(search)
            for i in range(T0):
                for j in range(T1):
                    tp = template.copy()
                    tp[i, j] += h
                    tp_hat, _ = _norm(tp)
                    dt[i, j] = (np.sum(tp_hat * s_hat) / n - base) / h
                    sp = sub.copy()
                    sp[i, j] += h
                    sp_hat, _ = _norm(sp)
                    ds[r + i, c + j] = (np.sum(t_hat * sp_hat) / n - base) / h
            jac[row, :n] = dt.ravel()
            jac[row, n:] = ds.ravel()
    return jac


def propagate_pixel_into_correlation(jacobian: np.ndarray,
                                     unc_template: np.ndarray,
                                     unc_search: np.ndarray) -> np.ndarray:
    """E1: Sigma_ncc (9x9) = J diag([unc_t^2, unc_s^2]) J^T.

    Input covariance is diagonal (squared standard deviations,
    piv_functions.py:246-249), so the product is (J * var) @ J.T —
    no 9x9xN matmul materialized.
    """
    var = np.concatenate([np.square(unc_template.ravel()),
                          np.square(unc_search.ravel())])
    return (jacobian * var) @ jacobian.T


def propagate_correlation_into_subpixel_peak(ncc33: np.ndarray,
                                             corr_cov: np.ndarray,
                                             peak: tuple[float, float],
                                             h: float = INCREMENT) -> np.ndarray:
    """E2: 2x2 peak covariance via 2x9 numeric Jacobian (cheap, 9 evals)."""
    jac = np.zeros((2, 9))
    for r in range(3):
        for c in range(3):
            p = ncc33.copy()
            p[r, c] += h
            hz, vt = subpixel_peak(p)
            jac[0, r * 3 + c] = (hz - peak[0]) / h
            jac[1, r * 3 + c] = (vt - peak[1]) / h
    return jac @ corr_cov @ jac.T
