"""Reference oracles for golden-value tests.

These are independent NumPy/SciPy implementations of the published algorithms
the reference pipeline uses (elliptical-Gaussian least squares, Welch t-tests,
Guizar-Sicairos phase correlation, ...), written from the algorithm
definitions. The TPU kernels must match them to documented tolerances.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import least_squares


def gauss2d_oracle(params, shape=(5, 5)):
    """Reference-convention 2D Gaussian on index grids (float64 NumPy).

    Same convention as fluorosequencingimageanalysis_tpu.ops.gaussian:
    p = (H, A, c2, c3, sh, sw, theta_deg); c3 pairs with the row axis and c2
    with the column axis (the agpy quirk).
    """
    H, A, c2, c3, sh, sw, th = [float(v) for v in params]
    rota = np.deg2rad(th)
    hh, ww = np.indices(shape).astype(np.float64)
    rcx = c3 * np.cos(rota) - c2 * np.sin(rota)
    rcy = c3 * np.sin(rota) + c2 * np.cos(rota)
    xp = hh * np.cos(rota) - ww * np.sin(rota)
    yp = hh * np.sin(rota) + ww * np.cos(rota)
    return H + A * np.exp(-(((rcx - xp) / sh) ** 2 +
                            ((rcy - yp) / sw) ** 2) / 2.0)


def fit_gaussian_oracle(patch, theta_fix=None):
    """Bounded least-squares fit of one patch with pflib's init and bounds.

    Uses scipy's trust-region-reflective solver; converged interior optima
    coincide with mpfit's stationary points.

    theta_fix: if given, pin theta to this value (mpfit pegs theta at its
        bound when the gradient points outside [0, 360]; TRF instead can
        travel to the wrapped-angle twin optimum, so pegged cases are
        compared with theta fixed to the pegged value).
    """
    patch = np.asarray(patch, dtype=np.float64)
    med = float(np.median(patch))
    amax = float(np.max(patch))
    amean = float(np.mean(patch))
    p0 = np.array([med, amax, 2.5, 2.5, 1.0, 1.0, 0.0])
    lo = np.array([0.0, (amax - amean) / 3.0, 2.0, 2.0, 0.75, 0.75, 0.0])
    hi = np.array([np.inf, np.inf, 3.0, 3.0, 2.0, 2.0, 360.0])
    if theta_fix is not None:
        p0[6] = theta_fix
        lo[6] = theta_fix - 1e-12
        hi[6] = theta_fix + 1e-12
    p0 = np.clip(p0, lo, hi + 0)  # mpfit-style start clipping

    def resid(p):
        return (gauss2d_oracle(p, patch.shape) - patch).ravel()

    sol = least_squares(resid, p0, bounds=(lo, hi), method="trf",
                        xtol=1e-14, ftol=1e-14, gtol=1e-14, max_nfev=2000)
    return sol.x, float(np.sum(sol.fun ** 2))
