"""Batched bounded Levenberg–Marquardt for 2D Gaussian PSF fits.

The reference fits every 5x5 candidate patch *one at a time* with the MINPACK
-lineage ``mpfit`` trust-region LM (/root/reference/agpy/mpfit/mpfit.py:1030-
1341; <=200 iterations x ~8 residual evaluations each, per spot). On TPU we
instead run thousands of fits as a single vmapped array program: each LM
iteration is a (N, 25, 7) Jacobian + a batch of (7, 7) solves, which XLA fuses
and tiles onto the MXU/VPU. The whole optimization runs in a single
``lax.fori_loop`` with the batch in lockstep.

Bound semantics follow mpfit's parinfo model:
- box constraints enforced by projecting trial steps into [lo, hi]
  (mpfit.py:1177-1231 clips steps to limits),
- parameters *pegged* at a bound with the gradient pushing outward have their
  Jacobian column zeroed (mpfit.py:1072-1091),
and the objective is the plain sum of squared residuals, so tightly-converged
solutions match mpfit's to within the 1e-3 target (interior optima are
algorithm-independent stationary points).

Default bounds/inits replicate pflib's empirical setup
(/root/reference/pflib.py:199-214):
    p0 = (median, max, 2.5, 2.5, 1, 1, 0)
    lo = (0, (max-mean)/3, 2, 2, 0.75, 0.75, 0)
    hi = (inf, inf, 3, 3, 2, 2, 360)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .gaussian import gauss2d_ref

_BIG = 1e30  # stand-in for +inf in bounds (keeps arithmetic finite)


def default_fit_init(patches):
    """Per-patch initial parameters, parity with pflib.py:199-206.

    patches: (N, S, S) float array.
    Returns (N, 7) initial parameter vectors.
    """
    med = jnp.median(patches.reshape(patches.shape[0], -1), axis=-1)
    amax = jnp.max(patches.reshape(patches.shape[0], -1), axis=-1)
    n = patches.shape[0]
    ones = jnp.ones((n,), patches.dtype)
    c = (patches.shape[-1] / 2.0) * ones  # 2.5 for 5x5
    return jnp.stack(
        [med, amax, c, c, ones, ones, jnp.zeros((n,), patches.dtype)], axis=-1)


def default_fit_bounds(patches):
    """Per-patch (lo, hi) bounds, parity with pflib.py:204-212.

    The amplitude lower bound is data-dependent: (max - mean) / 3.
    """
    flat = patches.reshape(patches.shape[0], -1)
    amax = jnp.max(flat, axis=-1)
    amean = jnp.mean(flat, axis=-1)
    n = patches.shape[0]
    dt = patches.dtype
    zeros = jnp.zeros((n,), dt)
    lo = jnp.stack([zeros, (amax - amean) / 3.0,
                    2.0 * jnp.ones((n,), dt), 2.0 * jnp.ones((n,), dt),
                    0.75 * jnp.ones((n,), dt), 0.75 * jnp.ones((n,), dt),
                    zeros], axis=-1)
    hi = jnp.stack([jnp.full((n,), _BIG, dt), jnp.full((n,), _BIG, dt),
                    3.0 * jnp.ones((n,), dt), 3.0 * jnp.ones((n,), dt),
                    2.0 * jnp.ones((n,), dt), 2.0 * jnp.ones((n,), dt),
                    360.0 * jnp.ones((n,), dt)], axis=-1)
    return lo, hi


def _residual(params, patch, h_grid, w_grid):
    """Flat residual vector model(p) - data, shape (S*S,)."""
    model = gauss2d_ref(params, h_grid, w_grid)
    return (model - patch).reshape(-1)


def _lm_single(patch, p0, lo, hi, h_grid, w_grid, num_iters,
               lam0, lam_up, lam_down):
    """LM fit for one patch. Designed to be vmapped over a batch."""
    dt = patch.dtype
    res_fn = lambda p: _residual(p, patch, h_grid, w_grid)
    jac_fn = jax.jacfwd(res_fn)
    eye = jnp.eye(7, dtype=dt)

    def cost_of(p):
        r = res_fn(p)
        return jnp.dot(r, r, precision=lax.Precision.HIGHEST)

    def body(_, state):
        p, lam, cost = state
        r = res_fn(p)
        J = jac_fn(p)  # (S*S, 7)
        # mpfit pegging (mpfit.py:1072-1091): zero Jacobian columns of
        # parameters sitting at a bound whose gradient pushes outward.
        g = jnp.einsum("ij,i->j", J, r, precision=lax.Precision.HIGHEST)
        eps_lo = jnp.maximum(jnp.abs(lo), 1.0) * 1e-7
        eps_hi = jnp.maximum(jnp.abs(hi), 1.0) * 1e-7
        pegged_lo = (p <= lo + eps_lo) & (g > 0)   # step -g would go below lo
        pegged_hi = (p >= hi - eps_hi) & (g < 0)   # step -g would go above hi
        free = ~(pegged_lo | pegged_hi)
        Jf = J * free[None, :].astype(dt)
        JtJ = jnp.einsum("ij,ik->jk", Jf, Jf,
                         precision=lax.Precision.HIGHEST)
        gf = g * free.astype(dt)
        diag = jnp.diagonal(JtJ)
        # Marquardt scaling. Degenerate directions (e.g. theta for circular
        # spots) have ~zero curvature; floor their damping relative to the
        # dominant diagonal so the junk component of the step stays bounded.
        diag_floor = jnp.maximum(1e-8 * jnp.max(diag), 1e-12)
        damp = lam * jnp.maximum(diag, diag_floor)
        A = JtJ + jnp.diag(damp) + diag_floor * eye
        delta = -jnp.linalg.solve(A, gf)
        p_new = jnp.clip(p + delta, lo, hi)
        new_cost = cost_of(p_new)
        accept = new_cost < cost
        p = jnp.where(accept, p_new, p)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept,
                        jnp.maximum(lam * lam_down, 1e-12),
                        jnp.minimum(lam * lam_up, 1e12))
        return p, lam, cost

    state0 = (p0, jnp.asarray(lam0, dt), cost_of(p0))
    p, _, cost = lax.fori_loop(0, num_iters, body, state0)
    return p, cost


@functools.partial(jax.jit, static_argnames=("num_iters",))
def fit_gaussians_batched(patches, p0=None, lo=None, hi=None, num_iters=60,
                          lam0=1e-3, lam_up=4.0, lam_down=0.25):
    """Fit the reference 2D Gaussian to a batch of square patches.

    Arguments:
        patches: (N, S, S) float array of pixel patches (raw intensity units).
        p0: optional (N, 7) initial parameters; defaults to pflib's empirical
            init (pflib.py:199-206).
        lo, hi: optional (N, 7) box bounds; default to pflib's parinfo bounds
            (pflib.py:204-212).
        num_iters: fixed LM iteration count (batch runs in lockstep; the
            reference allows up to 200 mpfit iterations, mpfit.py:602).

    Returns:
        params: (N, 7) fitted ``(H, A, h_0, w_0, sigma_h, sigma_w, theta)`` in
            patch coordinates and raw intensity units (reference convention,
            see ops.gaussian for the axis quirk).
        cost: (N,) final sum of squared residuals (raw units squared).

    Numerical note: each patch is normalized by its max absolute value before
    optimization (the model is linear in H and A, so only those two parameters
    and their bounds are rescaled). This keeps the LM well-conditioned in
    float32 on TPU regardless of camera bit depth.
    """
    patches = jnp.asarray(patches)
    dt = patches.dtype
    n, S = patches.shape[0], patches.shape[-1]
    if p0 is None:
        p0 = default_fit_init(patches)
    if lo is None or hi is None:
        dlo, dhi = default_fit_bounds(patches)
        lo = dlo if lo is None else lo
        hi = dhi if hi is None else hi
    # mpfit refuses out-of-range starts; gaussfit clips them in
    # (gaussfitter.py:201-204). Replicate.
    p0 = jnp.clip(p0, lo, hi)

    # Per-patch intensity normalization (affects only H and A linearly).
    scale = jnp.maximum(
        jnp.max(jnp.abs(patches.reshape(n, -1)), axis=-1), 1e-12)
    intensity_mask = jnp.array([1, 1, 0, 0, 0, 0, 0], dtype=bool)

    def rescale(v, s):
        return jnp.where(intensity_mask, v / s, v)

    patches_n = patches / scale[:, None, None]
    p0_n = jax.vmap(rescale)(p0, scale)
    lo_n = jax.vmap(rescale)(lo, scale)
    hi_n = jax.vmap(rescale)(hi, scale)

    h_grid, w_grid = jnp.meshgrid(jnp.arange(S, dtype=dt),
                                  jnp.arange(S, dtype=dt), indexing="ij")

    fit = jax.vmap(
        lambda patch, p, l, h: _lm_single(patch, p, l, h, h_grid, w_grid,
                                          num_iters, lam0, lam_up, lam_down))
    params_n, cost_n = fit(patches_n, p0_n, lo_n, hi_n)
    params = jax.vmap(lambda v, s: jnp.where(intensity_mask, v * s, v))(
        params_n, scale)
    cost = cost_n * scale ** 2
    return params, cost
