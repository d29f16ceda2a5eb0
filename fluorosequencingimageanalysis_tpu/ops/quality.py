"""Fit-quality metrics: R^2, RMSE, Illumina S/N — batched over patches.

Parity:
- R^2 and RMSE over the SxS fit area: /root/reference/pflib.py:461-472.
- Illumina S/N = (max(patch) - mean(edge)) / std(edge) where edge is the
  one-pixel boundary ring: /root/reference/pflib.py:261-281 (population std).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def r_squared(sub_imgs, fit_imgs):
    """(N,) coefficient of determination per patch."""
    sub = sub_imgs.reshape(sub_imgs.shape[0], -1)
    fit = fit_imgs.reshape(fit_imgs.shape[0], -1)
    ss_res = jnp.sum((sub - fit) ** 2, axis=-1)
    mean = jnp.mean(sub, axis=-1, keepdims=True)
    ss_tot = jnp.sum((sub - mean) ** 2, axis=-1)
    return 1.0 - ss_res / ss_tot


def rmse(sub_imgs, fit_imgs):
    """(N,) root-mean-square error per patch."""
    sub = sub_imgs.reshape(sub_imgs.shape[0], -1)
    fit = fit_imgs.reshape(fit_imgs.shape[0], -1)
    return jnp.sqrt(jnp.mean((sub - fit) ** 2, axis=-1))


def edge_ring_indices(size: int) -> np.ndarray:
    """Static flat indices of the one-pixel boundary ring of a size^2 patch."""
    m = np.zeros((size, size), dtype=bool)
    m[0, :] = m[-1, :] = True
    m[:, 0] = m[:, -1] = True
    return np.nonzero(m.reshape(-1))[0]


def illumina_s_n(sub_imgs):
    """(N,) Illumina signal-to-noise per square patch."""
    n, size = sub_imgs.shape[0], sub_imgs.shape[-1]
    ring = edge_ring_indices(size)
    flat = sub_imgs.reshape(n, -1)
    ring_vals = flat[:, ring]
    edge_mean = jnp.mean(ring_vals, axis=-1)
    edge_std = jnp.std(ring_vals, axis=-1)
    return (jnp.max(flat, axis=-1) - edge_mean) / edge_std
