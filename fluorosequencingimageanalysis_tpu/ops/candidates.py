"""Candidate-pixel detection: median filter, template correlation, threshold.

Reference algorithm (/root/reference/pflib.py:217-258, steps 1-2 of
find_peptides):
1. background removal: ``image - min(median_filter(image, k), image)``
   (scipy.ndimage.median_filter, default 'reflect' boundary),
2. correlate with a square PSF template (scipy.signal.correlate mode='same',
   zero padding), clip at 0,
3. keep pixels with correlation >= mean + c_std * std (population std),
   excluding a 2-pixel border.

TPU design: the per-pixel Python loop becomes a fused array program — the
median filter is a 25-way sorted reduction over shifted views, the template
correlation a lax conv (correlation; XLA convs don't flip kernels), and the
candidate set is extracted with a static-shape top-k so the downstream fit
runs on a padded [max_candidates] bucket with a validity mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

# Empirical 5x5 PSF correlation template (/root/reference/pflib.py:48-52).
DEFAULT_CORRELATION_MATRIX = np.array(
    [[-5935, -5935, -5935, -5935, -5935],
     [-5935,  8027,  8027,  8027, -5935],
     [-5935,  8027, 30742,  8027, -5935],
     [-5935,  8027,  8027,  8027, -5935],
     [-5935, -5935, -5935, -5935, -5935]], dtype=np.float64)


def median_filter_2d(image, size: int):
    """Square median filter with scipy-'reflect' (jnp 'symmetric') boundary."""
    r_lo = (size - 1) // 2
    r_hi = size // 2
    padded = jnp.pad(image, ((r_lo, r_hi), (r_lo, r_hi)), mode="symmetric")
    h, w = image.shape
    views = [padded[i:i + h, j:j + w]
             for i in range(size) for j in range(size)]
    stacked = jnp.stack(views, axis=0)
    return jnp.median(stacked, axis=0)


def correlate_2d_same(image, kernel):
    """2D cross-correlation, zero-padded 'same' (scipy.signal.correlate)."""
    img4 = image[None, None, :, :]
    ker4 = kernel[None, None, :, :].astype(image.dtype)
    out = lax.conv_general_dilated(
        img4, ker4, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST)
    return out[0, 0]


def candidate_map(image, median_filter_size=5, correlation_matrix=None,
                  c_std=2.0):
    """Correlation image and candidate mask.

    Returns (image_cm, mask) where mask marks candidate pixels. Pixels within
    2 of the border are excluded (5x5 fit patches must stay in-bounds,
    pflib.py:252-253).
    """
    if correlation_matrix is None:
        correlation_matrix = DEFAULT_CORRELATION_MATRIX
    kernel = jnp.asarray(correlation_matrix, dtype=image.dtype)
    image = image.astype(kernel.dtype)
    med = median_filter_2d(image, median_filter_size)
    image_mf = image - jnp.minimum(med, image)
    image_cm = jnp.maximum(correlate_2d_same(image_mf, kernel), 0.0)
    threshold = jnp.mean(image_cm) + c_std * jnp.std(image_cm)
    h, w = image.shape
    hh = jnp.arange(h)[:, None]
    ww = jnp.arange(w)[None, :]
    interior = ((hh >= 2) & (hh < h - 2) & (ww >= 2) & (ww < w - 2))
    mask = (image_cm >= threshold) & interior
    return image_cm, mask


@functools.partial(jax.jit, static_argnames=(
    "median_filter_size", "c_std", "max_candidates"))
def find_candidates(image, median_filter_size=5, correlation_matrix=None,
                    c_std=2.0, max_candidates=4096):
    """Static-shape candidate extraction.

    Returns:
        hs, ws: (max_candidates,) int32 candidate pixel coordinates (padded
            entries point at (2, 2) so patch gathers stay in-bounds).
        valid: (max_candidates,) bool validity mask.
        count: scalar int32, true number of candidates (may exceed
            max_candidates; compare to detect overflow — never silently).
    """
    image_cm, mask = candidate_map(image, median_filter_size,
                                   correlation_matrix, c_std)
    flat_scores = jnp.where(mask, image_cm, -jnp.inf).reshape(-1)
    count = jnp.sum(mask.astype(jnp.int32))
    top_scores, top_idx = lax.top_k(flat_scores, max_candidates)
    valid = top_scores > -jnp.inf
    w = image.shape[1]
    hs = jnp.where(valid, top_idx // w, 2).astype(jnp.int32)
    ws = jnp.where(valid, top_idx % w, 2).astype(jnp.int32)
    return hs, ws, valid, count


def gather_patches(image, hs, ws, radius=2):
    """Gather (2r+1)x(2r+1) patches centered at (hs, ws), vmapped."""
    size = 2 * radius + 1

    def one(h, w):
        return lax.dynamic_slice(image, (h - radius, w - radius),
                                 (size, size))

    return jax.vmap(one)(hs, ws)
