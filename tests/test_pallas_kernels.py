"""Parity tests for Pallas kernels (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from fluorosequencingimageanalysis_tpu.ops.candidates import (
    candidate_map, DEFAULT_CORRELATION_MATRIX)
from fluorosequencingimageanalysis_tpu.ops.pallas_candidates import (
    candidate_map_fused)


def test_fused_candidate_map_matches_jnp():
    rng = np.random.default_rng(0)
    img = rng.normal(400, 10, (64, 128)).astype(np.float32)
    hh, ww = np.indices((64, 128)).astype(np.float32)
    for h, w in [(10, 20), (40, 100), (60, 5)]:
        img += 3000 * np.exp(-(((hh - h) ** 2) + ((ww - w) ** 2)) / 3.0)
    kern = np.asarray(DEFAULT_CORRELATION_MATRIX, np.float32)
    ref, _ = candidate_map(jnp.asarray(img))
    fused = candidate_map_fused(jnp.asarray(img), kern, block_rows=16,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=2e-4, atol=5e-2)


def test_fused_candidate_map_batched():
    rng = np.random.default_rng(1)
    imgs = rng.normal(400, 10, (3, 32, 128)).astype(np.float32)
    kern = np.asarray(DEFAULT_CORRELATION_MATRIX, np.float32)
    fused = candidate_map_fused(jnp.asarray(imgs), kern, block_rows=16,
                                interpret=True)
    assert fused.shape == (3, 32, 128)
    for b in range(3):
        ref, _ = candidate_map(jnp.asarray(imgs[b]))
        np.testing.assert_allclose(np.asarray(fused[b]), np.asarray(ref),
                                   rtol=2e-4, atol=5e-2)


def test_fused_candidate_map_shape_sweep():
    """Non-128-multiple widths, odd heights, heights not divisible by
    block_rows: the kernel's canvas padding and halo handling must stay
    exact against the jnp recipe."""
    rng = np.random.default_rng(2)
    kern = np.asarray(DEFAULT_CORRELATION_MATRIX, np.float32)
    for (h, w) in [(48, 100), (33, 257), (70, 130), (96, 384)]:
        img = rng.normal(400, 10, (h, w)).astype(np.float32)
        hh, ww = np.indices((h, w)).astype(np.float32)
        img += 3000 * np.exp(-(((hh - h // 2) ** 2) +
                               ((ww - w // 2) ** 2)) / 3.0)
        ref, _ = candidate_map(jnp.asarray(img))
        fused = candidate_map_fused(jnp.asarray(img), kern, block_rows=16,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=2e-4, atol=5e-2,
                                   err_msg=f"shape {(h, w)}")
