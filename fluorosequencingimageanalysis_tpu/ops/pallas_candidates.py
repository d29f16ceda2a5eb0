"""Fused Pallas candidate kernel: median filter + template correlation.

The candidate map (pflib.py:240-250 semantics: symmetric-boundary 5x5
median background subtraction, zero-padded 5x5 template correlation,
clip at 0) is memory-bound. The jnp composition costs ~10 ms per 512x512
field on one chip: XLA lowers the 25-way median to a general sort over a
26 MB stacked tensor and the single-channel conv tiles poorly.

This kernel processes the field in row blocks: each grid step DMAs one
block plus an 8-row halo (4 for the median stencil + 4 for the
correlation stencil) from HBM into VMEM, computes the median of the 25
shifted views with an odd-even-transposition min/max network on the VPU
(all shifts are pltpu.roll rotations — no unaligned slices), applies the
25-tap correlation with compile-time-constant weights, and writes the
block of the correlation map. Live VMEM is ~5 MB per step regardless of
image size.
"""

from __future__ import annotations

import functools

import jax

from ..utils.jaxcache import ensure_atomic_cache_writes

ensure_atomic_cache_writes()  # see utils/jaxcache (torn-cache-entry hazard)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _median25(vals):
    """Median of 25 equal-shape arrays via odd-even transposition sort."""
    v = list(vals)
    n = len(v)
    for rnd in range(n):
        for i in range(rnd % 2, n - 1, 2):
            lo = jnp.minimum(v[i], v[i + 1])
            hi = jnp.maximum(v[i], v[i + 1])
            v[i], v[i + 1] = lo, hi
    return v[n // 2]


def _roll2(x, sh, sw):
    """Rotation bringing x[y+sh, x+sw] to [y, x]."""
    out = x
    if sh % x.shape[0] != 0:
        out = pltpu.roll(out, shift=(-sh) % x.shape[0], axis=0)
    if sw % x.shape[1] != 0:
        out = pltpu.roll(out, shift=(-sw) % x.shape[1], axis=1)
    return out


def _make_candidate_kernel(h, w, wp, bh, kernel_np):
    taps = [(a, b, float(kernel_np[a, b])) for a in range(5)
            for b in range(5) if kernel_np[a, b] != 0.0]

    def kernel_fn(p2_hbm, cm_ref, scratch, sem):
        b = pl.program_id(0)
        ib = pl.program_id(1)
        r0 = ib * bh
        # S[t, :] = P2[r0 + t, :], t in [0, bh + 8); P2 is the
        # symmetric-padded image with 2 extra zero rows above and below,
        # so S[t] covers global mf rows [r0 - 2, r0 + bh + 2) + stencils.
        dma = pltpu.make_async_copy(
            p2_hbm.at[b, pl.ds(r0, bh + 8), :], scratch, sem)
        dma.start()
        dma.wait()
        S = scratch[:]
        # med_L[t, x] = median(S[t:t+5, x:x+5]) = median of the 5x5
        # neighborhood of global image pixel (r0 - 2 + t, x).
        views = [_roll2(S, i, j) for i in range(5) for j in range(5)]
        med = _median25(views)
        center = _roll2(S, 2, 2)
        mf = center - jnp.minimum(med, center)
        # Zero outside the valid global region (zero padding for the
        # correlation; also kills the wrapped rotation bands).
        rows = jax.lax.broadcasted_iota(jnp.int32, S.shape, 0) + (r0 - 2)
        cols = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
        mf = jnp.where((rows >= 0) & (rows < h) & (cols < w), mf, 0.0)
        # out[r0 + u, X] = sum_ab k[a, b] * mf_global[r0 + u + a - 2,
        # X + b - 2] = sum_ab k * mf[u + a, X + b - 2].
        acc = jnp.zeros_like(mf)
        for a, b, kv in taps:
            acc = acc + kv * _roll2(mf, a, b - 2)
        cm_ref[0, :, :] = jnp.maximum(acc[0:bh, 0:w], 0.0)

    return kernel_fn


@functools.partial(jax.jit,
                   static_argnames=("kernel_key", "h", "w", "bh",
                                    "interpret"))
def _candidate_map_fused_impl(p2, kernel_key, h, w, bh, interpret):
    kernel_np = np.asarray(kernel_key.arr, dtype=np.float64)
    batch, _, wp = p2.shape
    n_blocks = h // bh
    return pl.pallas_call(
        _make_candidate_kernel(h, w, wp, bh, kernel_np),
        grid=(batch, n_blocks),
        out_shape=jax.ShapeDtypeStruct((batch, h, w), p2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, bh, w), lambda b, ib: (b, ib, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bh + 8, wp), p2.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(p2)


from .candidates import HashableArray as _HashableArray


def candidate_map_fused(images, kernel, block_rows=64, interpret=None):
    """Correlation maps with pflib semantics, fused in VMEM row blocks.

    interpret=None auto-selects Pallas interpret mode on non-TPU backends,
    so the kernel (and any sharding wrapped around it) stays executable in
    CPU tests.

    images: (H, W) or (B, H, W) float32 with H divisible by block_rows.
    kernel: (5, 5) array (compile-time weights).
    Returns image_cm = max(correlate(image - min(med5(image), image),
    kernel, 'same'), 0) with symmetric median boundary / zero-padded
    correlation — matching ops.candidates.candidate_map's recipe. Output
    shape matches the input's batchedness.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    single = images.ndim == 2
    if single:
        images = images[None]
    b, h, w = images.shape
    while h % block_rows != 0 and block_rows > 8:
        block_rows //= 2
    if h % block_rows != 0:
        # Odd/indivisible heights: one block per image if the (h + 8)-row
        # canvas still fits VMEM comfortably, else the jnp recipe path is
        # the right tool (find_candidates_batch falls back on ValueError).
        wp_probe = -(-(w + 4) // 128) * 128
        if (h + 8) * wp_probe * 4 <= 12 * 2 ** 20:
            block_rows = h
        else:
            raise ValueError(f"image height {h} not divisible by a block "
                             "size")
    padded = jnp.pad(images, ((0, 0), (2, 2), (2, 2)), mode="symmetric")
    # Zero guard rows for the halo; lane-align the canvas width to 128
    # (the extra columns are masked out inside the kernel).
    wp = -(-(w + 4) // 128) * 128
    p2 = jnp.pad(padded, ((0, 0), (2, 2), (0, wp - (w + 4))))
    out = _candidate_map_fused_impl(p2, _HashableArray(kernel), h, w,
                                    block_rows, interpret)
    return out[0] if single else out
