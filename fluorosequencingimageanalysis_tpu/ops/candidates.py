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

from ..utils.jaxcache import ensure_atomic_cache_writes

ensure_atomic_cache_writes()  # see utils/jaxcache (torn-cache-entry hazard)
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


class HashableArray:
    """Static (hashable) array wrapper for compile-time kernel weights."""

    def __init__(self, arr):
        self.arr = np.asarray(arr)
        self._key = (self.arr.tobytes(), self.arr.shape, str(self.arr.dtype))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, HashableArray) and self._key == other._key


def median_filter_2d(image, size: int):
    """Square median filter with scipy-'reflect' (jnp 'symmetric') boundary.

    Even sizes follow scipy.ndimage.median_filter exactly — the
    reference calls it directly (pflib.py:244) — which means TWO
    conventions beyond the naive form: the extra tap sits on the
    NEGATIVE side (window offsets -(size//2) .. size//2 - 1), and the
    "median" is scipy's rank filter at rank n//2 (the UPPER median of an
    even-count window, not the middle-two average). For odd sizes both
    reduce to the ordinary centered median."""
    r_lo = size // 2
    r_hi = (size - 1) // 2
    padded = jnp.pad(image, ((r_lo, r_hi), (r_lo, r_hi)), mode="symmetric")
    h, w = image.shape
    views = [padded[i:i + h, j:j + w]
             for i in range(size) for j in range(size)]
    stacked = jnp.stack(views, axis=0)
    return jnp.sort(stacked, axis=0)[(size * size) // 2]


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


def _pad_topk(top_scores, top_idx, max_candidates):
    """Pad a k<max_candidates top_k result back to the static bucket
    (tiny images: top_k requires k <= pixel count; padding keeps the
    output shape contract)."""
    short = max_candidates - top_scores.shape[-1]
    if short <= 0:
        return top_scores, top_idx
    pad = [(0, 0)] * (top_scores.ndim - 1) + [(0, short)]
    return (jnp.pad(top_scores, pad, constant_values=-jnp.inf),
            jnp.pad(top_idx, pad))


def _threshold_and_extract(image_cm, max_candidates, c_std):
    """Shared masking + static-shape extraction from a correlation map."""
    h, w = image_cm.shape
    threshold = jnp.mean(image_cm) + c_std * jnp.std(image_cm)
    hh = jnp.arange(h)[:, None]
    ww = jnp.arange(w)[None, :]
    interior = ((hh >= 2) & (hh < h - 2) & (ww >= 2) & (ww < w - 2))
    mask = (image_cm >= threshold) & interior
    flat_scores = jnp.where(mask, image_cm, -jnp.inf).reshape(-1)
    count = jnp.sum(mask.astype(jnp.int32))
    k = min(max_candidates, flat_scores.shape[0])
    top_scores, top_idx = _pad_topk(*lax.top_k(flat_scores, k),
                                    max_candidates)
    valid = top_scores > -jnp.inf
    hs = jnp.where(valid, top_idx // w, 2).astype(jnp.int32)
    ws = jnp.where(valid, top_idx % w, 2).astype(jnp.int32)
    return hs, ws, valid, count


def _topk_sparse(flat, k, block_m=16):
    """Exact hierarchical top-k over sparse (-inf-masked) batched scores.

    A flat ``lax.top_k`` over H*W pixels is a full sort and dominates the
    candidate stage. Above-threshold pixels are sparse (mean + c_std*sigma
    threshold), so instead: take the top ``block_m`` of every 128-pixel
    lane block, then top-k over the merged (8x smaller) set. When every
    block holds <= block_m above-threshold pixels the per-block top is the
    complete above-threshold set, so the merge is EXACT; a lax.cond falls
    back to the flat top_k in the (rare) overflowing case. Tie ordering at
    exactly equal scores can differ from the flat sort — candidate order
    is semantically irrelevant downstream (the fit/NMS rank by R^2).
    """
    B, n = flat.shape
    pad = (-n) % 128
    flat_p = jnp.pad(flat, ((0, 0), (0, pad)),
                     constant_values=-jnp.inf) if pad else flat
    blocks = flat_p.reshape(B, -1, 128)
    nb = blocks.shape[1]

    if k > nb * block_m or n <= nb * block_m:
        return lax.top_k(flat, k)
    blk_counts = jnp.sum(blocks > -jnp.inf, axis=2)
    cheap_is_exact = jnp.max(blk_counts) <= block_m

    def cheap(_):
        bs, bi = lax.top_k(blocks, block_m)
        base = (jnp.arange(nb, dtype=bi.dtype) * 128)[None, :, None]
        merged_idx = (bi + base).reshape(B, -1)
        ts, ti = lax.top_k(bs.reshape(B, -1), k)
        return ts, jnp.take_along_axis(merged_idx, ti, axis=1)

    def full(_):
        ts, ti = lax.top_k(flat, k)
        return ts, ti

    return lax.cond(cheap_is_exact, cheap, full, None)


def _candidate_mask_batch(cms, c_std):
    """Threshold mask over batched correlation maps (pflib.py:250-253):
    cm >= mean + c_std * population std, 2-px border excluded."""
    B, h, w = cms.shape
    mean = jnp.mean(cms, axis=(1, 2), keepdims=True)
    std = jnp.std(cms, axis=(1, 2), keepdims=True)
    hh = jnp.arange(h)[:, None]
    ww = jnp.arange(w)[None, :]
    interior = ((hh >= 2) & (hh < h - 2) & (ww >= 2) & (ww < w - 2))
    return (cms >= mean + c_std * std) & interior


def _threshold_and_extract_batch(cms, max_candidates, c_std, block_m=16):
    """Batched extraction via the exact hierarchical top-k."""
    B, h, w = cms.shape
    mask = _candidate_mask_batch(cms, c_std)
    flat = jnp.where(mask, cms, -jnp.inf).reshape(B, -1)
    count = jnp.sum(mask.reshape(B, -1).astype(jnp.int32), axis=1)
    k = min(max_candidates, flat.shape[1])  # top_k needs k <= n (tiny imgs)
    top_scores, top_idx = _topk_sparse(flat, k, block_m)
    top_scores, top_idx = _pad_topk(top_scores, top_idx, max_candidates)
    valid = top_scores > -jnp.inf
    hs = jnp.where(valid, top_idx // w, 2).astype(jnp.int32)
    ws = jnp.where(valid, top_idx % w, 2).astype(jnp.int32)
    return hs, ws, valid, count


@functools.partial(jax.jit, static_argnames=("chunk", "c_std", "block_m"))
def extract_candidates_chunk(cms, excluded, chunk, c_std, block_m=16):
    """One chunk of EXHAUSTIVE candidate extraction.

    The reference has no candidate cap at all (pflib.py:217-258 fits every
    above-threshold pixel); a single static [K] bucket caps K at whatever
    the backend's compiler tolerates (a 4096-candidate single-image
    program SIGABRTs the bench backend, DESIGN.md section 14). Chunking
    sidesteps the cliff: every dispatch extracts the top-``chunk``
    not-yet-extracted candidates, carrying a device-resident ``excluded``
    [B, H*W] mask between calls — k dispatches of ONE compiled program
    cover any candidate count.

    Chunks concatenate in the exact order a single big top-k would
    produce (scores strictly ordered across chunks; index tie-break
    within each), so downstream order-sensitive semantics (psfs-dict
    first-occurrence dedup, NMS index tie-break) match the single-bucket
    program.

    Returns (hs, ws, valid, remaining, new_excluded): ``remaining``
    counts the above-threshold pixels not yet excluded at ENTRY — the
    first call's value is the total candidate count.
    """
    B, h, w = cms.shape
    mask = _candidate_mask_batch(cms, c_std) & ~excluded.reshape(B, h, w)
    flat = jnp.where(mask, cms, -jnp.inf).reshape(B, -1)
    remaining = jnp.sum(mask.reshape(B, -1).astype(jnp.int32), axis=1)
    k = min(chunk, flat.shape[1])
    top_scores, top_idx = _topk_sparse(flat, k, block_m)
    top_scores, top_idx = _pad_topk(top_scores, top_idx, chunk)
    valid = top_scores > -jnp.inf
    rows = jnp.arange(B)[:, None]
    new_excluded = excluded.at[rows, top_idx].max(valid)
    hs = jnp.where(valid, top_idx // w, 2).astype(jnp.int32)
    ws = jnp.where(valid, top_idx % w, 2).astype(jnp.int32)
    return hs, ws, valid, remaining, new_excluded


def _correlation_maps(images, median_filter_size, corr_np, use_pallas):
    """Traced body: per-image correlation maps (median-filter background
    removal + template correlation, clipped at 0) — pflib.py:242-248."""
    if use_pallas:
        from .pallas_candidates import candidate_map_fused
        return candidate_map_fused(images, corr_np)
    kernel = jnp.asarray(corr_np, images.dtype)

    def one_cm(image):
        med = median_filter_2d(image, median_filter_size)
        image_mf = image - jnp.minimum(med, image)
        return jnp.maximum(correlate_2d_same(image_mf, kernel), 0.0)

    return jax.vmap(one_cm)(images)


@functools.partial(jax.jit, static_argnames=(
    "median_filter_size", "correlation_matrix", "use_pallas"))
def candidate_maps_batch(images, median_filter_size=5,
                         correlation_matrix=None, use_pallas=False):
    """Jitted batched correlation maps (no extraction) — the shared front
    half of find_candidates_batch, exposed so the exhaustive chunked
    driver computes the maps ONCE and extracts chunk-by-chunk."""
    if correlation_matrix is None:
        correlation_matrix = HashableArray(DEFAULT_CORRELATION_MATRIX)
    corr_np = correlation_matrix.arr
    if use_pallas and (median_filter_size != 5 or corr_np.shape != (5, 5)):
        use_pallas = False
    return _correlation_maps(images, median_filter_size, corr_np,
                             bool(use_pallas))


@functools.partial(jax.jit, static_argnames=(
    "median_filter_size", "correlation_matrix", "c_std", "max_candidates",
    "use_pallas"))
def find_candidates_batch(images, median_filter_size=5,
                          correlation_matrix=None, c_std=2.0,
                          max_candidates=4096, use_pallas=False):
    """Batched static-shape candidate extraction over (B, H, W) images.

    Returns (hs, ws, valid, count) with leading batch dimension. On TPU
    (use_pallas=True) the correlation maps come from the fused Pallas
    kernel (one HBM pass per image); elsewhere from the jnp recipe.
    """
    if correlation_matrix is None:
        correlation_matrix = HashableArray(DEFAULT_CORRELATION_MATRIX)
    corr_np = correlation_matrix.arr
    if use_pallas and (median_filter_size != 5 or corr_np.shape != (5, 5)):
        # The fused kernel hardcodes the 5x5 median window and 5x5 taps;
        # non-default parameters must take the general path, not be
        # silently ignored.
        use_pallas = False
    cms = _correlation_maps(images, median_filter_size, corr_np, use_pallas)
    return _threshold_and_extract_batch(cms, max_candidates=max_candidates,
                                        c_std=float(c_std))


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
    image_cm, _ = candidate_map(image, median_filter_size,
                                correlation_matrix, c_std)
    return _threshold_and_extract(image_cm, max_candidates, float(c_std))


def gather_patches(image, hs, ws, radius=2):
    """Gather (2r+1)x(2r+1) patches centered at (hs, ws).

    One fused XLA gather (advanced indexing) — ~7x faster on TPU than a
    vmapped dynamic_slice per patch for 5x5 windows. Centers must be at
    least `radius` from every edge.
    """
    d = jnp.arange(-radius, radius + 1)
    return image[hs[:, None, None] + d[None, :, None],
                 ws[:, None, None] + d[None, None, :]]


def gather_patches_dynslice(image, hs, ws, radius):
    """Per-patch dynamic_slice gather — faster than one big XLA gather for
    LARGE windows (e.g. the 19x19 photometry squares)."""
    size = 2 * radius + 1

    def one(h, w):
        return lax.dynamic_slice(image, (h - radius, w - radius),
                                 (size, size))

    return jax.vmap(one)(hs, ws)


_MXU_TFLOPS: dict = {}

# Measured-throughput crossover for preferring the one-hot MXU gather.
# Derivation (DESIGN.md section 14): the XLA small-slice gather floor is
# ~45 ms per 65k 5x5 patches (per-index latency-bound, hardware-
# independent to first order); the one-hot contraction costs ~5 GFLOP per
# 2048-candidate 512x512 image, ~160 GFLOP for a 32-image batch — under
# 45 ms whenever the measured f32/HIGHEST matmul rate exceeds ~4 TFLOP/s.
# 5.0 adds margin. Real MXU hardware measures 30-45 TFLOP/s at HIGHEST
# (bf16 peak / 6 passes; the bench chip itself reads 33.4 with the
# round-5 latency-differenced probe — rounds 1-4's "~0.3" was the
# tunnel's dispatch latency, not the MXU); XLA-CPU measures well under
# 1 — the regimes stay orders of magnitude apart, so the threshold is
# not delicate.
ONEHOT_MIN_TFLOPS = 5.0


def measured_mxu_tflops(repeats: int = 3) -> float:
    """Measured dense-matmul throughput (f32, precision=HIGHEST) of the
    default backend, memoized per process.

    LATENCY-CANCELLING design (round-5 fix): a single matmul per
    dispatch measures the LINK on tunneled backends, not the MXU — one
    2048^3 f32 product is ~17 GFLOP, under a millisecond on real MXU
    hardware, so a 30-60 ms round trip dominates and a fast chip reads
    as ~0.5 TFLOP/s (exactly what round 1-4 caches recorded, freezing
    gather_strategy='gather' forever). The fix times a SHORT chain and a
    LONG chain of device-resident matmuls (fori_loop, per-step
    max-normalization so values stay finite) and differences them:
    rate = extra_flops / (t_long - t_short), which cancels the constant
    per-dispatch latency exactly.

    Safe to reach from inside an outer jit trace (detect_and_fit with
    gather_strategy='auto' under a user's jax.jit): the probe runs under
    ensure_compile_time_eval, so it executes eagerly at trace time
    instead of being staged into the caller's program."""
    import time
    from functools import partial

    backend = jax.default_backend()
    if backend in _MXU_TFLOPS:
        return _MXU_TFLOPS[backend]
    n = 2048
    k_short, k_long = 4, 36
    x = np.random.default_rng(0).normal(size=(n, n)).astype(np.float32)

    @partial(jax.jit, static_argnames=("k",))
    def probe(a, k):
        def body(_, y):
            z = lax.dot(y, a, precision=lax.Precision.HIGHEST)
            # Keep magnitudes finite across the chain; the VPU max +
            # divide are noise next to a 2048^3 MXU product.
            return z / jnp.max(jnp.abs(z))

        return jnp.sum(lax.fori_loop(0, k, body, a))

    def best_time(k):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(probe(x, k))
            best = min(best, time.perf_counter() - t0)
        return best

    with jax.ensure_compile_time_eval():
        # Commit the operand to device FIRST: a numpy argument would
        # re-upload 16.8 MB per repeat and the probe would measure the
        # host link on top of everything else.
        x = jax.device_put(x)
        if backend == "cpu":
            # In-process backend: there is no dispatch latency to
            # cancel, and the chained form would cost minutes of
            # single-host matmuls for nothing — one timed matmul is the
            # honest measurement here.
            float(probe(x, 1))  # compile + warm
            tflops = 2.0 * n ** 3 / max(best_time(1), 1e-9) / 1e12
            _MXU_TFLOPS[backend] = tflops
            return tflops
        float(probe(x, k_short))  # compile + warm both shapes
        float(probe(x, k_long))
        t_short = best_time(k_short)
        t_long = best_time(k_long)
        dt = t_long - t_short
        if dt <= 0.05 * t_short:
            # No measurable delta: jitter swallowed the extra chain
            # (possible when per-dispatch latency noise exceeds the
            # chain's compute). Retry once with a 4x longer chain
            # before giving up — an inverted difference must never be
            # clamped into an absurd rate and frozen to disk.
            k_long2 = k_long * 4
            float(probe(x, k_long2))
            t_long2 = best_time(k_long2)
            if t_long2 - t_short > 0.05 * t_short:
                dt = t_long2 - t_short
                k_long = k_long2
            else:
                import logging
                logging.getLogger(__name__).warning(
                    "measured_mxu_tflops: timing jitter swallowed the "
                    "matmul chain twice; reporting 0.0 (conservative "
                    "'gather' decision), not cached to disk")
                _MXU_TFLOPS[backend] = 0.0
                return 0.0
    tflops = 2.0 * n ** 3 * (k_long - k_short) / dt / 1e12
    _MXU_TFLOPS[backend] = tflops
    import logging
    logging.getLogger(__name__).info(
        "measured_mxu_tflops[%s] = %.3f TFLOP/s (f32 HIGHEST, "
        "latency-differenced)", backend, tflops)
    return tflops


def resolve_gather_strategy(strategy: str = "auto") -> str:
    """Concrete patch-gather strategy for the detect path.

    'auto' picks 'onehot' (MXU contractions, gather_patches_onehot) when
    the measured matmul throughput clears ONEHOT_MIN_TFLOPS, else
    'gather' (XLA advanced indexing) — the two are bit-exact, so this is
    purely a performance dispatch. The FSIA_GATHER environment variable
    overrides 'auto'. Call OUTSIDE jit (the probe runs a device program).
    """
    if strategy in ("gather", "onehot"):
        return strategy
    if strategy != "auto":
        raise ValueError("gather_strategy must be 'auto', 'gather' or "
                         "'onehot': " + repr(strategy))
    import os
    env = os.environ.get("FSIA_GATHER", "").strip().lower()
    if env:
        if env not in ("gather", "onehot"):
            raise ValueError("FSIA_GATHER must be 'gather' or 'onehot': " +
                             repr(env))
        return env
    from ..utils import probes
    return probes.gather_strategy()


def gather_patches_onehot(image, hs, ws, radius=2):
    """Patch gather as one-hot contractions (exact, MXU-targeted).

    XLA's gather of many small 2D slices is latency-bound (each 5x5 patch
    is 25 scattered element loads). On MXU-rich hardware the same gather is
    two one-hot contractions: rows = OH(K*S, H) @ image, then a per-
    candidate (S, W) x (W, S) batched contraction — ~5 GFLOP per 2048-
    candidate image, trivial for a full-speed MXU. Bit-exact with
    gather_patches (one-hot entries are exactly 0/1; precision=HIGHEST
    keeps f32 products unrounded).

    Note: rounds 1-4 believed the axon remote chip's MXU ran ~500x below
    v5e spec and kept gather_patches there — that number was the OLD
    one-matmul probe measuring the tunnel's round-trip latency, not the
    MXU. The round-5 latency-differenced probe reads 33 TFLOP/s on the
    same chip, and the measured A/B has this onehot path +26% on the
    full detect program — selected automatically wherever
    resolve_gather_strategy('auto') runs.
    """
    S = 2 * radius + 1
    H, W = image.shape
    d = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    hidx = (hs.astype(jnp.int32)[:, None] + d[None, :]).reshape(-1)  # (K*S,)
    OH = (hidx[:, None] ==
          jnp.arange(H, dtype=jnp.int32)[None, :]).astype(image.dtype)
    rows = lax.dot(OH, image,
                   precision=lax.Precision.HIGHEST).reshape(-1, S, W)
    widx = ws.astype(jnp.int32)[:, None] + d[None, :]                # (K, S)
    OW = (widx[:, :, None] ==
          jnp.arange(W, dtype=jnp.int32)[None, None, :]).astype(image.dtype)
    return lax.dot_general(rows, OW, (((2,), (2,)), ((0,), (0,))),
                           precision=lax.Precision.HIGHEST)
