"""Independent SCALAR implementation of the photutils-style SExtractor
background spec, for differential testing of the vectorized production
stand-in (fluorosequencingimageanalysis_tpu.pipeline.spots._mesh_background).

The spec (what /root/reference/flexlibrary.py:457-470 gets from
photutils.background.Background(method='sextractor'), modern photutils'
Background2D + SigmaClip(3, 10) + SExtractorBackground +
BkgZoomInterpolator):

  1. pad the image to a box_size multiple by edge replication,
  2. per box: median-centered 3-sigma clip (population std, <= 10
     iterations or until no value is rejected),
  3. per box: mode = 2.5*median - 1.5*mean of the clipped values; the
     median if |mean - median| > 0.3*std (crowded); the mean if std == 0,
  4. median-filter the low-resolution mesh (filter_size, 'reflect'),
  5. cubic-spline zoom with box centers as knots (order 3, 'reflect',
     grid_mode=True), cropped to the original shape.

photutils itself is not installable in this environment (and the
reference's photutils release is a Py2-era API that predates PyPI
wheels), so steps 2-3 — the parts where vectorization can silently go
wrong — are re-derived here as per-box Python loops over value lists;
steps 4-5 are the same scipy library calls in both implementations (no
independent information, kept for end-to-end comparability). Deviations
from any particular photutils release are documented in PARITY.md.
"""

import numpy as np
from scipy.ndimage import median_filter, zoom


def clip_box_scalar(values, sigma=3.0, maxiters=10):
    """Scalar sigma clip of one box: list in, kept-values list out."""
    vals = [float(v) for v in values]
    for _ in range(maxiters):
        med = float(np.median(vals))
        std = float(np.std(vals))
        kept = [v for v in vals
                if med - sigma * std <= v <= med + sigma * std]
        if len(kept) == len(vals):
            break
        vals = kept
    return vals


def sextractor_mode_scalar(values):
    """Scalar SExtractor mode estimator of one clipped box."""
    med = float(np.median(values))
    mean = float(np.mean(values))
    std = float(np.std(values))
    if std == 0:
        return mean
    if abs(mean - med) > 0.3 * std:
        return med
    return 2.5 * med - 1.5 * mean


def background_oracle(image, box_size=10, filter_size=10):
    image = np.asarray(image, dtype=np.float64)
    H, W = image.shape
    nh = max(1, int(np.ceil(H / box_size)))
    nw = max(1, int(np.ceil(W / box_size)))
    padded = np.pad(image, ((0, nh * box_size - H), (0, nw * box_size - W)),
                    mode="edge")
    mesh = np.zeros((nh, nw))
    for i in range(nh):
        for j in range(nw):
            box = padded[i * box_size:(i + 1) * box_size,
                         j * box_size:(j + 1) * box_size].ravel()
            mesh[i, j] = sextractor_mode_scalar(clip_box_scalar(box))
    k = min(filter_size, nh, nw)
    if k > 1:
        mesh = median_filter(mesh, size=k)
    if nh == 1 and nw == 1:
        return np.full((H, W), mesh[0, 0])
    # Per-axis spline order (see pipeline/spots._mesh_background): a
    # 1-box axis degrades only its own axis to nearest-knot, the other
    # axis keeps the cubic spline.
    order_h = min(3, nh - 1)
    order_w = min(3, nw - 1)
    if order_h == order_w:
        up = zoom(mesh, box_size, order=order_h,
                  mode="reflect", grid_mode=True)
    else:
        up = zoom(mesh, (1.0, float(box_size)), order=order_w,
                  mode="reflect", grid_mode=True)
        up = zoom(up, (float(box_size), 1.0), order=order_h,
                  mode="reflect", grid_mode=True)
    return up[:H, :W]


# ---------------------------------------------------------------------------
# Second, independently-formulated oracle: the astropy/photutils masked-
# array algorithm STRUCTURE (mask-accumulation loop, np.ma statistics,
# rejected-count termination), written against upstream's implementation
# structure rather than re-deriving the spec a second time. photutils/
# astropy are neither installable nor fetchable in this environment (and
# the reference's photutils release is a Py2-era API), so this is the
# closest available adversarial check: a different author-path through
# the algorithm with different numpy code paths (np.ma reductions vs
# Python list loops). Divergences between the two oracles would expose
# spec-derivation errors; agreement across the fuzz grid is the
# evidence tests/test_sextractor_numerics.py records.
# ---------------------------------------------------------------------------

def clip_box_masked(values, sigma=3.0, maxiters=10):
    """astropy.stats.SigmaClip-structured clip of one box.

    Masked-array formulation: bounds from np.ma.median / masked std of
    the surviving set, mask ACCUMULATES, loop ends when the rejected
    count stops growing or at maxiters. Returns the kept values (in
    original order, like compressing the mask).
    """
    data = np.ma.asarray(np.asarray(values, dtype=np.float64).ravel())
    n_masked = int(data.mask.sum()) if np.ma.is_masked(data) else 0
    for _ in range(int(maxiters)):
        med = np.ma.median(data)
        # astropy's 'std' stdfunc is the biased (ddof=0) std of the
        # surviving values.
        std = np.ma.std(data)
        data = np.ma.masked_outside(data, med - sigma * std,
                                    med + sigma * std)
        new_masked = int(data.mask.sum()) if np.ma.is_masked(data) else 0
        if new_masked == n_masked:
            break
        n_masked = new_masked
    return list(np.asarray(data.compressed(), dtype=np.float64))


def sextractor_mode_masked(values):
    """photutils SExtractorBackground.calc_background structure: the
    vectorized mode formula with std==0 -> mean and the crowded
    |mean - median|/std > 0.3 -> median override, np reductions."""
    arr = np.asarray(values, dtype=np.float64)
    med = np.median(arr)
    mean = np.mean(arr)
    std = np.std(arr)
    mode = 2.5 * med - 1.5 * mean
    if std == 0:
        return float(mean)
    if np.abs(mean - med) / std > 0.3:
        return float(med)
    return float(mode)


def background_oracle_masked(image, box_size=10, filter_size=10):
    """background_oracle with the masked-formulation box statistics
    (identical grid/filter/zoom plumbing — the shared scipy calls)."""
    image = np.asarray(image, dtype=np.float64)
    H, W = image.shape
    nh = max(1, int(np.ceil(H / box_size)))
    nw = max(1, int(np.ceil(W / box_size)))
    padded = np.pad(image, ((0, nh * box_size - H), (0, nw * box_size - W)),
                    mode="edge")
    mesh = np.zeros((nh, nw))
    for i in range(nh):
        for j in range(nw):
            box = padded[i * box_size:(i + 1) * box_size,
                         j * box_size:(j + 1) * box_size].ravel()
            mesh[i, j] = sextractor_mode_masked(clip_box_masked(box))
    k = min(filter_size, nh, nw)
    if k > 1:
        mesh = median_filter(mesh, size=k)
    if nh == 1 and nw == 1:
        return np.full((H, W), mesh[0, 0])
    order_h = min(3, nh - 1)
    order_w = min(3, nw - 1)
    if order_h == order_w:
        up = zoom(mesh, box_size, order=order_h,
                  mode="reflect", grid_mode=True)
    else:
        up = zoom(mesh, (1.0, float(box_size)), order=order_w,
                  mode="reflect", grid_mode=True)
        up = zoom(up, (float(box_size), 1.0), order=order_h,
                  mode="reflect", grid_mode=True)
    return up[:H, :W]
