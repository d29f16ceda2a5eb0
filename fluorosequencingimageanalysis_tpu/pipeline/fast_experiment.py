"""Array-native full-experiment path (the redesigned flagship workflow).

Covers the reference's ``basic_experiment_script`` flow end-to-end without
ever materializing Spot/Image objects:

    [F, C, H, W] stack
      -> experiment_step_sharded (registration + detect/fit + spot bucket)
      -> per-field native greedy tracking on arrays (tracklink.cpp)
      -> VECTORIZED trace assembly (pointer-jumping roots, scatter into a
         (traces, cycles) position matrix — no per-trace Python walks)
      -> VECTORIZED hole interpolation (closed forms of the reference's
         interpolate_spots over prev/next-present-frame arrays)
      -> invalid-trace discarding (one mask)
      -> batched device photometry for every (trace, cycle) position in a
         handful of chunked dispatches over the whole stack
      -> binary categories + track-photometries CSV rows

Semantics are the experiment classes' (pipeline/experiment.py, themselves
parity with /root/reference/flexlibrary.py:1664-2892):
- spot identities are the Py2-rounded fitted centers, deduplicated in
  candidate order with 5x5-fit validity (Spot.__init__ including its
  gaussian_fit fallback quirk, flexlibrary.py:90-101),
- tracking offsets/binning/tie rules per greedy_particle_tracking,
- interpolation per interpolate_spots/fill_in_trace (same float operation
  order: inc = (stop - start)/n computed once, then start + inc*i plus the
  per-frame offset; constant-position extrapolation at head/tail holes;
  Py2 rounding),
- a trace is invalid (dropped) if any filled position falls outside the
  5x5 box or outside the photometry window (valid_slice at the metric's
  radius, which is what trace_to_photometry(return_invalid=False) rejects),
- CSV rows ordered channel -> field -> category (first-appearance order)
  -> trace, with H/W from the filled trace's first frame.

tests/test_fast_experiment.py proves equality against the class-based path
row by row.
"""

from __future__ import annotations

import functools

import numpy as np

from ..utils import profiling
from ..utils.rounding import py2_round
from .tracking import accumulate_offsets, _py2_round_array as _py2_round_arr

# Composite (image, rh, rw) -> collision-free int64 key. The shift keeps
# quirk-kept negative/out-of-frame coordinates positive (|rh|, |rw| <
# 2^20) and img * M * M stays below 2^63. The psfs-dict builder
# (_spot_lists) and the present-frame value lookup (_lookup_spot_values)
# MUST pack identically for searchsorted resolution to hold — hence one
# shared helper.
_KEY_SHIFT = np.int64(1 << 20)
_KEY_M = np.int64(1 << 21)


def _pack_spot_keys(img, rh, rw):
    img = np.asarray(img, np.int64)
    rh = np.asarray(rh)
    rw = np.asarray(rw)
    # Collision-freedom needs |rh|, |rw| < 2^20. Bounded LM centers live
    # within half a pixel of their candidate (and the MC fitter within
    # ~2.5 px), so this cannot trip on real fits — but enforce it loudly
    # rather than silently aliasing keys across images if a future fit
    # path ever emits a wild quirk-kept coordinate.
    if rh.size and (max(np.abs(rh).max(), np.abs(rw).max()) >=
                    int(_KEY_SHIFT)):
        raise ValueError("spot coordinate exceeds the 2^20 key packing "
                         "range — wild fit center?")
    return (img * _KEY_M + (rh + _KEY_SHIFT)) * _KEY_M + (rw + _KEY_SHIFT)


def _spot_lists(out, F, C, H, W, spot_size=5, with_values=False):
    """Device-step outputs -> per-(field, cycle) integer spot arrays.

    Replicates the psfs-dict construction + Spot.__init__ filtering of the
    class path: kept fits ordered by candidate index, deduplicated on the
    Py2-rounded center key (setdefault), 5x5 validity with the reference's
    gaussian_fit fallback quirk.
    Returns (rh[f][c], rw[f][c]) int64 arrays — plus per-spot values
    aligned with them when ``values`` (an [F, C, S] array, e.g. the
    device step's gaussian_volume photometry bucket) is given.
    """
    values = out.get("photometry") if with_values else None
    r = (spot_size - 1) // 2
    # ONE vectorized pass over all (field, cycle) images (a per-image
    # Python loop is O(F*C) host dispatches — ~0.5 s of the config-4
    # critical path at 256 images).
    if "spot_rh" in out:
        # Transfer-lean layout: the device step already Py2-rounded the
        # centers (bit-exactly, mesh.py) and folded the Spot.__init__
        # quirk into spot_state (0 empty, 1 valid-but-rejected,
        # 2 tracked) — int16/int8 downloads instead of float32.
        state = np.asarray(out["spot_state"])
        if (state == 3).any():
            # The device step flags kept fits whose center is non-finite
            # or beyond int16 as state 3 instead of wrapping them into
            # valid-looking coordinates; the reference's
            # int(py2_round(h)) raises on the same input
            # (flexlibrary.py:90-101).
            raise ValueError(
                "non-finite or wild fitted center on a kept spot "
                "(spot_state == 3) — the reference would raise here")
        fi, ci, si = np.nonzero(state)
        rh = np.asarray(out["spot_rh"])[fi, ci, si].astype(np.int64)
        rw = np.asarray(out["spot_rw"])[fi, ci, si].astype(np.int64)
        cand = np.asarray(out["spot_cand_c"])[fi, ci, si]
        kept = state[fi, ci, si] == 2
    else:
        spot_valid = np.asarray(out["spot_valid"])
        fi, ci, si = np.nonzero(spot_valid)
        h0 = np.asarray(out["spot_h"])[fi, ci, si]
        w0 = np.asarray(out["spot_w"])[fi, ci, si]
        cand = np.asarray(out["spot_cand_idx"])[fi, ci, si]
        # Round in float64 like the class path's int(py2_round(float(h)))
        # and the compact device path (py2_round_device_i32, bit-matched
        # to host float64): f32 `x + 0.5` can round a just-below-half
        # center UP at the tie (e.g. 0.49999997), flipping the integer
        # identity of knife-edge spots.
        rh = _py2_round_arr(h0.astype(np.float64))
        rw = _py2_round_arr(w0.astype(np.float64))
        # Spot.__init__ validity: plain 5x5 fit on the rounded center,
        # or the reference's buggy fallback that lets an out-of-box spot
        # through unless (h_0 outside AND w_0 inside).
        ok_plain = ((rh >= r) & (rh + r < H) & (rw >= r) & (rw + r < W))
        in_h = (h0 >= r) & (h0 < H - r)
        in_w = (w0 >= r) & (w0 < W - r)
        kept = ok_plain | ~(~in_h & in_w)
    val = (np.asarray(values, np.float64)[fi, ci, si]
           if values is not None else None)
    img = fi.astype(np.int64) * C + ci
    # Global (image, cand_idx) order == per-image candidate order.
    order = np.lexsort((cand, img))
    img, rh, rw, kept = img[order], rh[order], rw[order], kept[order]
    if val is not None:
        val = val[order]
    # psfs-dict setdefault FIRST: the first candidate wins a shared
    # (rh, rw) key within its image — and keys are (rh, rw) pairs, never
    # flattened mod W (a flat rh*W+rw key aliases when a quirk-kept
    # spot's rw falls outside [0, W)).
    key = _pack_spot_keys(img, rh, rw)
    # np.unique(return_index) yields each key's FIRST occurrence in
    # array order == first in candidate order within its image.
    _, first = np.unique(key, return_index=True)
    first.sort()
    # Validity applies to the dict WINNERS only (the class path builds
    # the psfs dict before constructing Spots, so an invalid winner
    # shadows a valid loser at the same key).
    first = first[kept[first]]
    img, rh, rw = img[first], rh[first], rw[first]
    if val is not None:
        val = val[first]
    # Split back into per-(field, cycle) arrays (img is sorted).
    bounds = np.searchsorted(img, np.arange(F * C + 1))
    rhs = [[rh[bounds[f * C + c]:bounds[f * C + c + 1]]
            for c in range(C)] for f in range(F)]
    rws = [[rw[bounds[f * C + c]:bounds[f * C + c + 1]]
            for c in range(C)] for f in range(F)]
    if with_values:
        if val is None:  # bucket fetched without "photometry"
            return rhs, rws, None
        vals = [[val[bounds[f * C + c]:bounds[f * C + c + 1]]
                 for c in range(C)] for f in range(F)]
        return rhs, rws, vals
    return rhs, rws


def _link_field(rh_by_cycle, rw_by_cycle, frame_shape, offsets,
                candidate_radius=2, cum=None):
    """Native greedy linking + vectorized trace assembly for one field.

    ``cum``: optional precomputed accumulate_offsets(offsets) (callers
    that already hold it avoid the recompute; ``offsets`` is still
    needed for the pure-python fallback tracker).
    Returns (pos (T, C, 2) int64, present (T, C) bool) with traces ordered
    like the reference's extraction walk (head frame, then bin raster).
    """
    from ..native.tracklink import greedy_link, have_native

    C = len(rh_by_cycle)
    if cum is None:
        cum = np.asarray(accumulate_offsets(offsets), dtype=np.float64)
    H, W = frame_shape
    # Discard dropouts BEFORE linking, like greedy_particle_tracking /
    # the class path (discard_dropouts, flexlibrary.py:625-677): a spot
    # whose offset position leaves any frame is excluded from tracking.
    # This also guarantees every position handed to the C++ core bins
    # inside the frame grid (quirk-kept out-of-box spots and stage drift
    # would otherwise index out of bounds).
    rh_by_cycle = list(rh_by_cycle)
    rw_by_cycle = list(rw_by_cycle)
    for c in range(C):
        rh, rw = rh_by_cycle[c], rw_by_cycle[c]
        if len(rh) == 0:
            continue
        # Float op order IS the spec: the reference computes
        # (h + spot_offset) first, THEN subtracts each frame offset
        # (apply_offset -> unapply_offset, flexlibrary.py:658-664), and
        # tracking.discard_dropouts vectorizes that same grouping. A
        # knife-edge spot within 1 ulp of a bound can otherwise be kept
        # by one path and dropped by the other.
        gh = (rh[:, None] + cum[c, 0]) - cum[:, 0][None, :]   # (n, C)
        gw = (rw[:, None] + cum[c, 1]) - cum[:, 1][None, :]
        ok = ((gh >= 0) & (gh < H - 0.5) &
              (gw >= 0) & (gw < W - 0.5)).all(axis=1)
        if not ok.all():
            rh_by_cycle[c] = rh[ok]
            rw_by_cycle[c] = rw[ok]
    counts = np.array([len(rh_by_cycle[c]) for c in range(C)], np.int32)
    frame_start = np.zeros(C + 1, np.int32)
    np.cumsum(counts, out=frame_start[1:])
    N = int(frame_start[-1])
    if N == 0:
        return (np.zeros((0, C, 2), np.int64), np.zeros((0, C), bool))
    ih = np.concatenate([rh_by_cycle[c] for c in range(C)])
    iw = np.concatenate([rw_by_cycle[c] for c in range(C)])
    frame_of = np.repeat(np.arange(C), counts)
    h = ih + cum[frame_of, 0]
    w = iw + cum[frame_of, 1]

    if have_native():
        anc, _desc = greedy_link(h, w, frame_start, frame_shape,
                                 candidate_radius)
        anc = anc.astype(np.int64)
    else:  # pure-python fallback via the host tracker on index records
        from .tracking import greedy_particle_tracking

        class _S:  # noqa: N801 - tiny local record
            __slots__ = ("h", "w", "i")

            def __init__(self, h, w, i):
                self.h, self.w, self.i = h, w, i

        frames = []
        g = 0
        for c in range(C):
            frames.append([_S(int(rh_by_cycle[c][i]), int(rw_by_cycle[c][i]),
                              g + i) for i in range(len(rh_by_cycle[c]))])
            g += len(rh_by_cycle[c])
        traces, _ = greedy_particle_tracking(
            frames, frame_shape, candidate_radius=candidate_radius,
            offsets=offsets, use_native=False)
        anc = np.full(N, -1, np.int64)
        for tr in traces:
            prev = None
            for s in tr:
                if s is None:
                    continue
                if prev is not None:
                    anc[s.i] = prev
                prev = s.i

    # Root of every spot's chain by pointer jumping (chains are <= C long).
    root = np.where(anc >= 0, anc, np.arange(N))
    while True:
        nxt = np.where(anc[root] >= 0, anc[root], root)
        if (nxt == root).all():
            break
        root = nxt
    # Trace ranks: heads ordered by (frame, bin raster) — the reference's
    # extraction walk (flexlibrary.py:989-996).
    rast_bin = (_py2_round_arr(h) * int(frame_shape[1]) + _py2_round_arr(w))
    heads = np.nonzero(anc == -1)[0]
    heads = heads[np.lexsort((rast_bin[heads], frame_of[heads]))]
    T = len(heads)
    rank_of_head = np.empty(N, np.int64)
    rank_of_head[heads] = np.arange(T)
    trace_of = rank_of_head[root]
    # Scatter every spot into its (trace, frame) cell.
    pos = np.zeros((T, C, 2), np.int64)
    present = np.zeros((T, C), bool)
    pos[trace_of, frame_of, 0] = ih
    pos[trace_of, frame_of, 1] = iw
    present[trace_of, frame_of] = True
    return pos, present


def _fill_traces(pos, present, cum, frame_shape, spot_radius=2,
                 photometry_radius=9, return_masks=False):
    """Vectorized interpolate_spots/fill_in_trace + validity over all
    traces at once.

    pos: (T, C, 2) int64 positions at present frames; present: (T, C).
    cum: (C, 2) cumulative offsets.
    Returns (filled (T, C, 2) int64, valid (T,) bool); with
    ``return_masks`` additionally (hole_ok (T, C) bool — False exactly
    where the reference's interpolate_spots would emit a None Spot
    (out-of-5x5-box hole, flexlibrary.py:1960-1968) — and win_ok (T, C)
    bool — the per-position photometry-window fit). valid ==
    (hole_ok.all & win_ok.all); the masks feed the keep_invalid surface.
    """
    T, C = present.shape
    H, W = frame_shape
    if T == 0:
        empty = np.zeros((0, C), bool)
        return ((pos, np.zeros((0,), bool), empty, empty) if return_masks
                else (pos, np.zeros((0,), bool)))
    f_idx = np.arange(C)[None, :]
    # prev[t, f]: last present frame <= f (-1 if none); next[t, f]: first
    # present frame >= f (C if none).
    prev = np.where(present, f_idx, -1)
    np.maximum.accumulate(prev, axis=1, out=prev)
    nxt = np.where(present, f_idx, C)
    nxt = np.minimum.accumulate(nxt[:, ::-1], axis=1)[:, ::-1]

    t_idx = np.arange(T)[:, None]
    prev_c = np.clip(prev, 0, C - 1)
    next_c = np.clip(nxt, 0, C - 1)
    pos_p = pos[t_idx, prev_c].astype(np.float64)          # (T, C, 2)
    pos_n = pos[t_idx, next_c].astype(np.float64)
    cum_f = cum[None, :, :]
    cum_p = cum[prev_c]
    cum_n = cum[next_c]

    has_p = prev >= 0
    has_n = nxt < C
    # Interior gaps: the reference computes inc = (stop - start)/n once,
    # then start + inc*i (+ the frame's offset re-application). Same float
    # operation order here.
    n_span = np.maximum((nxt - prev), 1).astype(np.float64)[:, :, None]
    i_span = (f_idx - prev)[:, :, None].astype(np.float64)
    start = pos_p
    # Parenthesization matters for .5-boundary Py2 rounds with subpixel
    # offsets: the reference computes the offset DIFFERENCE first, then one
    # add (offset_frame_coordinates -> apply_offset), so (a - b) groups.
    stop = pos_n + (cum_p - cum_n)
    inc = (stop - start) / n_span
    val_interior = start + inc * i_span + (cum_f - cum_p)
    # Head holes: constant at the next spot's frame-0-mapped position,
    # re-offset per frame (a head hole's run always starts at frame 0 and
    # cum[0] == (0, 0) by definition, so the base terms vanish exactly).
    val_head = pos_n + (cum[0][None, None, :] - cum_n) + \
        (cum_f - cum[0][None, None, :])
    # Tail holes: constant at the previous spot's position, re-offset.
    val_tail = pos_p + (cum_f - cum_p)

    val = np.where(has_p[:, :, None],
                   np.where(has_n[:, :, None], val_interior, val_tail),
                   val_head)
    # Present frames keep their exact integer positions; only the hole
    # values need the float64 Py2 rounding (rounding the present
    # positions too would be a wasted full-array pass — they are
    # integers already).
    filled = np.where(present[:, :, None], pos, _py2_round_arr(val))

    # Validity: interpolated positions must fit the 5x5 spot box, and ALL
    # positions must fit the photometry window (trace_to_photometry with
    # return_invalid=False rejects truncated windows).
    box_ok = ((filled[:, :, 0] >= spot_radius) &
              (filled[:, :, 0] < H - spot_radius) &
              (filled[:, :, 1] >= spot_radius) &
              (filled[:, :, 1] < W - spot_radius))
    r = photometry_radius
    win_ok = ((filled[:, :, 0] >= r) & (filled[:, :, 0] < H - r) &
              (filled[:, :, 1] >= r) & (filled[:, :, 1] < W - r))
    hole_ok = box_ok | present
    valid = hole_ok.all(axis=1) & win_ok.all(axis=1)
    if return_masks:
        return filled, valid, hole_ok, win_ok
    return filled, valid


# Photometry methods the array-native path supports. The image metrics
# each measure a square of their own radius (Spot.photometry ->
# *_photometry_metric defaults, pipeline/spots.py:71-120);
# gaussian_volume and sigmas are pure fit-parameter products the device
# step already computed per detected spot (interpolated spots have no fit
# and take the reference's fit-less defaults: 0 for gaussian_volume,
# -1e9 for sigmas — spots.py:85-101). sextractor measures circular-
# aperture sums over per-image SExtractor background subtractions
# (flexlibrary.py:243-262) — a vectorized host pass per image here.
FAST_PHOTOMETRY_METHODS = ("mexican_hat", "simple", "maximum",
                           "gaussian_volume", "sigmas", "sextractor")

# Fit-less (interpolated-frame) defaults for the fit-product metrics.
_FIT_METRIC_DEFAULTS = {"gaussian_volume": 0.0, "sigmas": -1e9}


def _photometry_window_radius(method, mexican_hat_radius,
                              aperture_radius=3):
    """The metric's square radius — also the trace_to_photometry
    (return_invalid=False) validity radius for that metric.
    gaussian_volume checks valid_slice() at the spot-box radius; the
    reference's sigmas metric ignores valid_slice entirely (it always
    returns a value), so it imposes no window constraint — radius 0 is
    implied by the interpolation box check. sextractor checks
    valid_slice at its aperture radius (flexlibrary.py:250-251); the
    aperture itself truncates at frame edges (photutils semantics), so
    no wider constraint applies."""
    if method == "sextractor":
        return int(np.ceil(aperture_radius))
    return {"mexican_hat": mexican_hat_radius, "simple": 2,
            "maximum": 5, "gaussian_volume": 2, "sigmas": 0}[method]


def _lookup_spot_values(rhs, rws, vals, C, field_of, pos, cats, default):
    """Present-frame values by vectorized key matching — no per-trace
    Python dict probes (O(traces x cycles) host work at 1e5-trace scale).

    Every present (trace, cycle) position IS some detected spot's
    (rh, rw) key (tracking is built from exactly these arrays, and the
    psfs-dict dedup makes the key unique per image), so a sorted
    searchsorted over composite (image, rh, rw) keys resolves all of
    them in one pass. Positions are shifted by 2^20 before packing so
    quirk-kept spots with negative/out-of-frame coordinates still form
    valid keys (flat rh*W+rw keys would alias).
    """
    F = len(rhs)
    skeys, svals = [], []
    for f in range(F):
        for c in range(C):
            rh = rhs[f][c]
            if len(rh) == 0:
                continue
            key = _pack_spot_keys(f * C + c, rh, rws[f][c])
            skeys.append(key)
            svals.append(np.asarray(vals[f][c], np.float64))
    out = np.full(pos.shape[:2], default, np.float64)
    if not skeys:
        return out
    skeys = np.concatenate(skeys)
    svals = np.concatenate(svals)
    order = np.argsort(skeys)
    skeys, svals = skeys[order], svals[order]
    img_of = (field_of[:, None] * C + np.arange(C)[None, :]).astype(np.int64)
    qkey = _pack_spot_keys(img_of, pos[:, :, 0], pos[:, :, 1])
    qi = np.clip(np.searchsorted(skeys, qkey), 0, len(skeys) - 1)
    hit = cats & (skeys[qi] == qkey)
    if not np.array_equal(hit, cats):  # every present position must match
        raise AssertionError("present trace position missing from the "
                             "spot bucket — spot_values misaligned with "
                             "spot_arrays")
    out[hit] = svals[qi][hit]
    return out


def _photometry_kernel(method, radius, brim, top):
    import jax
    import jax.numpy as jnp
    from ..ops.photometry import patch_reduction

    d = 2 * radius + 1
    reduce = patch_reduction(method, radius, brim_size=brim, top=top)

    @jax.jit
    def kernel(imgs, img_id, hs, ws):
        """imgs (M, H, W); img_id/hs/ws (B,) — one metric per position."""
        dh = jnp.arange(-radius, radius + 1)
        rows = hs[:, None] + dh[None, :]
        cols = ws[:, None] + dh[None, :]
        patches = imgs[img_id[:, None, None], rows[:, :, None],
                       cols[:, None, :]]
        # Gather in the storage dtype (uint16 stacks stay uint16 in HBM),
        # then cast for the reduction.
        flat = patches.reshape(patches.shape[0], d * d).astype(jnp.float32)
        return reduce(flat)

    return kernel


@functools.lru_cache(maxsize=8)
def _get_photometry_kernel(method, radius, brim, top):
    return _photometry_kernel(method, radius, brim, top)


def run_experiment_stack(stack, offsets_h, offsets_w, spot_arrays,
                         photometry_method="mexican_hat",
                         photometry_radius=9, photometry_brim=6,
                         photometry_top=1,
                         candidate_radius=2, chunk=65536,
                         spot_values=None, aperture_radius=3,
                         box_size=10, filter_size=10, hole_queue=None,
                         skip_hole_gathers=False, keep_invalid=False,
                         host_images=None):
    """All fields: tracking -> fill-in -> validity -> batched photometry.

    stack: (F, C, H, W) numpy array OR device-resident jax.Array (the
    latter avoids re-uploading a stack run_stack already placed on
    device; the fields axis may be PADDED beyond the real field count —
    field indices come from spot_arrays); offsets_h/w: (F, C);
    spot_arrays from _spot_lists; spot_values: per-spot metric values
    aligned with spot_arrays. For the fit-product metrics
    (gaussian_volume, sigmas) it is required; for the image metrics it
    is the device step's already-measured photometry at each detected
    spot, reused for present frames so only interpolated holes dispatch
    patch gathers (without it, every position is gathered).
    hole_queue: if a list is given (spot_values image-metric path only),
    the interpolated-hole gathers are NOT dispatched here — a request is
    appended for a later flush_hole_queue(), and the returned rows carry
    NaN at hole positions until then. This keeps the per-group call free
    of device round trips so the caller can overlap host tracking with
    in-flight stack uploads on a serial transfer link.
    skip_hole_gathers: never measure interpolated holes at all (they
    stay NaN in the rows) — the save_averages surface averages over
    DETECTED frames only (the reference's uninterpolated
    trace_to_photometry yields (None, None, None) there,
    flexlibrary.py:2875-2878), so hole values would be discarded.
    keep_invalid: the experiment script's --keep_invalid surface (skip
    discard_invalid_traces, basic_experiment_script.py:472-476): EVERY
    trace emits a row. Out-of-5x5-box holes are the reference's None
    interpolated Spots (flexlibrary.py:1960-1968) and carry NaN in the
    returned rows (the caller maps them to the CSV's '0'); positions
    whose photometry window is truncated at a frame edge are measured
    with the reference's clipped-slice semantics
    (Spot.photometry(return_invalid=True) on the truncated image_slice,
    flexlibrary.py:172-210 — ops.photometry.*_host) instead of the
    fixed-window device kernel. Requires ``host_images`` (numpy
    [F, C, H, W] for THESE fields) for the clipped measurements, except
    for sextractor, whose host sweep already measures clipped apertures
    (zero padding equals photutils' partial-aperture truncation for a
    background-subtracted sum).
    Returns a list of per-field row lists, each row (category, h0, w0,
    photometries (C,)) in reference order.
    """
    if photometry_method not in FAST_PHOTOMETRY_METHODS:
        raise ValueError(
            "run_experiment supports photometry methods "
            f"{FAST_PHOTOMETRY_METHODS}; {photometry_method!r} needs "
            "per-spot state or background models — use the experiment "
            "classes (pipeline.experiment) for it.")
    if photometry_method in _FIT_METRIC_DEFAULTS and spot_values is None:
        raise ValueError(f"{photometry_method} needs spot_values (the "
                         "device step's per-spot photometry bucket)")
    if keep_invalid and host_images is None \
            and photometry_method != "sextractor":
        raise ValueError("keep_invalid needs host_images for the "
                         "reference's clipped-slice edge measurements")
    window_radius = _photometry_window_radius(photometry_method,
                                              photometry_radius,
                                              aperture_radius)
    rhs, rws = spot_arrays
    F = len(rhs)
    C = len(rhs[0]) if F else 0
    H, W = stack.shape[2], stack.shape[3]
    all_pos, all_valid_cat, field_sizes = [], [], []
    all_hole_ok, all_win_ok = [], []
    for f in range(F):
        offs = [(float(offsets_h[f, c]), float(offsets_w[f, c]))
                for c in range(C)]
        cum = np.asarray(accumulate_offsets(offs), dtype=np.float64)
        pos, present = _link_field(rhs[f], rws[f], (H, W), offs,
                                   candidate_radius, cum=cum)
        filled, valid, hole_ok, win_ok = _fill_traces(
            pos, present, cum, (H, W), photometry_radius=window_radius,
            return_masks=True)
        sel = slice(None) if keep_invalid else valid
        all_pos.append(filled[sel])
        all_valid_cat.append(present[sel])
        field_sizes.append(filled.shape[0] if keep_invalid
                           else int(valid.sum()))
        if keep_invalid:
            all_hole_ok.append(hole_ok)
            all_win_ok.append(win_ok)
    if sum(field_sizes) == 0:
        return [[] for _ in range(F)]
    pos = np.concatenate(all_pos)          # (Ttot, C, 2)
    cats = np.concatenate(all_valid_cat)   # (Ttot, C)
    field_of = np.repeat(np.arange(F), field_sizes)
    if keep_invalid:
        hole_ok = np.concatenate(all_hole_ok)   # False = None Spot (NaN)
        win_ok = np.concatenate(all_win_ok)     # False = clipped window
        trunc = ~win_ok & hole_ok               # host-measured positions

    if photometry_method == "sextractor":
        # Host-vectorized per image via the shared kernel
        # (spots.sextractor_aperture_sums): background subtraction, then
        # ALL of the image's trace positions in one windowed dot product.
        # The kernel's zero padding IS the clipped-slice edge semantics
        # for an aperture sum (photutils truncates apertures at the
        # frame; outside pixels contribute nothing either way), so the
        # keep_invalid surface needs no separate host edge pass — only
        # the None-Spot positions (out-of-5x5-box holes, possibly out of
        # frame entirely) are masked to NaN.
        from .spots import sextractor_aperture_sums

        stack_np = np.asarray(stack)
        phot = np.full((pos.shape[0], C), np.nan, np.float64)
        start = 0
        for f in range(F):
            stop = start + field_sizes[f]
            if stop == start:
                continue
            p = pos[start:stop]                       # (n, C, 2)
            for c in range(C):
                if not keep_invalid:
                    # Default path: every position is valid — full-slice
                    # assignment, no mask gather/scatter copies.
                    phot[start:stop, c] = sextractor_aperture_sums(
                        stack_np[f, c], p[:, c, 0], p[:, c, 1],
                        aperture_radius, box_size, filter_size)
                    continue
                ok = hole_ok[start:stop, c]
                if ok.any():
                    phot[start:stop, c][ok] = sextractor_aperture_sums(
                        stack_np[f, c], p[ok, c, 0], p[ok, c, 1],
                        aperture_radius, box_size, filter_size)
            start = stop
        return _rows_by_field(pos, cats, phot, field_sizes, F)

    if photometry_method in _FIT_METRIC_DEFAULTS:
        # No image access: detected frames take the device step's per-spot
        # fit product; interpolated frames have no gaussian_fit and take
        # the reference's fit-less default (spots.py:85-101 /
        # flexlibrary.py:212-241).
        phot = _lookup_spot_values(
            rhs, rws, spot_values, C, field_of, pos, cats,
            _FIT_METRIC_DEFAULTS[photometry_method])
        if keep_invalid:
            phot[~hole_ok] = np.nan  # the reference's None Spots
        return _rows_by_field(pos, cats, phot, field_sizes, F)

    if spot_values is not None:
        # Detected frames reuse the device step's photometry (measured at
        # the same Py2-rounded center with the same kernel — bit-equal to
        # a re-gather); only interpolated holes touch the images.
        phot = _lookup_spot_values(rhs, rws, spot_values, C, field_of,
                                   pos, cats, np.nan)
        hole_mask = ~cats
        if keep_invalid:
            # Only full-window in-box holes ride the device gathers;
            # clipped windows are host-measured below and None Spots
            # stay NaN.
            hole_mask &= win_ok & hole_ok
        hole_t, hole_c = np.nonzero(hole_mask)
        if hole_t.size and not skip_hole_gathers:
            img_id = field_of[hole_t] * C + hole_c
            hs = pos[hole_t, hole_c, 0]
            ws = pos[hole_t, hole_c, 1]
            if hole_queue is not None:
                # Enqueue the gather kernels NOW (async — they run in
                # upload gaps), defer only the fetch to the flush.
                hole_queue.append((
                    _queue_photometry(stack, img_id, hs, ws,
                                      photometry_method, window_radius,
                                      photometry_brim, photometry_top,
                                      chunk),
                    phot, hole_t, hole_c))
            else:
                phot[hole_t, hole_c] = _dispatch_photometry(
                    stack, img_id, hs, ws, photometry_method,
                    window_radius, photometry_brim, photometry_top, chunk)
        if keep_invalid:
            _host_clipped_photometry(host_images, field_of, pos, trunc,
                                     photometry_method, window_radius,
                                     photometry_brim, photometry_top, phot)
        return _rows_by_field(pos, cats, phot, field_sizes, F)

    # No per-spot bucket provided: one chunked device kernel over every
    # (trace, cycle) position.
    if keep_invalid:
        phot = np.full(pos.shape[:2], np.nan)
        gt, gc = np.nonzero(win_ok & hole_ok)
        if gt.size:
            phot[gt, gc] = _dispatch_photometry(
                stack, field_of[gt] * C + gc, pos[gt, gc, 0],
                pos[gt, gc, 1], photometry_method, window_radius,
                photometry_brim, photometry_top, chunk)
        _host_clipped_photometry(host_images, field_of, pos, trunc,
                                 photometry_method, window_radius,
                                 photometry_brim, photometry_top, phot)
        return _rows_by_field(pos, cats, phot, field_sizes, F)
    img_id = (field_of[:, None] * C + np.arange(C)[None, :]).reshape(-1)
    hs = pos[:, :, 0].reshape(-1)
    ws = pos[:, :, 1].reshape(-1)
    phot = _dispatch_photometry(stack, img_id, hs, ws, photometry_method,
                                window_radius, photometry_brim,
                                photometry_top, chunk).reshape(-1, C)
    return _rows_by_field(pos, cats, phot, field_sizes, F)


def _host_clipped_photometry(host_images, field_of, pos, trunc, method,
                             window_radius, brim, top, out):
    """Reference clipped-slice photometry for window-truncated positions
    (keep_invalid only): Spot.photometry(return_invalid=True) computes on
    the TRUNCATED image_slice — crown/brim membership indexed within the
    clipped square (flexlibrary.py:172-210) — which the fixed-window
    device kernel cannot express. ops.photometry's *_host functions are
    the class path's own edge fallbacks, so both surfaces share one
    implementation. Fills ``out`` in place at the trunc positions."""
    from ..ops import photometry as photometry_ops

    tt, tc = np.nonzero(trunc)
    if not tt.size:
        return
    imgs = np.asarray(host_images)
    for i in range(tt.size):
        t, c = int(tt[i]), int(tc[i])
        im = imgs[int(field_of[t]), c]
        h, w = int(pos[t, c, 0]), int(pos[t, c, 1])
        if method == "mexican_hat":
            v = photometry_ops.mexican_hat_host(
                im, h, w, brim_size=brim, radius=window_radius)
        elif method == "simple":
            v = photometry_ops.simple_host(im, h, w, radius=window_radius)
        else:  # maximum (the only other image metric here)
            v = photometry_ops.maximum_host(im, h, w, radius=window_radius,
                                            top=top)
        out[t, c] = v


def _queue_photometry(stack, img_id, hs, ws, method, window_radius,
                      brim, top, chunk):
    """Enqueue chunked device photometry kernels at (img_id, hs, ws)
    positions over the [F, C, H, W] stack (device-resident or host).
    Returns a pending list for _resolve_photometry — dispatch is async,
    so nothing blocks here."""
    import jax.numpy as jnp

    # jnp.asarray is a no-op for an already-device stack.
    Fp, C, H, W = stack.shape
    imgs = jnp.asarray(stack).reshape(Fp * C, H, W)
    kern = _get_photometry_kernel(method, window_radius, brim, top)
    B = hs.shape[0]
    pending = []
    from ..utils.dispatch import pow2_bucket
    for lo in range(0, B, chunk):
        hi = min(lo + chunk, B)
        # Pad ragged tails to a power-of-two bucket so every dispatch hits
        # an already-compiled kernel shape (positions pad with a safe
        # interior coordinate and are sliced off).
        n = hi - lo
        bucket = pow2_bucket(n, chunk)
        pad = bucket - n
        ii = np.pad(img_id[lo:hi], (0, pad))
        hh = np.pad(hs[lo:hi], (0, pad), constant_values=window_radius)
        ww = np.pad(ws[lo:hi], (0, pad), constant_values=window_radius)
        profiling.bump("ledger/photometry_dispatches")
        pending.append((lo, hi, kern(
            imgs, jnp.asarray(ii, jnp.int32),
            jnp.asarray(hh, jnp.int32), jnp.asarray(ww, jnp.int32))))
    return pending


def _resolve_photometry(pending, out):
    """Fetch queued photometry chunks into the 1-D ``out`` array."""
    for lo, hi, dev in pending:
        out[lo:hi] = np.asarray(dev)[:hi - lo]
        profiling.bump("ledger/photometry_fetches")
        # The full pow2-padded bucket crosses the link, not just the
        # consumed rows — the ledger must count transferred bytes.
        profiling.bump("ledger/fetch_bytes", int(dev.size * dev.dtype.itemsize))


def _dispatch_photometry(stack, img_id, hs, ws, method, window_radius,
                         brim, top, chunk):
    """Chunked device photometry at (img_id, hs, ws) positions over the
    [F, C, H, W] stack (device-resident or host). Returns (B,) float64."""
    phot = np.empty(hs.shape[0], np.float64)
    _resolve_photometry(
        _queue_photometry(stack, img_id, hs, ws, method, window_radius,
                          brim, top, chunk), phot)
    return phot


def flush_hole_queue(queue):
    """Resolve every deferred hole-gather request.

    Each entry is ``(pending, phot, hole_t, hole_c)`` appended by
    run_experiment_stack(hole_queue=...): the gather kernels were
    already enqueued (async) at group time — they execute in the
    device-queue gaps between later groups' uploads — and only the
    result FETCH is deferred here. The (Ttot, C) ``phot`` buffers are
    filled IN PLACE: the row tuples run_experiment_stack already
    returned alias rows of those buffers, so the NaN holes they carried
    become real values. Callers must flush before reading any hole
    photometry.
    """
    for pending, phot, hole_t, hole_c in queue:
        vals = np.empty(hole_t.shape[0], np.float64)
        _resolve_photometry(pending, vals)
        phot[hole_t, hole_c] = vals
    queue.clear()


def _rows_by_field(pos, cats, phot, field_sizes, F):
    """Rows per field: categories in first-appearance order, then trace
    order (binary_trace_categories -> btc_photometries iteration).

    The grouping is pure index arithmetic — categories pack into uint64
    bitmask words (one word per 64 cycles), one np.unique per field
    recovers the groups, and a stable argsort on first-appearance rank
    reproduces the reference's dict-insertion iteration order without
    any per-row Python work."""
    C = cats.shape[1] if cats.ndim == 2 else 0
    nw = (C + 63) // 64 or 1  # bitmask words per trace
    padded = np.zeros((cats.shape[0], nw * 64), np.uint64)
    padded[:, :C] = cats
    codes_all = padded.reshape(-1, nw, 64) @ (
        np.uint64(1) << np.arange(64, dtype=np.uint64))
    if nw == 1:
        codes_all = codes_all[:, 0]  # 1-D unique is much faster
    h0_all, w0_all = pos[:, 0, 0], pos[:, 0, 1]
    out = []
    start = 0
    for f in range(F):
        stop = start + field_sizes[f]
        codes = codes_all[start:stop]
        uniq, first_idx, inv = np.unique(
            codes, axis=0 if nw > 1 else None,
            return_index=True, return_inverse=True)
        inv = inv.reshape(-1)  # numpy>=2.0 keeps the axis-0 shape
        rank = np.empty(len(uniq), np.int64)
        rank[np.argsort(first_idx, kind="stable")] = np.arange(len(uniq))
        order = np.argsort(rank[inv], kind="stable")
        cat_tuples = [tuple(bool(x) for x in cats[start + i])
                      for i in first_idx]
        rows = [(cat_tuples[inv[j]], int(h0_all[start + j]),
                 int(w0_all[start + j]), phot[start + j]) for j in order]
        out.append(rows)
        start = stop
    return out


def filter_monotone_categories(category_counts):
    """One-drop monotone category filter over {channel: {field: {cat:
    n}}} — tuple(sorted(cat, reverse=True)) == cat, the reference's
    count_binary_trace_categories_filtered rule
    (flexlibrary.py:2894-2946). Shared by the single-process and
    multihost front doors so the rule cannot drift between them."""
    return {ch: {f: {cat: n for cat, n in d.items()
                     if tuple(sorted(cat, reverse=True)) == cat}
                 for f, d in by_f.items()}
            for ch, by_f in category_counts.items()}


def write_track_rows_csv(rows, n_cycles, csv_path, save_averages=False):
    """The track-photometries CSV writer over assembled row tuples
    (channel, field, h, w, category, photometries-or-mean) — the
    reference's CHANNEL,FIELD,H,W,CATEGORY[,FRAME i...] schema
    (flexlibrary.py:2755-2892; None photometries write '0' like its row
    builder, :2884-2886). ONE definition shared by api.run_experiment
    and parallel/multihost.run_experiment: the multihost CSV's
    byte-identity contract with the single-process writer holds by
    construction."""
    import csv as csv_module

    with open(csv_path, "w", newline="") as fh:
        writer = csv_module.writer(fh, dialect="excel")
        if save_averages:
            writer.writerow(["CHANNEL", "FIELD", "H", "W", "CATEGORY",
                             "AVERAGE_INTENSITY"])
            for (channel, f, h0, w0, cat, mean) in rows:
                writer.writerow([str(channel), str(f), str(h0), str(w0),
                                 str(cat), str(mean)])
            return
        writer.writerow(["CHANNEL", "FIELD", "H", "W", "CATEGORY"] +
                        ["FRAME " + str(i) for i in range(n_cycles)])
        for (channel, f, h0, w0, cat, ph) in rows:
            writer.writerow([str(channel), str(f), str(h0), str(w0),
                             str(cat)] +
                            [str(v) if v is not None else "0"
                             for v in ph])
