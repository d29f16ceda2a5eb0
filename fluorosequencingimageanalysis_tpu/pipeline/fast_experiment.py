"""Array-native full-experiment path (the redesigned flagship workflow).

Covers the reference's ``basic_experiment_script`` flow end-to-end without
ever materializing Spot/Image objects:

    [F, C, H, W] stack
      -> experiment_step_sharded (registration + detect/fit + spot bucket)
      -> per-field native greedy tracking on arrays (tracklink.cpp)
      -> trace assembly + linear interpolation of missing frames
      -> invalid-trace discarding
      -> batched device photometry at every (spot, frame) position
      -> binary categories + track-photometries CSV rows

Semantics are the experiment classes' (pipeline/experiment.py, themselves
parity with /root/reference/flexlibrary.py:1664-2892):
- spot identities are the Py2-rounded fitted centers, deduplicated in
  candidate order with 5x5-fit validity (Spot.__init__ including its
  gaussian_fit fallback quirk, flexlibrary.py:90-101),
- tracking offsets/binning/tie rules per greedy_particle_tracking,
- interpolation per interpolate_spots/fill_in_trace (constant-position
  extrapolation at head/tail holes, offset re-application per frame),
- a trace is invalid (dropped) if any filled position falls outside the
  5x5 box or outside the photometry window (valid_slice at the metric's
  radius, which is what trace_to_photometry(return_invalid=False) rejects),
- CSV rows ordered channel -> field -> category (first-appearance order)
  -> trace, with H/W from the filled trace's first frame.

tests/test_fast_experiment.py proves equality against the class-based path
row by row.
"""

from __future__ import annotations

import numpy as np

from ..utils.rounding import py2_round
from .tracking import accumulate_offsets


def _spot_lists(out, F, C, H, W, spot_size=5):
    """Device-step outputs -> per-(field, cycle) integer spot arrays.

    Replicates the psfs-dict construction + Spot.__init__ filtering of the
    class path: kept fits ordered by candidate index, deduplicated on the
    Py2-rounded center key (setdefault), 5x5 validity with the reference's
    gaussian_fit fallback quirk.
    Returns rh[f][c], rw[f][c] (int64 arrays).
    """
    r = (spot_size - 1) // 2
    spot_valid = out["spot_valid"]
    spot_h = out["spot_h"]
    spot_w = out["spot_w"]
    cand_idx = out["spot_cand_idx"]
    rhs = [[None] * C for _ in range(F)]
    rws = [[None] * C for _ in range(F)]
    for f in range(F):
        for c in range(C):
            v = spot_valid[f, c]
            if not v.any():
                rhs[f][c] = np.zeros(0, np.int64)
                rws[f][c] = np.zeros(0, np.int64)
                continue
            h0 = spot_h[f, c][v]
            w0 = spot_w[f, c][v]
            order = np.argsort(cand_idx[f, c][v], kind="stable")
            h0, w0 = h0[order], w0[order]
            rh = np.where(h0 >= 0, np.floor(h0 + 0.5),
                          np.ceil(h0 - 0.5)).astype(np.int64)
            rw = np.where(w0 >= 0, np.floor(w0 + 0.5),
                          np.ceil(w0 - 0.5)).astype(np.int64)
            # Spot.__init__ validity (experiment classes discard raisers):
            # plain 5x5 fit, or the reference's buggy fallback that lets an
            # out-of-box spot through unless (h_0 outside AND w_0 inside).
            ok_plain = ((rh >= r) & (rh + r < H) & (rw >= r) & (rw + r < W))
            in_h = (h0 >= r) & (h0 < H - r)
            in_w = (w0 >= r) & (w0 < W - r)
            keep = ok_plain | ~(~in_h & in_w)
            rh, rw = rh[keep], rw[keep]
            # psfs-dict setdefault: first candidate wins a shared key.
            _, first = np.unique(rh * W + rw, return_index=True)
            first.sort()
            rhs[f][c] = rh[first]
            rws[f][c] = rw[first]
    return rhs, rws


def _track_field(rh_by_cycle, rw_by_cycle, frame_shape, offsets,
                 candidate_radius=2):
    """Native greedy linking on integer positions; returns per-trace
    (frames, hs, ws) index arrays in reference head order."""
    from ..native.tracklink import greedy_link, have_native

    C = len(rh_by_cycle)
    cum = np.asarray(accumulate_offsets(offsets), dtype=np.float64)
    counts = np.array([len(rh_by_cycle[c]) for c in range(C)], np.int32)
    frame_start = np.zeros(C + 1, np.int32)
    np.cumsum(counts, out=frame_start[1:])
    h = np.concatenate([rh_by_cycle[c] + cum[c, 0] for c in range(C)]) \
        if frame_start[-1] else np.zeros(0)
    w = np.concatenate([rw_by_cycle[c] + cum[c, 1] for c in range(C)]) \
        if frame_start[-1] else np.zeros(0)
    if frame_start[-1] == 0:
        return []
    if have_native():
        anc, desc = greedy_link(h, w, frame_start, frame_shape,
                                candidate_radius)
    else:  # pure-python fallback via the host tracker on mock spots
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
        traces, _ = greedy_particle_tracking(frames, frame_shape,
                                             candidate_radius=candidate_radius,
                                             offsets=offsets, use_native=False)
        out = []
        frame_of = np.repeat(np.arange(C), counts)
        ih = np.concatenate([rh_by_cycle[c] for c in range(C)])
        iw = np.concatenate([rw_by_cycle[c] for c in range(C)])
        for tr in traces:
            idx = [s.i for s in tr if s is not None]
            frs = [f for f, s in enumerate(tr) if s is not None]
            out.append((np.asarray(frs), ih[idx], iw[idx]))
        return out

    frame_of = np.repeat(np.arange(C), counts)
    ih = np.concatenate([rh_by_cycle[c] for c in range(C)])
    iw = np.concatenate([rw_by_cycle[c] for c in range(C)])
    # Head order = reference extraction walk: frame, then bin raster rank.
    rast_bin = (np.where(h >= 0, np.floor(h + 0.5), np.ceil(h - 0.5)) *
                frame_shape[1] +
                np.where(w >= 0, np.floor(w + 0.5), np.ceil(w - 0.5)))
    heads = np.nonzero(anc == -1)[0]
    heads = heads[np.lexsort((rast_bin[heads], frame_of[heads]))]
    traces = []
    for s in heads:
        s = int(s)
        frs, hh, ww = [], [], []
        while s != -1:
            frs.append(int(frame_of[s]))
            hh.append(int(ih[s]))
            ww.append(int(iw[s]))
            s = int(desc[s])
        traces.append((np.asarray(frs), np.asarray(hh), np.asarray(ww)))
    return traces


def _fill_trace(frames, hs, ws, C, cum, frame_shape, spot_radius=2):
    """Interpolate missing frames (interpolate_spots/fill_in_trace
    semantics). Returns (positions (C, 2) int array, ok) where ok is False
    if any filled position misses the 5x5 box (trace would be invalid)."""
    H, W = frame_shape
    present = np.zeros(C, dtype=bool)
    present[frames] = True
    pos = np.zeros((C, 2), dtype=np.int64)
    pos[frames, 0] = hs
    pos[frames, 1] = ws
    ok = True
    # Walk holes: each maximal run of missing frames with its bookends.
    f = 0
    while f < C:
        if present[f]:
            f += 1
            continue
        run_start = f
        while f < C and not present[f]:
            f += 1
        run_stop = f  # first present after the run, or C
        i1 = run_start - 1  # bookend frames (-1 = head hole)
        i2 = run_stop if run_stop < C else -1  # -1 = tail hole
        if i1 >= 0 and i2 >= 0:
            start_h, start_w = float(pos[i1, 0]), float(pos[i1, 1])
            # stop position mapped into the start frame's coordinates
            # (offset_frame_coordinates with f=start, g=stop).
            d = cum[i1] - cum[i2]
            stop_h = pos[i2, 0] + d[0]
            stop_w = pos[i2, 1] + d[1]
            n = i2 - i1
            base = i1
        elif i2 >= 0:  # head hole: constant at stop's frame-0-mapped pos
            d = cum[run_start] - cum[i2]
            start_h = pos[i2, 0] + d[0]
            start_w = pos[i2, 1] + d[1]
            stop_h, stop_w = start_h, start_w
            n = max(run_stop - run_start, 1)
            base = run_start
        else:  # tail hole: constant at start's own position
            start_h, start_w = float(pos[i1, 0]), float(pos[i1, 1])
            stop_h, stop_w = start_h, start_w
            n = max(C - 1 - i1, 1)
            base = i1
        h_inc = (stop_h - start_h) / n
        w_inc = (stop_w - start_w) / n
        for j in range(run_start, run_stop):
            i = j - base
            h = start_h + h_inc * i
            w = start_w + w_inc * i
            off = cum[j] - cum[base]
            ih = py2_round(h + off[0])
            iw = py2_round(w + off[1])
            if not (spot_radius <= ih < H - spot_radius and
                    spot_radius <= iw < W - spot_radius):
                ok = False
            pos[j] = (ih, iw)
    return pos, ok


def run_experiment_field(field_stack, offsets, spot_arrays,
                         photometry_radius=9, photometry_brim=6,
                         candidate_radius=2):
    """One field: tracking -> fill-in -> validity -> batched photometry.

    field_stack: (C, H, W) numpy; offsets: [(dh, dw)] per cycle;
    spot_arrays: (rh_by_cycle, rw_by_cycle) int arrays.
    Returns list of (category, h0, w0, photometries (C,)) per valid trace,
    in reference row order.
    """
    import jax.numpy as jnp
    from ..ops.photometry import mexican_hat_batch

    C, H, W = field_stack.shape
    cum = np.asarray(accumulate_offsets(offsets), dtype=np.float64)
    traces = _track_field(spot_arrays[0], spot_arrays[1], (H, W), offsets,
                          candidate_radius)
    filled, cats = [], []
    for frames, hs, ws in traces:
        pos, ok = _fill_trace(frames, hs, ws, C, cum, (H, W))
        if not ok:
            continue
        # trace_to_photometry(return_invalid=False) also rejects positions
        # whose photometry window is truncated (valid_slice at radius).
        r = photometry_radius
        if not ((pos[:, 0] >= r) & (pos[:, 0] < H - r) &
                (pos[:, 1] >= r) & (pos[:, 1] < W - r)).all():
            continue
        cat = np.zeros(C, dtype=bool)
        cat[frames] = True
        filled.append(pos)
        cats.append(tuple(bool(x) for x in cat))
    if not filled:
        return []
    all_pos = np.stack(filled)  # (T, C, 2)
    # One device dispatch per cycle image over all traces' positions.
    phot = np.empty((len(filled), C), dtype=np.float64)
    for c in range(C):
        ph = mexican_hat_batch(jnp.asarray(field_stack[c]),
                               jnp.asarray(all_pos[:, c, 0], jnp.int32),
                               jnp.asarray(all_pos[:, c, 1], jnp.int32),
                               brim_size=photometry_brim,
                               radius=photometry_radius)
        phot[:, c] = np.asarray(ph, dtype=np.float64)
    # Row order: categories in first-appearance order, then trace order
    # (binary_trace_categories -> btc_photometries iteration).
    by_cat = {}
    for t, cat in enumerate(cats):
        by_cat.setdefault(cat, []).append(t)
    rows = []
    for cat, idxs in by_cat.items():
        for t in idxs:
            rows.append((cat, int(all_pos[t, 0, 0]), int(all_pos[t, 0, 1]),
                         phot[t]))
    return rows
