"""Faithful test-only oracle of the reference's greedy particle tracking.

Implements Experiment.greedy_particle_tracking exactly as
/root/reference/flexlibrary.py:679-1027 does — full-pixel-grid object
arrays walked with np.ndenumerate, a persistent ancestor cache with
newer-frame overwrites, distance-sorted greedy pair acceptance (Python's
stable sort preserving raster generation order on ties), and head-first
trace extraction with None gaps — including Python-2 rounding for the
binning. Deliberately UNoptimized (O(frames x H x W) grid walks) so it
stays structurally equivalent to the reference for differential testing
of the fast implementation in pipeline/tracking.py.
"""

from __future__ import annotations

import math

import numpy as np


def _py2_round(x):
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _accumulate(offsets):
    out, ch, cw = [], 0.0, 0.0
    for dh, dw in offsets:
        ch += dh
        cw += dw
        out.append((ch, cw))
    return out


def _empty():
    return {"spt": None, "s_L": None, "a_L": None, "d_L": None}


def greedy_particle_tracking_oracle(frame_spots, frame_shape,
                                    candidate_radius=2, offsets=None,
                                    spot_radius=0):
    """Returns (traces, total_discarded) with reference semantics."""
    num_frames = len(frame_spots)
    if offsets is None:
        offsets = [(0, 0)] * num_frames
    cum = _accumulate(offsets)

    # Drop spots that drift out of any frame (flexlibrary.py:625-677).
    filtered = []
    total_discarded = 0
    for f, frame in enumerate(frame_spots):
        kept = []
        for spt in frame:
            oh = spt.h + cum[f][0]
            ow = spt.w + cum[f][1]
            ok = True
            for (gh, gw) in cum:
                uh, uw = oh - gh, ow - gw
                if not (spot_radius <= uh < frame_shape[0] - 0.5 - spot_radius
                        and spot_radius <= uw <
                        frame_shape[1] - 0.5 - spot_radius):
                    ok = False
                    break
            if ok:
                kept.append(spt)
            else:
                total_discarded += 1
        filtered.append(kept)
    frame_spots = filtered

    # Full-grid object arrays, one cell per pixel (reference layout).
    frame_bins = [np.empty(frame_shape, dtype=object)
                  for _ in range(num_frames)]
    for fb in frame_bins:
        for (h, w), _ in np.ndenumerate(fb):
            fb[h, w] = _empty()
    ancestor_cache = np.empty(frame_shape, dtype=object)
    for (h, w), _ in np.ndenumerate(ancestor_cache):
        ancestor_cache[h, w] = _empty()

    for f, frame in enumerate(frame_spots):
        for spt in frame:
            h = spt.h + cum[f][0]
            w = spt.w + cum[f][1]
            rh, rw = int(_py2_round(h)), int(_py2_round(w))
            assert frame_bins[f][rh, rw]["spt"] is None, \
                ((rh, rw), "already filled", f)
            frame_bins[f][rh, rw] = {"spt": spt, "s_L": (f, rh, rw),
                                     "a_L": None, "d_L": None}

    for f in range(num_frames):
        if f == 0:
            continue
        frame = frame_bins[f]
        # Merge the prior frame into the cache (newer overwrites older).
        for (rh, rw), fbin in np.ndenumerate(frame_bins[f - 1]):
            if fbin["spt"] is None:
                continue
            ancestor_cache[rh, rw] = {"spt": fbin["spt"],
                                      "s_L": (f - 1, rh, rw),
                                      "a_L": None, "d_L": None}
        pairs = []
        for (ah, aw), abin in np.ndenumerate(ancestor_cache):
            a_spt = abin["spt"]
            if a_spt is None:
                continue
            aaf = abin["s_L"][0]
            lo_h = max(ah - candidate_radius - 2, 0)
            lo_w = max(aw - candidate_radius - 2, 0)
            window = frame[lo_h:ah + candidate_radius + 3,
                           lo_w:aw + candidate_radius + 3]
            for (dh, dw), dbin in np.ndenumerate(window):
                if dbin["spt"] is None:
                    continue
                dh += lo_h
                dw += lo_w
                d_spt = dbin["spt"]
                # scipy euclidean form (sqrt of the squared sums),
                # exactly as the reference computes distances.
                _ddh = (a_spt.h + cum[aaf][0]) - (d_spt.h + cum[f][0])
                _ddw = (a_spt.w + cum[aaf][1]) - (d_spt.w + cum[f][1])
                distance = math.sqrt(_ddh * _ddh + _ddw * _ddw)
                if distance < candidate_radius:
                    pairs.append((a_spt, aaf, ah, aw, d_spt, f, dh, dw,
                                  distance))
        pairs = sorted(pairs, key=lambda x: x[8])  # stable on ties
        for (a_spt, aaf, ah, aw, d_spt, ddf, dh, dw, distance) in pairs:
            if ancestor_cache[ah, aw] == _empty():
                continue  # ancestor already paired this frame
            if frame[dh, dw]["a_L"] is not None:
                continue  # descendant already paired
            frame[dh, dw]["a_L"] = (aaf, ah, aw)
            assert frame_bins[aaf][ah, aw]["d_L"] is None
            frame_bins[aaf][ah, aw]["d_L"] = (ddf, dh, dw)
            ancestor_cache[ah, aw] = _empty()

    traces = []
    heads = []
    for f in range(num_frames):
        for (h, w), fbin in np.ndenumerate(frame_bins[f]):
            if fbin["spt"] is not None and fbin["a_L"] is None:
                heads.append((fbin["spt"], fbin["s_L"], fbin["d_L"]))
    for spt, s_L, d_L in heads:
        trace = [None] * s_L[0] + [spt]
        if d_L is None:
            trace += [None] * (num_frames - s_L[0] - 1)
            traces.append(trace)
            continue
        df, dh, dw = d_L
        while True:
            dbin = frame_bins[df][dh, dw]
            ds_L, dd_L = dbin["s_L"], dbin["d_L"]
            trace += [None] * (ds_L[0] - s_L[0] - 1)
            trace.append(dbin["spt"])
            if dd_L is None:
                break
            s_L = ds_L
            df, dh, dw = dd_L
        trace += [None] * (num_frames - ds_L[0] - 1)
        traces.append(trace)
    return traces, total_discarded
