"""Randomized differential tests: pipeline.tracking vs the faithful oracle.

The fast implementation (pipeline/tracking.py: sparse bins + windowed
vectorizable pair generation) must reproduce the reference's object-grid
walk (tests/tracking_oracle.py) EXACTLY — same traces, same None gaps,
same tie resolution, same ancestor-cache overwrites — on dense random
fields with dropouts, re-appearances, drift offsets, and engineered
distance/rounding ties. VERDICT r1 item 3(i).
"""

import numpy as np
import pytest

from fluorosequencingimageanalysis_tpu.pipeline.tracking import (
    greedy_particle_tracking as _gpt)
from fluorosequencingimageanalysis_tpu.native.tracklink import have_native
from tracking_oracle import greedy_particle_tracking_oracle

# Every differential test runs against BOTH implementations: the NumPy
# host fallback and the C++ linking core (when the toolchain built it).
NATIVE_MODES = [False] + ([True] if have_native() else [])


def greedy_particle_tracking(*args, use_native=False, **kwargs):
    return _gpt(*args, use_native=use_native, **kwargs)


class MockSpot:
    """Minimal spot: tracking reads only .h and .w."""

    __slots__ = ("h", "w", "label")

    def __init__(self, h, w, label):
        self.h = h
        self.w = w
        self.label = label

    def __repr__(self):
        return f"S({self.label}@{self.h:.2f},{self.w:.2f})"


def _random_field_movie(rng, num_frames, shape, n_tracks, drop_p=0.15,
                        jitter=0.35, drift=0.0, tie_fraction=0.0):
    """Movie of persistent tracks with per-frame dropouts + jitter.

    Tracks sit on a sparse integer grid (>= 3 px apart satisfies the
    reference's >= 2 px precondition even after +-jitter). tie_fraction of
    spots land on exact half-integer coordinates to exercise Py2-rounding
    and exact-distance ties.
    """
    H, W = shape
    cells = [(h, w) for h in range(3, H - 3, 3) for w in range(3, W - 3, 3)]
    rng.shuffle(cells)
    assert n_tracks <= len(cells)
    bases = cells[:n_tracks]
    frames = []
    label = 0
    offsets = [(0.0, 0.0)]
    for f in range(num_frames):
        if f > 0:
            offsets.append((rng.uniform(-drift, drift),
                            rng.uniform(-drift, drift)) if drift else (0, 0))
        spots = []
        for t, (bh, bw) in enumerate(bases):
            if rng.random() < drop_p:
                continue
            if tie_fraction and rng.random() < tie_fraction:
                h, w = bh + 0.5, bw - 0.5
            else:
                h = bh + rng.uniform(-jitter, jitter)
                w = bw + rng.uniform(-jitter, jitter)
            spots.append(MockSpot(h, w, label))
            label += 1
        rng.shuffle(spots)  # input order must not matter (binning sorts)
        frames.append(spots)
    return frames, offsets


def _trace_key(trace):
    return tuple(-1 if s is None else s.label for s in trace)


def _assert_same_traces(ours, oracle):
    t_ours, d_ours = ours
    t_ref, d_ref = oracle
    assert d_ours == d_ref, (d_ours, d_ref)
    key_ours = sorted(map(_trace_key, t_ours))
    key_ref = sorted(map(_trace_key, t_ref))
    assert key_ours == key_ref, (
        f"{len(key_ours)} vs {len(key_ref)} traces; first diff: "
        + next((f"{a} != {b}" for a, b in zip(key_ours, key_ref) if a != b),
               "length"))


@pytest.mark.parametrize("native", NATIVE_MODES)
@pytest.mark.parametrize("seed", range(6))
def test_differential_dense_random(seed, native):
    rng = np.random.default_rng(seed)
    frames, _ = _random_field_movie(rng, num_frames=6, shape=(64, 64),
                                    n_tracks=120, drop_p=0.2)
    shape = (64, 64)
    _assert_same_traces(
        greedy_particle_tracking(frames, shape, candidate_radius=2,
                                 use_native=native),
        greedy_particle_tracking_oracle(frames, shape, candidate_radius=2))


@pytest.mark.parametrize("native", NATIVE_MODES)
@pytest.mark.parametrize("seed", range(3))
def test_differential_with_drift_offsets(seed, native):
    rng = np.random.default_rng(100 + seed)
    frames, offsets = _random_field_movie(rng, num_frames=5, shape=(48, 48),
                                          n_tracks=60, drop_p=0.25,
                                          drift=1.5)
    shape = (48, 48)
    _assert_same_traces(
        greedy_particle_tracking(frames, shape, candidate_radius=2,
                                 offsets=offsets, use_native=native),
        greedy_particle_tracking_oracle(frames, shape, candidate_radius=2,
                                        offsets=offsets))


@pytest.mark.parametrize("native", NATIVE_MODES)
@pytest.mark.parametrize("seed", range(3))
def test_differential_rounding_and_distance_ties(seed, native):
    """Half-integer coordinates: Py2 rounding boundaries + exact-equal
    distances, where only the raster-stable sort order decides pairing."""
    rng = np.random.default_rng(200 + seed)
    frames, _ = _random_field_movie(rng, num_frames=5, shape=(48, 48),
                                    n_tracks=60, drop_p=0.2, jitter=0.0,
                                    tie_fraction=0.6)
    shape = (48, 48)
    _assert_same_traces(
        greedy_particle_tracking(frames, shape, candidate_radius=2,
                                 use_native=native),
        greedy_particle_tracking_oracle(frames, shape, candidate_radius=2))


@pytest.mark.parametrize("native", NATIVE_MODES)
def test_differential_gap_reappearance_and_cache_overwrite(native):
    """A spot that skips 2 frames must reconnect through the ancestor
    cache; an unpaired ancestor whose bin a newer spot lands on must be
    OVERWRITTEN in the cache (newer frame wins) exactly like the
    reference — orphaning the older spot's trace for good."""
    shape = (32, 32)
    a0 = MockSpot(10.0, 10.0, 0)   # present f0, gone f1-f2, back f3
    a3 = MockSpot(10.2, 10.1, 1)
    g0 = MockSpot(19.0, 20.0, 5)   # wins e1 (dist 0.6 < b0's 0.8)
    b0 = MockSpot(20.4, 20.0, 2)   # loses e1, then e1 overwrites its bin
    e1 = MockSpot(19.6, 20.0, 3)   # bins to (20, 20) == b0's bin
    h2 = MockSpot(20.4, 20.0, 4)   # links to e1 (cache), NOT to b0
    frames = [[a0, g0, b0], [e1], [h2], [a3]]
    ours = greedy_particle_tracking(frames, shape, candidate_radius=2,
                                    use_native=native)
    ref = greedy_particle_tracking_oracle(frames, shape, candidate_radius=2)
    _assert_same_traces(ours, ref)
    # The semantics themselves: a reconnects over the 2-frame gap; the g
    # chain runs g0 -> e1 -> h2; b0 is orphaned by the cache overwrite
    # even though h2 sits at b0's exact coordinates.
    keys = sorted(_trace_key(t) for t in ours[0])
    assert keys == [(0, -1, -1, 1), (2, -1, -1, -1), (5, 3, 4, -1)], keys


@pytest.mark.parametrize("native", NATIVE_MODES)
def test_differential_spot_radius_dropouts(native):
    """Edge spots discarded by spot_radius/offsets count identically."""
    shape = (32, 32)
    rng = np.random.default_rng(7)
    frames, offsets = _random_field_movie(rng, num_frames=4, shape=shape,
                                          n_tracks=40, drop_p=0.1, drift=2.0)
    ours = greedy_particle_tracking(frames, shape, candidate_radius=2,
                                    offsets=offsets, spot_radius=3,
                                    use_native=native)
    ref = greedy_particle_tracking_oracle(frames, shape, candidate_radius=2,
                                          offsets=offsets, spot_radius=3)
    assert ours[1] == ref[1] and ours[1] > 0
    _assert_same_traces(ours, ref)
