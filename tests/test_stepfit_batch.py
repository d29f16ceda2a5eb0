"""Batched stepfit fast path (ops/stepfit_batch.py) vs the exact host chain
(stepfitting.py, port of the reference's stepfitting_library.py)."""

import numpy as np

from fluorosequencingimageanalysis_tpu import stepfitting as sf
from fluorosequencingimageanalysis_tpu.ops.stepfit_batch import (
    chung_kennedy_batch, sliding_t_masks, stepfit_batched)


def _step_traces(rng, n=5, t=40, noise=800.0):
    levels = np.where(np.arange(t) < 15, 60000.0,
                      np.where(np.arange(t) < 28, 30000.0, 1000.0))
    return levels[None] + rng.normal(0, noise, (n, t))


def test_chung_kennedy_batch_matches_host():
    rng = np.random.default_rng(0)
    for t in (20, 40, 61):
        traces = rng.normal(0, 1, (3, t)) + np.where(np.arange(t) < t // 2,
                                                     10.0, 4.0)
        ours = np.asarray(chung_kennedy_batch(traces,
                                              window_lengths=(2, 4, 8, 16)))
        for i in range(traces.shape[0]):
            ref = sf.chung_kennedy_filter(list(traces[i]),
                                          window_lengths=(2, 4, 8, 16))
            np.testing.assert_allclose(ours[i], ref, atol=1e-9)


def test_sliding_t_masks_match_host_welch():
    rng = np.random.default_rng(1)
    traces = _step_traces(rng, n=4, t=50, noise=300.0)
    mask = np.asarray(sliding_t_masks(traces, window_radius=6,
                                      p_threshold=0.01))
    for i in range(traces.shape[0]):
        seq = list(traces[i])
        expected = []
        for f in range(len(seq)):
            t_stat, p = sf._welch_t(seq[f - 5:f], seq[f:f + 5])
            expected.append(p < 0.01)
        assert list(mask[i]) == expected


def test_stepfit_batched_matches_trace_chain():
    rng = np.random.default_rng(2)
    phot = _step_traces(rng, n=4, t=40)
    for mirror_start, ck_n in ((0, 0), (5, 1)):
        batched = stepfit_batched(phot, mirror_start=mirror_start,
                                  chung_kennedy=ck_n, p_threshold=0.01)
        for i in range(phot.shape[0]):
            photometries = tuple(phot[i].tolist())
            mirrored = sf.mirror_photometries(photometries,
                                              mirror_size=mirror_start)
            ck = mirrored
            for _ in range(ck_n):
                ck = sf.chung_kennedy_filter(luminosities=mirrored,
                                             window_lengths=(2, 4, 8, 16))
            plateaus = sf.sliding_t_fitter(
                luminosity_sequence=ck, window_radius=6, p_threshold=0.01,
                median_filter_size=None, downsteps_only=False,
                min_step_magnitude=None)
            plateaus = sf.refit_plateaus(mirrored, plateaus)
            t_filtered = sf.t_test_filter(
                luminosities=mirrored, plateaus=plateaus, p_threshold=0.01,
                drop_sort=True, no_merge_start=mirror_start)
            un_plateaus = sf.unmirror_plateaus(plateaus,
                                               mirror_size=mirror_start)
            un_t = sf.unmirror_plateaus(t_filtered,
                                        mirror_size=mirror_start)
            b_phot, b_ck, b_pl, b_t = batched[i]
            np.testing.assert_allclose(b_phot, photometries)
            np.testing.assert_allclose(
                b_ck, sf.unmirror_photometries(ck, mirror_size=mirror_start),
                atol=1e-8)
            assert [(a, b) for a, b, _ in b_pl] == \
                [(a, b) for a, b, _ in un_plateaus]
            assert [(a, b) for a, b, _ in b_t] == \
                [(a, b) for a, b, _ in un_t]
            np.testing.assert_allclose([h for _, _, h in b_t],
                                       [h for _, _, h in un_t])


def test_native_postpass_equals_python_fallback():
    """The C++ post-pass (native/stepchain.cpp: plateau assembly -> refit
    -> iterated drop-sort Welch-t merge) must produce EXACTLY the Python
    fallback's plateau structures. Forced-branch differential on a random
    battery: steps of varied magnitude/position, flat traces, short
    traces, negative-going traces."""
    import pytest

    from fluorosequencingimageanalysis_tpu.native import stepchain

    if not stepchain.have_native():
        pytest.skip("native stepchain unavailable (no g++?)")

    rng = np.random.default_rng(7)
    batteries = [
        _step_traces(rng, n=16, t=60, noise=1200.0),
        rng.normal(5000.0, 400.0, (8, 25)),              # stepless
        -_step_traces(rng, n=8, t=40, noise=600.0),      # inverted
        np.concatenate([                                  # ragged steps
            np.where(np.arange(48) < k, 40000.0, 9000.0)[None]
            + rng.normal(0, 900.0, (1, 48))
            for k in range(4, 44, 5)]),
        np.concatenate([                                  # exact-0 tails
            # run_timetrace-style absent-frame tails: zero-variance
            # plateau pairs whose Welch p is NaN must take the same
            # deterministic NaN-last merge order on both sides.
            np.where(np.arange(48) < k, 30000.0, 0.0)[None]
            + np.where(np.arange(48) < k,
                       rng.normal(0, 700.0, (1, 48)), 0.0)
            for k in (8, 16, 24, 31)]),
    ]
    orig = stepchain.have_native
    for phot in batteries:
        native = stepfit_batched(phot, mirror_start=10, chung_kennedy=1,
                                 p_threshold=0.01)
        stepchain.have_native = lambda: False
        try:
            fallback = stepfit_batched(phot, mirror_start=10,
                                       chung_kennedy=1, p_threshold=0.01)
        finally:
            stepchain.have_native = orig
        for (p_n, ck_n, pl_n, t_n), (p_p, ck_p, pl_p, t_p) in zip(
                native, fallback):
            np.testing.assert_array_equal(p_n, p_p)
            np.testing.assert_allclose(ck_n, ck_p, atol=1e-9)
            assert [(a, b) for a, b, _ in pl_n] == \
                [(a, b) for a, b, _ in pl_p]
            np.testing.assert_allclose([h for _, _, h in pl_n],
                                       [h for _, _, h in pl_p], rtol=1e-12)
            assert [(a, b) for a, b, _ in t_n] == \
                [(a, b) for a, b, _ in t_p]
            np.testing.assert_allclose([h for _, _, h in t_n],
                                       [h for _, _, h in t_p], rtol=1e-12)


def test_stepfit_tracks_batched_equals_sequential():
    from fluorosequencingimageanalysis_tpu.pipeline.experiment import \
        TimetraceExperiment
    from fluorosequencingimageanalysis_tpu.pipeline.traces import SimpleTrace
    from fluorosequencingimageanalysis_tpu.pipeline.spots import Spot, Image

    rng = np.random.default_rng(3)
    num_frames = 30
    levels = np.where(np.arange(num_frames) < 12, 50000.0, 2000.0)
    centers = [(10, 10), (20, 30), (40, 5)]
    frames = []
    for f in range(num_frames):
        arr = rng.normal(100, 5, (64, 64))
        for (h, w) in centers:
            arr[h - 2:h + 3, w - 2:w + 3] += levels[f] / 25.0
        frames.append(Image(image=arr.astype(np.float64)))

    def make_trace(h, w):
        spots = []
        for f in range(num_frames):
            spot = Spot(frames[f], h, w, 5)
            frames[f].spots.append(spot)
            spots.append(spot)
        return SimpleTrace(spots)

    exp = TimetraceExperiment.__new__(TimetraceExperiment)
    exp.spot_traces = [make_trace(10, 10), make_trace(20, 30),
                       make_trace(40, 5)]
    exp.step_fits = {}
    exp.step_fit_intermediates = {}
    fits_b, inter_b = exp.stepfit_tracks(photometry_method="simple",
                                         batched=True)
    exp2 = TimetraceExperiment.__new__(TimetraceExperiment)
    exp2.spot_traces = exp.spot_traces
    exp2.step_fits = {}
    exp2.step_fit_intermediates = {}
    fits_s, inter_s = exp2.stepfit_tracks(photometry_method="simple",
                                          batched=False)
    assert set(fits_b) == set(fits_s)
    for hw in fits_b:
        assert [(a, b) for a, b, _ in fits_b[hw].trace] == \
            [(a, b) for a, b, _ in fits_s[hw].trace]
        np.testing.assert_allclose([h for _, _, h in fits_b[hw].trace],
                                   [h for _, _, h in fits_s[hw].trace])
        np.testing.assert_allclose(
            inter_b[hw]["ck_filtered_photometries"].trace,
            inter_s[hw]["ck_filtered_photometries"].trace, atol=1e-8)


def test_stepfit_batched_chunk_invariant():
    """The chunked dispatch (fused CK+sliding-t per chunk, pow2-bucketed
    ragged tail, per-chunk concatenation) must be invisible: a 3-chunk
    run with a ragged tail equals the single-dispatch run row for row."""
    rng = np.random.default_rng(11)
    phot = _step_traces(rng, n=70, t=40, noise=500.0)
    one = stepfit_batched(phot, mirror_start=10, chung_kennedy=1,
                          p_threshold=0.01)
    many = stepfit_batched(phot, mirror_start=10, chung_kennedy=1,
                           p_threshold=0.01, chunk=32)
    assert len(one) == len(many) == 70
    for (p_a, ck_a, pl_a, t_a), (p_b, ck_b, pl_b, t_b) in zip(one, many):
        np.testing.assert_array_equal(p_a, p_b)
        np.testing.assert_array_equal(ck_a, ck_b)
        assert pl_a == pl_b
        assert t_a == t_b


def test_stepfit_batched_empty_input():
    """Zero traces must return an empty list, not crash (a spotless
    experiment yields an (0, T) photometry array)."""
    for mesh in (None,):
        out = stepfit_batched(np.zeros((0, 30)), mirror_start=5,
                              chung_kennedy=1, p_threshold=0.01)
        assert out == []


def test_stepfit_window_radius_5_yields_no_steps():
    """window_radius=5 means an EMPTY sliding-t radius range: the host
    chain finds no steps (single plateau). Regression: the device mask
    used to initialize all-True, inverting this into every-frame-a-step
    (and feeding a frame-0 step into the native post-pass)."""
    from fluorosequencingimageanalysis_tpu.ops.stepfit_batch import (
        stepfit_batched, sliding_t_masks)

    rng = np.random.default_rng(7)
    levels = np.where(np.arange(40) < 18, 50000.0, 2000.0)
    phot = levels[None] + rng.normal(0, 400, (8, 40))
    mask = np.asarray(sliding_t_masks(phot, window_radius=5))
    assert not mask.any()
    results = stepfit_batched(phot, mirror_start=0, chung_kennedy=0,
                              p_threshold=0.01, window_radius=5)
    for _, _, plateaus, t_filtered in results:
        assert len(plateaus) == 1 and len(t_filtered) == 1
        assert plateaus[0][0] == 0 and plateaus[0][1] == 39


def test_stepfit_postpass_rejects_frame0_step():
    """A step mask hit at frame 0 must raise (the host _fit_plateau
    raises on the same input); it also bounds the native output
    buffers. Regression: it used to write a degenerate NaN plateau and
    could overflow the per-trace rows."""
    import pytest
    from fluorosequencingimageanalysis_tpu.native import stepchain

    if not stepchain.have_native():
        pytest.skip("native stepchain unavailable")
    raw = np.random.default_rng(0).normal(1000, 10, (2, 6))
    mask = np.zeros((2, 6), np.uint8)
    mask[1, 0] = 1
    with pytest.raises(ValueError, match="frame 0"):
        stepchain.stepfit_postpass(raw, mask, 0.01, 0)


def test_sliding_t_masks_f32_high_dc_matches_host():
    """Regression: the (sum_sq - sum^2/n) window variance from float32
    cumsums cancels catastrophically at real photometry magnitudes
    (DC ~6e4, steps ~1e3), flipping borderline step bits vs the float64
    host chain. Centering each trace before the cumulative sums (Welch's
    t is shift-invariant) must make the f32 masks match the host's
    p-values exactly on this confirmed-failing workload."""
    import jax.numpy as jnp
    from fluorosequencingimageanalysis_tpu import stepfitting as sf
    from fluorosequencingimageanalysis_tpu.ops.stepfit_batch import (
        sliding_t_masks)

    rng = np.random.default_rng(17)
    N, T, radius = 300, 60, 5
    base = 60000.0
    traces = np.full((N, T), base) + rng.normal(0, 700.0, (N, T))
    traces[:, T // 2:] -= 1200.0  # borderline step at p ~ 0.01
    traces_f32 = traces.astype(np.float32)

    masks = np.asarray(sliding_t_masks(jnp.asarray(traces_f32),
                                       window_radius=radius + 1,
                                       p_threshold=0.01))
    # Host oracle mask, same f32-rounded data (the dtype the device
    # sees), float64 math like the reference chain.
    seq = traces_f32.astype(np.float64)
    mismatches = 0
    for i in range(N):
        for f in range(T):
            left = seq[i, max(f - radius, 0):f]
            right = seq[i, f:f + radius]
            if len(left) < radius:
                want = False
            else:
                _, p = sf._welch_t(list(left), list(right))
                want = p < 0.01
            mismatches += want != bool(masks[i, f])
    assert mismatches == 0, f"{mismatches} mask bits differ from host"


def _chisq_traces(rng, n, t):
    """Step traces with noise, plus degenerate rows (constant, one hard
    step, near-tied split candidates)."""
    traces = np.zeros((n, t))
    for i in range(n):
        nsteps = int(rng.integers(0, 4))
        drops = np.sort(rng.choice(np.arange(3, t - 3), nsteps,
                                   replace=False))
        level = float(nsteps + 1)
        tr = np.full(t, level)
        for d in drops:
            level -= 1.0
            tr[d:] = level
        traces[i] = tr * 2500 + rng.normal(0, 300, t)
    traces[0] = 777.25                       # constant: span == 0
    half = t // 2
    traces[1] = np.r_[np.full(half, 5000.0), np.full(t - half, 100.0)]
    traces[2, :] = np.round(traces[2] / 500) * 500  # exact ties likely
    return traces


def test_chi_squared_fit_batch_equals_host_oracle():
    """The batched Kerssemakers fitter (native core when available, host
    loop otherwise) is per-trace BIT-equal to chi_squared_step_fitter —
    the parity contract of VERDICT r3 item 4 — across parameter combos
    incl. counter-fit constraints, step-magnitude gates and
    ignore_counterfits."""
    rng = np.random.default_rng(3)
    N, T = 14, 36
    traces = _chisq_traces(rng, N, T)
    for kwargs in (dict(), dict(num_steps=8),
                   dict(num_steps=5, min_step_length=3),
                   dict(num_steps=6, min_step_magnitude=900.0),
                   dict(num_steps=4, ignore_counterfits=True),
                   dict(num_steps_multiplier=0.3)):
        batch = sf.chi_squared_fit_batch(traces, **kwargs)
        for i in range(N):
            oracle = sf.chi_squared_step_fitter(
                tuple(float(v) for v in traces[i]), **kwargs)
            assert len(batch[i]) == len(oracle), (i, kwargs)
            for a, b in zip(batch[i], oracle):
                assert a[0] == b[0] and a[1] == b[1], (i, kwargs, a, b)
                assert a[2] == b[2], (i, kwargs, a[2] - b[2])


def test_chi_squared_fit_batch_native_vs_python_fallback():
    """Force the Python fallback and require identical output to the
    native path (both must equal the oracle; this pins the dispatch
    itself)."""
    from fluorosequencingimageanalysis_tpu.native import chisqfit

    if not chisqfit.have_native():
        import pytest
        pytest.skip("native chisqfit unavailable")
    rng = np.random.default_rng(4)
    traces = _chisq_traces(rng, 6, 30)
    native = sf.chi_squared_fit_batch(traces, num_steps=6)
    orig = chisqfit.have_native
    try:
        chisqfit.have_native = lambda: False
        fallback = sf.chi_squared_fit_batch(traces, num_steps=6)
    finally:
        chisqfit.have_native = orig
    assert native == fallback


def test_chi_squared_fit_batch_validation():
    import pytest
    rng = np.random.default_rng(5)
    traces = rng.normal(size=(3, 20))
    with pytest.raises(ValueError):
        sf.chi_squared_fit_batch(traces, num_steps_multiplier=0)
    with pytest.raises(ValueError):
        sf.chi_squared_fit_batch(traces, num_steps=20)  # must be < T
    with pytest.raises(ValueError):
        sf.chi_squared_fit_batch(traces[:, :1])  # T < 2
    assert sf.chi_squared_fit_batch(np.zeros((0, 20))) == []


def test_chi_squared_fit_batch_adversarial_tie_sweep():
    """Randomized stress for the native Kerssemakers core's bit-parity
    claim: heavily QUANTIZED traces (values rounded to a coarse grid)
    force exact residual ties in the <=-last / <-first tie rules, and
    random parameter draws hit the counter-fit constraints from many
    geometries. Every trace must match the host oracle bit-for-bit."""
    rng = np.random.default_rng(17)
    for trial in range(10):
        T = int(rng.integers(12, 80))
        n = int(rng.integers(3, 9))
        traces = np.zeros((n, T))
        for i in range(n):
            nsteps = int(rng.integers(0, min(5, T // 4)))
            drops = np.sort(rng.choice(np.arange(2, T - 2), nsteps,
                                       replace=False))
            level = float(nsteps + 1)
            tr = np.full(T, level)
            for d in drops:
                level -= 1.0
                tr[d:] = level
            tr = tr * 2000 + rng.normal(0, 400, T)
            # Quantize to force exact ties in split residuals.
            q = float(rng.choice([250.0, 500.0, 1000.0]))
            traces[i] = np.round(tr / q) * q
        kwargs = dict(
            num_steps=int(rng.integers(2, min(10, T - 2))),
            min_step_length=int(rng.integers(0, 4)),
            min_step_magnitude=float(rng.choice([0.0, 300.0, 900.0])),
            ignore_counterfits=bool(rng.integers(0, 2)))
        batch = sf.chi_squared_fit_batch(traces, **kwargs)
        for i in range(n):
            oracle = sf.chi_squared_step_fitter(
                tuple(float(v) for v in traces[i]), **kwargs)
            assert len(batch[i]) == len(oracle), (trial, i, kwargs)
            for a, b in zip(batch[i], oracle):
                assert a[0] == b[0] and a[1] == b[1] and a[2] == b[2], \
                    (trial, i, kwargs, a, b)


def test_chi_squared_overfull_counterfit_raises_like_host():
    """num_steps = T - 1 with min_step_length = 0 on a strictly stepping
    trace: the host chain raises ValueError when the counterfit target
    p + 1 exceeds T (the reference's stepfitting_library.py:277-280); the
    native batch core must flag the trace and raise the identical error
    instead of silently returning a fit (ADVICE r4)."""
    import pytest

    T = 6
    trace = np.array([6000.0, 5000.0, 4000.0, 3000.0, 2000.0, 1000.0])
    kwargs = dict(num_steps=T - 1, min_step_length=0,
                  min_step_magnitude=0.0)
    with pytest.raises(ValueError, match="num_plateaus = 7 is greater"):
        sf.chi_squared_step_fitter(tuple(trace), **kwargs)
    with pytest.raises(ValueError, match="num_plateaus = 7 is greater"):
        sf.chi_squared_fit_batch(trace[None], **kwargs)
