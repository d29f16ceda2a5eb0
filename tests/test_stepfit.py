"""Tests for the step-fitting library (reference-semantics checks)."""

import numpy as np
from scipy.stats import ttest_ind

from fluorosequencingimageanalysis_tpu import stepfitting as sf


def _step_train(rng, plateaus, noise=30.0):
    seq = []
    for start, stop, height in plateaus:
        seq += [height] * (stop - start + 1)
    return [s + rng.normal(0, noise) for s in seq]


def test_fit_plateau_and_residuals():
    lum = [1, 2, 3, 4, 5]
    p = sf._fit_plateau(lum, 1, 3)
    assert p == (1, 3, 3.0)
    assert sf._plateau_squared_residuals(lum, p) == 2.0


def test_split_plateau_finds_obvious_step():
    lum = [10.0] * 10 + [0.0] * 10
    lp, lr, rp, rr, tot = sf._split_plateau(lum, (0, 19, 5.0),
                                            min_step_magnitude=5)
    assert lp == (0, 9, 10.0)
    assert rp == (10, 19, 0.0)
    assert tot == 0.0


def test_chi_squared_step_fitter_plus_ttest_recovers_single_step():
    """The fitter finds the true boundary; its extra (overfit) splits are
    statistically insignificant and merge away under the t-test filter —
    the combination the reference's CLI applies."""
    rng = np.random.default_rng(0)
    truth = [(0, 19, 10000.0), (20, 39, 2000.0)]
    lum = _step_train(rng, truth, noise=100.0)
    fit = sf.chi_squared_step_fitter(lum, min_step_magnitude=0.0)
    # The true boundary is present in the raw fit.
    assert any(p[0] == 20 for p in fit)
    merged = sf.t_test_filter(lum, fit, p_threshold=0.01)
    merged = sf.refit_plateaus(lum, merged)
    assert [(p[0], p[1]) for p in merged] == [(0, 19), (20, 39)]
    assert abs(merged[0][2] - 10000) < 150 and abs(merged[1][2] - 2000) < 150


def test_chi_squared_step_fitter_invariants():
    """Multi-step trains: the reference's greedy local-residual splitting is
    size-biased (it may overfit quiet plateaus; the production pipeline uses
    sliding_t_fitter instead), so we assert structural invariants, not exact
    recovery."""
    rng = np.random.default_rng(0)
    truth = [(0, 14, 10000.0), (15, 29, 5000.0), (30, 44, 0.0)]
    lum = _step_train(rng, truth, noise=100.0)
    fit = sf.chi_squared_step_fitter(lum, min_step_magnitude=0.0)
    # Contiguous cover of all frames.
    assert fit[0][0] == 0 and fit[-1][1] == len(lum) - 1
    for a, b in zip(fit, fit[1:]):
        assert a[1] + 1 == b[0]
    # num_steps cap respected.
    capped = sf.chi_squared_step_fitter(lum, num_steps=4,
                                        min_step_magnitude=0.0,
                                        ignore_counterfits=True)
    assert len(capped) <= 5
    # ignore_counterfits returns the longest fit of the progression.
    assert len(capped) == 5


def test_sliding_t_fitter_recovers_steps_and_pick_last_of_group():
    rng = np.random.default_rng(1)
    truth = [(0, 19, 8000.0), (20, 39, 2000.0)]
    lum = _step_train(rng, truth, noise=50.0)
    plateaus = sf.sliding_t_fitter(lum, window_radius=6, p_threshold=0.01)
    # Step at frame 20 (the reference picks the LAST frame of each
    # consecutive candidate group).
    assert len(plateaus) == 2
    assert plateaus[0][0] == 0 and plateaus[1][1] == 39
    assert abs(plateaus[1][0] - 20) <= 1


def test_sliding_t_fitter_flat_sequence_single_plateau():
    rng = np.random.default_rng(2)
    lum = [1000 + rng.normal(0, 20) for _ in range(30)]
    plateaus = sf.sliding_t_fitter(lum, window_radius=6, p_threshold=0.001)
    assert len(plateaus) == 1
    assert plateaus[0][:2] == (0, 29)


def test_t_test_filter_merges_equal_plateaus():
    rng = np.random.default_rng(3)
    lum = [1000 + rng.normal(0, 50) for _ in range(40)]
    # Artificial split in the middle of statistically identical data.
    plateaus = [sf._fit_plateau(lum, 0, 19), sf._fit_plateau(lum, 20, 39)]
    merged = sf.t_test_filter(lum, plateaus, p_threshold=0.01)
    assert len(merged) == 1
    assert merged[0][:2] == (0, 39)


def test_t_test_filter_keeps_real_steps():
    rng = np.random.default_rng(4)
    lum = _step_train(rng, [(0, 19, 9000.0), (20, 39, 1000.0)], noise=50.0)
    plateaus = [sf._fit_plateau(lum, 0, 19), sf._fit_plateau(lum, 20, 39)]
    kept = sf.t_test_filter(lum, plateaus, p_threshold=0.01)
    assert len(kept) == 2


def test_filter_upsteps():
    lum = [0.0] * 10 + [100.0] * 10 + [50.0] * 10
    plateaus = [(0, 9, 0.0), (10, 19, 100.0), (20, 29, 50.0)]
    filtered = sf.filter_upsteps(lum, plateaus)
    # The upstep 0->100 merges; merged plateau height is the refit mean.
    assert filtered[0][0] == 0
    assert all(a[2] >= b[2] for a, b in zip(filtered, filtered[1:]))


def test_chung_kennedy_preserves_plateaus_sharpens_steps():
    rng = np.random.default_rng(5)
    lum = _step_train(rng, [(0, 24, 5000.0), (25, 49, 500.0)], noise=100.0)
    filtered = sf.chung_kennedy_filter(lum)
    assert len(filtered) == len(lum)
    # Filtered values stay near the plateau means away from the step.
    assert abs(np.mean(filtered[5:20]) - 5000) < 200
    assert abs(np.mean(filtered[30:45]) - 500) < 200
    # Variance should drop (it is a smoother).
    assert np.var(np.asarray(filtered[5:20])) < np.var(np.asarray(lum[5:20]))


def test_mirror_unmirror_roundtrip():
    photometries = [1, 2, 3, 4, 5]
    m = sf.mirror_photometries(photometries, 2)
    assert m == [2, 1, 1, 2, 3, 4, 5]
    assert sf.unmirror_photometries(m, 2) == [1, 2, 3, 4, 5]
    plateaus = [(0, 3, 10.0), (4, 6, 5.0)]
    un = sf.unmirror_plateaus(plateaus, 2)
    assert un == [(0, 1, 10.0), (2, 4, 5.0)]


def test_plateau_accessors():
    plateaus = [(0, 4, 10.0), (5, 9, 6.0), (10, 14, 1.0)]
    assert sf.plateau_value(plateaus, 7) == 6.0
    steps = sf.plateaus_to_steps(plateaus)
    assert steps == [(4, 5, -4.0), (9, 10, -5.0)]
    assert sf.last_step_info(steps, 7) == (0, 4, -4.0)
    assert sf.last_step_info(steps, 12) == (1, 9, -5.0)
    assert sf.frame_plateau(plateaus, 11) == ((10, 14, 1.0), 2)
    assert sf.plateau_starts(plateaus) == {0, 5, 10}


def test_welch_t_matches_scipy():
    rng = np.random.default_rng(6)
    a = rng.normal(0, 1, 10).tolist()
    b = rng.normal(1, 2, 8).tolist()
    t, p = sf._welch_t(a, b)
    t_ref, p_ref = ttest_ind(a, b, equal_var=False)
    np.testing.assert_allclose([t, p], [t_ref, p_ref])


def test_welch_t_bit_identical_to_scipy():
    """_welch_t re-implements scipy.stats.ttest_ind(equal_var=False)
    without the per-call axis/nan-policy overhead; the transcription must
    stay BIT-identical (t-test p-values gate plateau merges, so a single
    ulp at a p == threshold boundary would change step fits)."""
    import warnings

    rng = np.random.default_rng(0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for trial in range(2000):
            n1 = int(rng.integers(1, 12))
            n2 = int(rng.integers(1, 12))
            kind = trial % 4
            a = rng.normal(0, 1, n1)
            b = rng.normal(0, 1, n2)
            if kind == 1:
                a = np.full(n1, 3.0)  # zero variance left
            if kind == 2:
                a = np.full(n1, 3.0)
                b = np.full(n2, 3.0)  # both degenerate
            if kind == 3:
                b = a[:n2] if n2 <= n1 else np.concatenate([a, a])[:n2]
            t_ref, p_ref = ttest_ind(a, b, equal_var=False)
            t_new, p_new = sf._welch_t(list(a), list(b))
            assert (np.isnan(t_ref) and np.isnan(t_new)) or t_ref == t_new
            assert (np.isnan(p_ref) and np.isnan(p_new)) or p_ref == p_new


def test_t_filter_nan_pairs_deterministic():
    """NaN Welch p-values (zero-variance equal-mean or single-element
    plateau pairs) sort LAST under a deterministic total order: they
    never merge, never veto, and never perturb the ordering of REAL
    p-values (the reference's sorted() with NaN keys is Timsort-
    implementation-defined; see PARITY.md)."""
    # Plateaus: two singletons (their pair p is NaN), then three noisy
    # plateaus with graded similarity.
    lum = [10.0, 10.0,                         # singletons -> NaN pairs
           5.1, 4.9, 5.05, 4.95,               # A
           5.0, 5.1, 4.9, 5.0,                 # B (close to A)
           20.0, 30.0, 10.0, 22.0]             # C (far from B)
    plateaus = [(0, 0, 10.0), (1, 1, 10.0), (2, 5, 5.0),
                (6, 9, 5.0), (10, 13, 20.5)]
    # Sanity: the singleton pairs really produce NaN p.
    import math
    _, p01 = sf._welch_t(lum[0:1], lum[1:2])
    assert math.isnan(p01)
    _, p_ab = sf._welch_t(lum[2:6], lum[6:10])
    _, p_bc = sf._welch_t(lum[6:10], lum[10:14])
    assert p_ab > 0.5 and p_bc < 0.05
    out = sf._t_test_filter_singlepass(lum, plateaus, p_threshold=0.1,
                                       drop_sort=True, no_merge_start=0)
    # Only the A+B merge is accepted; singletons and C stay untouched.
    assert [(a, b) for a, b, _ in out] == [(0, 0), (1, 1), (2, 9),
                                           (10, 13)]

    # Veto propagation with NaNs mid-list: pairs (A,B) p=0.76 and (B,C')
    # both above threshold share plateau B -> the HIGHER p merge must
    # win and veto the other, regardless of the NaN entries' positions.
    lum2 = [10.0, 10.0, 5.1, 4.9, 5.05, 4.95, 5.04, 5.1, 4.9, 5.04,
            5.2, 4.8, 5.1, 4.82]
    plateaus2 = [(0, 0, 10.0), (1, 1, 10.0), (2, 5, 5.0),
                 (6, 9, 5.0), (10, 13, 5.0)]
    _, p_ab2 = sf._welch_t(lum2[2:6], lum2[6:10])
    _, p_bc2 = sf._welch_t(lum2[6:10], lum2[10:14])
    assert p_ab2 > 0.1 and p_bc2 > 0.1 and p_ab2 != p_bc2
    out2 = sf._t_test_filter_singlepass(lum2, plateaus2, p_threshold=0.1,
                                        drop_sort=True, no_merge_start=0)
    if p_ab2 > p_bc2:
        assert [(a, b) for a, b, _ in out2] == [(0, 0), (1, 1), (2, 9),
                                                (10, 13)]
    else:
        assert [(a, b) for a, b, _ in out2] == [(0, 0), (1, 1), (2, 5),
                                                (6, 13)]
