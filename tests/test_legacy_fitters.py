"""Tests for legacy lognormal fitters (v1-v7), GMM/cluster fits, FWHM."""

import math

import numpy as np

import MCsimlib


BETA = 30000.0
ALPHA = 1000.0
GAMMA = 8000.0
BETA_SIGMA = 0.2
ALPHA_SIGMA = 2000.0


def _trace(rng, seq, beta=BETA, alpha=0.0):
    return [float(rng.lognormal(math.log(beta) + math.log(v), BETA_SIGMA)) +
            alpha if v > 0 else alpha + float(rng.normal(0, 500))
            for v in seq]


def test_v1_recovers_simple_drop():
    rng = np.random.default_rng(0)
    seq = (1, 1, 0, 0)
    ints = _trace(rng, seq, beta=60000.0)
    out = MCsimlib._intensities_to_signal_lognormal(
        ints, mu_zero=0, sigma_zero=2000, mu_one=60000)
    signal, is_zero, best_seq = out[0], out[1], out[2]
    assert best_seq == seq
    assert signal == (("A", 2),)
    assert is_zero


def test_v2_recovers_and_mp_driver():
    rng = np.random.default_rng(1)
    phot = {"ch1": {0: {}}}
    for t in range(10):
        seq = (2, 1, 1, 0)
        ints = _trace(rng, seq, alpha=ALPHA)
        phot["ch1"][0][(t, 0)] = (tuple(v > 0 for v in seq), tuple(ints), t)
    signals, total, none_count, info = \
        MCsimlib._photometries_lognormal_fit_MP_v2(
            phot, ALPHA, BETA + ALPHA, GAMMA + ALPHA, max_possible=5,
            allow_multidrop=False)
    assert total == 10
    top = max(signals, key=signals.get)
    assert top[0] == (("A", 1), ("A", 3))


def test_v3_v5_v7_recover():
    rng = np.random.default_rng(2)
    seq = (1, 1, 1, 0)
    ints = _trace(rng, seq, alpha=ALPHA)
    out3 = MCsimlib._intensities_to_signal_lognormal_v3(
        ints, ALPHA, BETA + ALPHA, GAMMA + ALPHA, ALPHA_SIGMA, BETA_SIGMA)
    assert out3[2] == seq
    adj = [i - ALPHA for i in ints]
    out5 = MCsimlib._intensities_to_signal_lognormal_v5(
        adj, 0.0, BETA, GAMMA, ALPHA_SIGMA, BETA_SIGMA)
    assert out5[2] == seq
    out7 = MCsimlib._intensities_to_signal_lognormal_v7(
        adj, 0.0, BETA, GAMMA, ALPHA_SIGMA, BETA_SIGMA,
        categories=tuple(v > 0 for v in seq))
    assert out7[2] == seq
    assert out7[0] == (("A", 3),)


def test_v6_with_deltas_and_find_deltas():
    d0, d1 = MCsimlib._find_deltas(ALPHA_SIGMA, BETA, BETA_SIGMA,
                                   gamma_score=0.05)
    assert d0 is not None and d1 is not None and 0 < d0 <= d1 <= BETA
    rng = np.random.default_rng(3)
    seq = (1, 0, 0)
    adj = _trace(rng, seq)
    out6 = MCsimlib._intensities_to_signal_lognormal_v6(
        adj, 0.0, BETA, GAMMA, ALPHA_SIGMA, BETA_SIGMA, deltas=(d0, d1),
        gamma_score=0.05)
    assert out6[2] == seq


def test_nearest_neighbor():
    rng = np.random.default_rng(4)
    seq = (2, 1, 0)
    ints = _trace(rng, seq, alpha=ALPHA)
    signal, is_zero, nn = MCsimlib._lognormal_nearest_neighbor(
        ints, ALPHA, BETA + ALPHA, GAMMA + ALPHA)
    assert nn == [2, 1, 0]
    assert signal == (("A", 1), ("A", 2))
    assert is_zero


def test_gmm_photometries():
    rng = np.random.default_rng(5)
    raw = np.concatenate([rng.normal(1000, 300, 500),
                          rng.normal(30000, 3000, 300)])
    fm, best_fit, best_n, best_bic, all_fits, rp = \
        MCsimlib._gmm_photometries({"ch1": {}}, min_fluors=1, max_fluors=2,
                                   raw_photometries=raw.tolist(), n_init=2)
    means = sorted(float(np.ravel(m)[0]) for m in fm)
    assert abs(means[0] - 1000) < 1500
    assert any(abs(m - 30000) < 4000 for m in means)


def test_cluster_fit_2_and_translate():
    rng = np.random.default_rng(6)
    ints = ([float(rng.normal(60000, 2000)) for _ in range(4)] +
            [float(rng.normal(30000, 2000)) for _ in range(4)] +
            [float(rng.normal(500, 300)) for _ in range(4)])
    fit, score, is_zero, esfi = MCsimlib._cluster_fit_2(
        ints, max_num_drops=3, zero_level=5000, single_fluor_min=20000,
        single_fluor_max=40000, fluor_std=5000, n_init=3,
        gaussian_score_min=0.0)
    assert fit is not None
    assert len(fit) == 3
    assert is_zero
    assert abs(esfi - 30000) < 8000
    collated = MCsimlib._collate_means_into_fit(fit)
    signal = MCsimlib._translate_plateaus_into_signal_3(
        plateaus=collated, originals_included=True, fluor_intensity=esfi)
    assert signal == (("A", 4), ("A", 8))
    sig2 = MCsimlib._translate_plateaus_into_signal_2(
        plateaus=collated, originals_included=True)
    assert sig2 == (("A", 4), ("A", 8))


def test_parallel_cluster_fit():
    rng = np.random.default_rng(7)
    phot = {"ch1": {0: {}}}
    for t in range(4):
        ints = ([float(rng.normal(30000, 1500)) for _ in range(5)] +
                [float(rng.normal(500, 300)) for _ in range(5)])
        phot["ch1"][0][(t, 0)] = ((True,) * 5 + (False,) * 5, tuple(ints), t)
    (fitted, collated, signals, indexed, all_indexed, none_fits) = \
        MCsimlib._parallel_cluster_fit(
            phot, zero_level=5000, single_fluor_min=20000,
            single_fluor_max=40000, fluor_std=5000, max_num_drops=2,
            n_init=3, gaussian_score_min=0.0)
    assert sum(signals.values()) >= 3
    top = max(signals, key=signals.get)
    assert top[0] == (("A", 5),)


def test_fwhm_method_v2():
    rng = np.random.default_rng(8)
    phot = {"ch1": {0: {}}}
    for t in range(200):
        ints = (float(rng.lognormal(math.log(30000), 0.2)) + 1000,
                float(rng.normal(1000, 300)))
        phot["ch1"][0][(t, 0)] = ((True, False), ints, t)
    out = MCsimlib.fwhm_method_v2(phot)
    alpha_photometry, alpha_sigma, beta_photometry, beta_sigma = out[:4]
    assert alpha_photometry == 0
    assert abs(beta_photometry - 30000) / 30000 < 0.35
    assert 0 < beta_sigma < 1.0


def test_gmm_adjust():
    phot = {"ch1": {0: {(1, 1): ((True, True), (100.0, 200.0), 0)}}}
    adjusted, coeffs = MCsimlib._gmm_adjust(
        phot, mu_zero=0.0, sigma_zero=1.0, mu_one=100.0, sigma_one=1.0,
        per_cycle_m0s0m1s1={0: (0.0, 1.0, 50.0, 1.0),
                            1: (100.0, 1.0, 200.0, 1.0)})
    assert coeffs == {0: 2.0, 1: 1.0}
    assert adjusted["ch1"][0][(1, 1)][1] == [200.0, 100.0]
