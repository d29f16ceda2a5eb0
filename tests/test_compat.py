"""Smoke tests: the reference-compatible module shims import and work."""

import numpy as np


def test_pflib_shim(tmp_path):
    import pflib
    assert pflib.default_correlation_matrix.shape == (5, 5)
    h = pflib._epoch_to_hash(1500000000)
    assert pflib._hash_to_epoch(h) == 1500000000
    # End-to-end: synthetic field -> psfs dict -> pkl/csv artifacts.
    rng = np.random.default_rng(0)
    img = rng.normal(400, 8, (64, 64))
    hh, ww = np.indices((64, 64)).astype(float)
    img += 3000 * np.exp(-(((hh - 30) ** 2) + ((ww - 40) ** 2)) / 3.4)
    img = np.round(img).astype(np.uint16)
    psfs = pflib.find_peptides(img, dtype=np.float64)
    assert len(psfs) == 1
    pkl = pflib.save_psfs_pkl(psfs,
                              output_path=str(tmp_path / "x_psfs_test.pkl"))
    csvp = pflib.save_psfs_csv(psfs,
                               output_path=str(tmp_path / "x_psfs_test.csv"))
    import pickle
    with open(pkl, "rb") as f:
        loaded = pickle.load(f)
    assert set(loaded) == set(psfs)
    text = open(csvp).read()
    assert "Absolute image path" in text
    cands = pflib._psf_candidates(img)
    assert (30, 40) in cands
    assert pflib.illumina_s_n(img[28:33, 38:43]) > 3


def test_gaussfitter_shim():
    import gaussfitter
    from oracles import gauss2d_oracle
    p_true = [200.0, 3000.0, 2.4, 2.6, 1.2, 1.3, 0.0]
    data = gauss2d_oracle(p_true, (5, 5))
    (params, fitimage) = gaussfitter.gaussfit(
        data, params=(np.median(data), np.amax(data), 2.5, 2.5, 1, 1, 0),
        limitedmin=[True] * 7,
        limitedmax=[False, False, True, True, True, True, True],
        minpars=np.array([0.0, (np.amax(data) - np.mean(data)) / 3.0,
                          2.0, 2.0, 0.75, 0.75, 0.0]),
        maxpars=np.array([0.0, 0.0, 3.0, 3.0, 2.0, 2.0, 360.0]),
        returnfitimage=True)
    np.testing.assert_allclose(params[:6], p_true[:6], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(fitimage, data, atol=1.0)
    # twodgaussian closure matches the oracle convention.
    model = gaussfitter.twodgaussian(p_true)(*np.indices((5, 5)))
    np.testing.assert_allclose(model, data, rtol=1e-12)


def test_phase_correlate_shim():
    import phase_correlate as pc
    rng = np.random.default_rng(1)
    img = rng.normal(100, 10, (64, 64))
    r, c, e, p = pc.phase_correlate(img, np.roll(img, 3, axis=0))
    assert (r, c) == (-3, 0)


def test_stepfitting_and_flexlibrary_shims():
    import stepfitting_library as sfl
    import flexlibrary
    lum = [10.0] * 10 + [0.0] * 10
    plateaus = sfl.sliding_t_fitter(lum, window_radius=6, p_threshold=0.01)
    assert len(plateaus) >= 1
    assert hasattr(flexlibrary, "SequenceExperiment")
    assert hasattr(flexlibrary.Experiment, "greedy_particle_tracking")


def test_mcsimlib_shim():
    import MCsimlib
    assert abs(MCsimlib._dp(1, 0, 0.9) - 0.9) < 1e-12
    cleaved = MCsimlib.cleave({"P": "ABKCD"}, "K")
    assert cleaved["P"] == ("ABK", "CD")
    s = {((("A", 1),), True, 1): 3, ((("A", 2),), True, 1): 1}
    pct = MCsimlib.counts_to_percent(s)
    assert abs(pct[((("A", 1),), True, 1)] - 0.75) < 1e-12


def test_peptide_simulator_shim():
    import peptide_simulator as ps
    results = ps.simulate_dye_counts("ABAC", {"A"}, 0, 4, 1, random_seed=0,
                                     p=1.0, b=0.0, u=0.0, s=0.0, sc=0,
                                     s2=0.0)
    assert results[0][1]["A"] == (2, 1, 1, 0, 0)


def test_plotting_shim(tmp_path):
    import plotting
    signals = {((("A", 2),), True, 1): 10,
               ((("A", 1), ("A", 3)), True, 2): 5,
               ((("A", 0),), False, 1): 2}
    f1 = str(tmp_path / "single.html")
    plotting.single_drops_heatmap_v2(
        signals, num_mocks=1, num_edmans=3, num_mocks_omitted=0,
        peptide_string="PEP", wavelength=561, zmin=None, zmax=None,
        filepath=f1, plot_remainders=True)
    text = open(f1).read()
    assert "Single Drops" in text and "10" in text
    f2 = str(tmp_path / "double.html")
    plotting.double_drops_heatmap_v2(
        signals, num_mocks=1, num_edmans=3, num_mocks_omitted=0,
        peptide_string="PEP", wavelength=561, zmin=None, zmax=None,
        filepath=f2, plot_remainders=True)
    assert "Double Drops" in open(f2).read()
    f3 = str(tmp_path / "hist.html")
    plotting.plot_histogram(np.random.default_rng(0).normal(0, 1, 500),
                            "T", "y", "x", True, f3)
    assert "svg" in open(f3).read()


def test_jupyter_development_shim():
    import jupyter_development as jd
    assert jd.signal_to_sequence((("A", 2),), 4, 1) == (1, 1, 0, 0)
    assert jd.sequence_to_signal((2, 2, 1, 0)) == (("A", 2), ("A", 3))
    assert jd.sequence_to_category((2, 0, 1)) == (True, False, True)
    # ON/OFF grabbing from fit info rows.
    info = [("ch1", 0, 5, 5, 1, (True, False), (100.0, 0.0),
             ((("A", 1),),), True, (1, 0), 5, 0.5, [1.0, 1.0], 1)]
    on_offs = jd.grab_ON_OFFS(info, alpha_adjust=0)
    assert on_offs == {(0, 0): ((100.0, 1),)}
    adj = jd.ON_OFF_adjust_photometries(
        {"ch1": {0: {(5, 5): ((True, False), (100.0, 50.0), 1)}}},
        on_offs, alpha=0)
    assert adj["ch1"][0][(5, 5)][1][1] == 50.0


def test_onedgaussfit_recovers():
    import gaussfitter as gf
    x = np.linspace(-5, 5, 101)
    rng = np.random.default_rng(0)
    y = gf.onedgaussian(x, 10, 100, 1.0, 0.8) + rng.normal(0, 1, 101)
    mpp, model, perr, chi2 = gf.onedgaussfit(x, y, usemoments=True)
    assert abs(mpp[1] - 100) < 3
    assert abs(mpp[2] - 1.0) < 0.05
    assert abs(mpp[3] - 0.8) < 0.05
    assert model.shape == y.shape and chi2 > 0


def test_multigaussfit_two_peaks():
    import gaussfitter as gf
    x = np.linspace(-5, 5, 101)
    rng = np.random.default_rng(1)
    y = gf.n_gaussian(pars=[50, -2, 0.5, 80, 2, 0.7])(x) + rng.normal(0, 1, 101)
    mpp, model, perr, chi2 = gf.multigaussfit(
        x, y, ngauss=2, params=[40, -2.2, 0.6, 70, 1.9, 0.6])
    assert abs(mpp[0] - 50) < 5 and abs(mpp[1] + 2) < 0.1
    assert abs(mpp[3] - 80) < 5 and abs(mpp[4] - 2) < 0.1


def test_collapse_gaussfit_cube():
    import gaussfitter as gf
    rng = np.random.default_rng(2)
    cube = np.zeros((21, 3, 3))
    for i in range(3):
        for j in range(3):
            cube[:, i, j] = (gf.onedgaussian(np.arange(21), 0, 50, 10, 2) +
                             rng.normal(0, 1, 21))
    w, o, a, c2 = gf.collapse_gaussfit(cube, axis=0)
    assert abs(np.nanmean(w) - 2.0) < 0.2
    assert abs(np.nanmean(o) - 10.0) < 0.2
