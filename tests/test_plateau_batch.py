"""Batched exhaustive plateau fitting vs the host _plateau_fit."""

import time

import numpy as np

from fluorosequencingimageanalysis_tpu.inference.photometries import (
    _plateau_fit)
from fluorosequencingimageanalysis_tpu.ops.plateau_batch import (
    plateau_fit_batched)


def _traces(n=30, t=8, seed=0):
    rng = np.random.default_rng(seed)
    levels = np.where(np.arange(t) < 3, 50000.0,
                      np.where(np.arange(t) < 6, 25000.0, 1000.0))
    x = levels[None] + rng.normal(0, 800, (n, t))
    x[min(5, n - 1)] = 7.0  # constant trace exercises the special case
    return x


def _flatten(fit):
    return [v for plateau in fit for v in plateau]


def test_plateau_fit_batched_matches_host():
    x = _traces()
    for kwargs in ({}, {"downsteps_only": True}, {"use_adjusted_r_2": True},
                   {"original_intensities_only": False},
                   {"include_original_intensities": True,
                    "original_intensities_only": False},
                   {"delta_r_2": 0.0}, {"delta_r_2": 0.3}):
        batched = plateau_fit_batched(x, max_num_drops=3, **kwargs)
        for i in range(x.shape[0]):
            ref_fit, ref_r2 = _plateau_fit(list(x[i]), max_num_drops=3,
                                           **kwargs)
            b_fit, b_r2 = batched[i]
            assert abs(b_r2 - ref_r2) < 1e-9, (i, kwargs)
            assert [len(p) for p in b_fit] == [len(p) for p in ref_fit]
            if kwargs.get("include_original_intensities"):
                assert _flatten(b_fit) == _flatten(ref_fit)
            else:
                np.testing.assert_allclose(_flatten(b_fit),
                                           _flatten(ref_fit))


def test_plateau_fit_batched_means_output():
    # original_intensities_only=False without originals returns the means
    x = _traces(n=4)
    out = plateau_fit_batched(x, max_num_drops=2,
                              original_intensities_only=False)
    for (fit, r2), row in zip(out, x):
        for plateau in fit:
            assert len(set(np.round(plateau, 9))) == 1  # constant per seg
        assert -1 <= r2 <= 1.0 + 1e-12


def test_plateau_fit_batched_faster_than_host():
    x = _traces(n=64, t=10)
    plateau_fit_batched(x, max_num_drops=3)  # warm compile
    t0 = time.perf_counter()
    plateau_fit_batched(x, max_num_drops=3)
    t_b = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(x.shape[0]):
        _plateau_fit(list(x[i]), max_num_drops=3)
    t_h = time.perf_counter() - t0
    assert t_b < t_h, (t_b, t_h)


def test_all_plateau_fits_batched_matches_host():
    from fluorosequencingimageanalysis_tpu.inference.photometries import (
        _all_plateau_fits)
    from fluorosequencingimageanalysis_tpu.ops.plateau_batch import (
        all_plateau_fits_batched)
    x = _traces(n=10, t=7)
    batched = all_plateau_fits_batched(x, max_num_drops=2,
                                       storage_r_2_cutoff=0.7)
    for i in range(x.shape[0]):
        ref = _all_plateau_fits(list(x[i]), max_num_drops=2,
                                storage_r_2_cutoff=0.7)
        b = batched[i]
        assert len(ref) == len(b)
        for (rf, rr2, radj), (bf, br2, badj) in zip(ref, b):
            assert abs(rr2 - br2) < 1e-9 and abs(radj - badj) < 1e-9
            rflat = [(m, o) for p in rf for (m, o) in p]
            bflat = [(m, o) for p in bf for (m, o) in p]
            np.testing.assert_allclose(np.asarray(rflat), np.asarray(bflat))
