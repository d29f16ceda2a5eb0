"""Tests for the native (C++) randsiggen batch signal sampler.

Validates the native sampler against the pure-Python model in
sim/signals.py (the exact port of MCsimlib.py:863-1074): exact equality in
the deterministic regime, distributional agreement in the stochastic one.
"""

import collections
import random

import numpy as np
import pytest

from fluorosequencingimageanalysis_tpu.native import (
    have_native, random_signal_batch, monte_carlo_trie_native)
from fluorosequencingimageanalysis_tpu.sim.signals import (
    random_signal, monte_carlo_trie)

pytestmark = pytest.mark.skipif(not have_native(),
                                reason="native randsiggen did not build")

WINDOWS = {"K": (1, 2, 3, 4), "C": (2, 4)}
PEPTIDE = ("AKCAK", "KC")


def test_deterministic_parity():
    # p=1, b=0, u=0: no randomness in the model — every sample must equal
    # the Python reference signal exactly.
    expected = random_signal(PEPTIDE, p=1.0, b=0.0, u=0.0, windows=WINDOWS)
    sigs = random_signal_batch(PEPTIDE, 1.0, 0.0, 0.0, WINDOWS,
                               batch_size=50, seed=7)
    assert all(s == expected for s in sigs)
    assert expected == ((2, "K"), (3, "C"))


def _distribution(signals):
    # Canonicalize tie order at equal positions: the Python model emits ties
    # in set-hash order (sim/signals.py:99 sorts by position only), the
    # native sampler lexicographically — same multiset either way.
    counts = collections.Counter(tuple(sorted(s)) for s in signals)
    total = sum(counts.values())
    return {k: v / total for k, v in counts.items()}


def test_distributional_agreement():
    n = 20000
    random.seed(123)
    py_sigs = [random_signal(PEPTIDE, p=0.9, b=0.07, u=0.1, windows=WINDOWS)
               for _ in range(n)]
    nat_sigs = random_signal_batch(PEPTIDE, 0.9, 0.07, 0.1, WINDOWS,
                                   batch_size=n, seed=99)
    p_dist = _distribution(py_sigs)
    n_dist = _distribution(nat_sigs)
    keys = set(p_dist) | set(n_dist)
    tvd = 0.5 * sum(abs(p_dist.get(k, 0.0) - n_dist.get(k, 0.0))
                    for k in keys)
    # Two independent 20k-sample draws of the same distribution over ~30
    # support points have TVD well under 0.03; a modeling bug shows as >0.1.
    assert tvd < 0.03, f"TVD {tvd:.4f} too large: distributions differ"


def test_edman_delay_marginal():
    # Single-fluor peptide isolates the Edman-delay marginal: drop position
    # of K at ideal position 2 under p=0.8 is 2+NegBinomial(d=2, p).
    windows = {"K": tuple(range(1, 9))}
    pep = ("AK", "")
    n = 30000
    random.seed(5)
    py_pos = [s[0][0] for s in
              (random_signal(pep, p=0.8, b=0.0, u=0.0, windows=windows)
               for _ in range(n)) if s]
    nat_pos = [s[0][0] for s in
               random_signal_batch(pep, 0.8, 0.0, 0.0, windows, n, seed=11)
               if s]
    for pos in (2, 3, 4):
        f_py = py_pos.count(pos) / len(py_pos)
        f_nat = nat_pos.count(pos) / len(nat_pos)
        assert abs(f_py - f_nat) < 0.015, (pos, f_py, f_nat)


def test_trie_parity_deterministic():
    peptides = {"P1": [PEPTIDE], "P2": [("CAK", "")]}
    t_py = monte_carlo_trie(peptides, 1.0, 0.0, 0.0, WINDOWS,
                            sample_size=10, random_seed=1)
    t_nat = monte_carlo_trie_native(peptides, 1.0, 0.0, 0.0, WINDOWS,
                                    sample_size=10, random_seed=1)
    u_py = t_py.find_uniques(None, 1)
    u_nat = t_nat.find_uniques(None, 1)
    assert sorted(u_py) == sorted(u_nat)
    for k in u_py:
        assert u_py[k][0] == u_nat[k][0]


def test_native_throughput_exceeds_python():
    import time
    n = 5000
    t0 = time.perf_counter()
    random_signal_batch(PEPTIDE, 0.9, 0.05, 0.1, WINDOWS, n, seed=3)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(500):
        random_signal(PEPTIDE, p=0.9, b=0.05, u=0.1, windows=WINDOWS)
    t_py_per = (time.perf_counter() - t0) / 500
    assert t_nat / n < t_py_per, "native sampler slower than Python"


def _write_track_csv(path, n_rows=200, n_frames=8, seed=0):
    import csv
    import random as _random
    rng = _random.Random(seed)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["CHANNEL", "FIELD", "H", "W", "CATEGORY"] +
                   [f"FRAME {i}" for i in range(n_frames)])
        for i in range(n_rows):
            cat = tuple(rng.random() < 0.5 for _ in range(n_frames))
            # .5-valued intensities exercise the Py2 rounding semantics
            w.writerow([f"ch{i % 3}", i % 5, (i * 13) % 512, (i * 29) % 512,
                        "(" + ", ".join(str(c) for c in cat) + ")"] +
                       [round(rng.uniform(0, 60000), 1)
                        for _ in range(n_frames)])
        w.writerow(["ch0", 1, "None", "None",
                    "(" + ", ".join(["True"] * n_frames) + ")"] +
                   [0] * n_frames)


def test_trackcsv_native_equals_python(tmp_path):
    from fluorosequencingimageanalysis_tpu.native import trackcsv as tc
    from fluorosequencingimageanalysis_tpu.inference.photometries import (
        read_track_photometries_csv)
    if not tc.have_native():
        pytest.skip("native trackcsv did not build")
    path = str(tmp_path / "tracks.csv")
    _write_track_csv(path)
    for kwargs in ({}, {"head_truncate": 2}, {"tail_truncate": 3},
                   {"downstep_filtered": True}, {"channels": ["ch1"]}):
        dn, dn2 = read_track_photometries_csv(path, use_native=True,
                                              **kwargs)
        dp, dp2 = read_track_photometries_csv(path, use_native=False,
                                              **kwargs)
        assert dn == dp, kwargs
        assert dn2 == dp2, kwargs


def test_trackcsv_arrays_api(tmp_path):
    from fluorosequencingimageanalysis_tpu.native.trackcsv import (
        read_track_photometries_arrays)
    from fluorosequencingimageanalysis_tpu.inference.photometries import (
        read_track_photometries_csv)
    path = str(tmp_path / "tracks.csv")
    _write_track_csv(path, n_rows=50, n_frames=6)
    arrs = read_track_photometries_arrays(path)
    if arrs is None:
        pytest.skip("native trackcsv did not build")
    d, d2 = read_track_photometries_csv(path, use_native=False)
    assert arrs["intensities"].shape == (50, 6)
    assert arrs["categories"].dtype == bool
    for i in range(50):
        r = int(arrs["rows"][i])
        channel, field, h, w, cat, frames = d2[r]
        assert channel == arrs["channels"][i]
        assert (field, h, w) == (int(arrs["fields"][i]),
                                 int(arrs["hs"][i]), int(arrs["ws"][i]))
        assert cat == tuple(arrs["categories"][i].tolist())
        assert frames == tuple(arrs["intensities"][i].tolist())


def test_py2_round_semantics():
    from fluorosequencingimageanalysis_tpu.inference.photometries import (
        _py2_round)
    # Python 2 round: half away from zero (the reference interpreter).
    assert _py2_round(2.5) == 3
    assert _py2_round(3.5) == 4
    assert _py2_round(-2.5) == -3
    assert _py2_round(2.4) == 2
