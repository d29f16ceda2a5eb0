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
    # Both backends now canonicalize tie order at equal positions
    # lexicographically (sim/signals.py random_signal); the sort here is
    # belt-and-braces so this distribution check never depends on it.
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


def test_trackcsv_edge_cases_abort_to_python(tmp_path):
    """Review findings r3: inputs the native parser cannot reproduce must
    ABORT (None -> Python fallback), never silently diverge or crash."""
    from fluorosequencingimageanalysis_tpu.native import trackcsv as tc
    from fluorosequencingimageanalysis_tpu.inference.photometries import (
        read_track_photometries_csv)
    if not tc.have_native():
        pytest.skip("native trackcsv did not build")
    header = "CHANNEL,FIELD,H,W,CATEGORY,FRAME 0,FRAME 1\n"
    row = 'ch1,0,10,20,"(True, False)",100,50\n'

    # Blank interior line: native aborts; Python (like the reference's
    # unpack) raises.
    p = tmp_path / "blank.csv"
    p.write_text(header + row + "\n" + row)
    assert tc.parse_track_csv_native(str(p)) is None
    with pytest.raises(Exception):
        read_track_photometries_csv(str(p), use_native=False)

    # Hex-float cell: Python float() rejects it; the native strtod must
    # not quietly parse 0x10 as 16.
    p = tmp_path / "hex.csv"
    p.write_text(header + row.replace("ch1,0", "ch1,0x10"))
    assert tc.parse_track_csv_native(str(p)) is None
    with pytest.raises(ValueError):
        read_track_photometries_csv(str(p), use_native=False)

    # Zero frame columns (5-column file): VALID for the Python reader
    # (empty frame tuples) — native aborts rather than dropping rows.
    p = tmp_path / "zerof.csv"
    p.write_text("CHANNEL,FIELD,H,W,CATEGORY\nch1,0,10,20,()\n")
    assert tc.parse_track_csv_native(str(p)) is None
    d, d2 = read_track_photometries_csv(str(p), use_native=True)
    assert len(d2) == 1  # fell back to Python and kept the row

    # head_truncate eating every frame column: both paths agree (empty
    # tuples) and the native binding must not crash on NULL data
    # pointers.
    p = tmp_path / "trunc.csv"
    p.write_text(header + row + row.replace(",10,", ",11,"))
    dn, dn2 = read_track_photometries_csv(str(p), use_native=True,
                                          head_truncate=5)
    dp, dp2 = read_track_photometries_csv(str(p), use_native=False,
                                          head_truncate=5)
    assert dn == dp and dn2 == dp2
    arrs = tc.read_track_photometries_arrays(str(p), head_truncate=5)
    assert arrs is not None and arrs["intensities"].shape == (2, 0)

    # downstep filter on truncated-to-empty categories: Python raises
    # IndexError; native must abort, not silently filter.
    assert tc.parse_track_csv_native(str(p), downstep_filtered=True,
                                     head_truncate=5) is None
    with pytest.raises(IndexError):
        read_track_photometries_csv(str(p), use_native=False,
                                    downstep_filtered=True, head_truncate=5)


def test_random_signal_tie_order_is_canonical():
    """Same-cycle multi-color drops sort by (position, acid) in BOTH the
    Python model and the native sampler (review finding r3: the
    reference's position-only sort leaves tie order to set iteration —
    hash-randomized, irreproducible; DESIGN section 13 class)."""
    import random as _random
    from fluorosequencingimageanalysis_tpu.sim.signals import random_signal

    windows = {"A": tuple(range(1, 7)), "C": tuple(range(1, 7))}
    _random.seed(5)
    seen_tied = 0
    for _ in range(2000):
        sig = random_signal(("ACAC", "AC"), 0.9, 0.05, 0.0, windows)
        for (p1, a1), (p2, a2) in zip(sig, sig[1:]):
            assert (p1, a1) <= (p2, a2), sig
            seen_tied += p1 == p2
    assert seen_tied > 0, "test never exercised a same-position tie"


def test_edman_delay_underflow_matches_python():
    """CDF-exhaustion path: native must reproduce the Python model's
    one-step-late stall detection (returns e+1, not e)."""
    from fluorosequencingimageanalysis_tpu.native import randsiggen as rs
    from fluorosequencingimageanalysis_tpu.sim import signals as sig
    import random as _random

    # p so small that p**d underflows to 0.0: Python returns 1 always.
    _random.seed(0)
    assert sig._sample_edman_delay(400, 1e-2) == 1  # 1e-800 -> 0.0
    if not rs.have_native():
        pytest.skip("native randsiggen did not build")
    # Drive the native sampler where the head gap forces the underflow:
    # peptide head with the labeled acid at position 400.
    head = "G" * 399 + "A"
    windows = {"A": tuple(range(1, 500))}
    sigs = rs.random_signal_batch((head, ""), 1e-2, 1e-9, 0.0, windows,
                                  batch_size=64, seed=3)
    # Every signal must place the drop at position 401 (= 400 ideal + 1
    # underflow-stall delay), never 400.
    for s in sigs:
        for pos, acid in s:
            assert pos == 401, s
