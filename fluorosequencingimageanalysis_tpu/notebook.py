"""Notebook/diagnostic helpers (the reference's jupyter_development).

Parity: /root/reference/jupyter_development.py — the functions the CLI apps
and diagnostics rely on: ON/OFF grabbing and per-image adjustment, signal/
sequence converters, and simple statistics.
"""

from __future__ import annotations

import itertools
import math
from random import choice

import numpy as np


def _pairwise(iterable):
    a, b = itertools.tee(iterable)
    next(b, None)
    return zip(a, b)


def grab_ON_OFFS(all_fit_info, allow_bad_fits=False, alpha_adjust=None):
    """Per-(cycle, field) ON intensities at ON->OFF transitions with the
    number of fluors dropped (jupyter_development.py:63-84).

    Parity note: the reference's alpha_adjust branches are inverted (it
    subtracts only when alpha_adjust is None, which would TypeError);
    callers pass alpha_adjust=0 so the working branch appends raw iON —
    reproduced exactly.
    """
    on_offs = {}
    for (channel, field, h, w, row, category, intensities, signal, is_zero,
         dye_sequence, lmii, total_score, per_frame_scores,
         starting_intensity) in all_fit_info:
        if not allow_bad_fits and dye_sequence is None:
            continue
        for i, (iON, iOFF) in enumerate(_pairwise(intensities)):
            if category[i] and not category[i + 1]:
                if not allow_bad_fits:
                    if alpha_adjust is not None:
                        on_offs.setdefault((i, field), []).append(
                            (iON, dye_sequence[i] - dye_sequence[i + 1]))
                    else:
                        on_offs.setdefault((i, field), []).append(
                            (iON - alpha_adjust,
                             dye_sequence[i] - dye_sequence[i + 1]))
                else:
                    if alpha_adjust is not None:
                        on_offs.setdefault((i, field), []).append(
                            (iON - alpha_adjust, None))
                    else:
                        on_offs.setdefault((i, field), []).append(
                            (iON, None))
    return {(cycle, field): tuple(drops)
            for (cycle, field), drops in on_offs.items()}


def ON_OFF_adjust_photometries(photometries, ON_OFFS, alpha):
    """Per-(cycle, field) multiplicative intensity normalization
    (jupyter_development.py:262-276)."""
    adjusted = {}
    last_beta_dict = {(cycle, field): np.median([iON for iON, d in drops])
                      for (cycle, field), drops in ON_OFFS.items()}
    last_beta_median = float(np.median(list(last_beta_dict.values())))
    for channel, cdict in photometries.items():
        for field, fdict in cdict.items():
            for (h, w), (category, intensities, row) in fdict.items():
                adjusted_intensities = [
                    (intensity - alpha) * last_beta_median /
                    last_beta_dict[(i, field)]
                    if (i < len(intensities) - 1 and
                        (i, field) in last_beta_dict)
                    else intensity
                    for i, intensity in enumerate(intensities)]
                adjusted.setdefault(channel, {}).setdefault(
                    field, {}).setdefault(
                    (h, w), (category, tuple(adjusted_intensities), row))
    return adjusted


def signal_to_sequence(signal, num_frames, starting_intensity=None):
    """(jupyter_development.py:189-202)"""
    intensity = (len(signal) if starting_intensity is None
                 else starting_intensity)
    drop_positions = set(pos for aa, pos in signal)
    drop_counts = {pos: len([p for aa, p in signal if p == pos])
                   for pos in drop_positions}
    seq = []
    for frame in range(num_frames):
        if frame in drop_positions:
            intensity -= drop_counts[frame]
        seq.append(intensity)
    return tuple(seq)


def sequence_to_signal(seq):
    """(jupyter_development.py:204-213)"""
    signal_TFn = [seq[f] - fc for f, fc in enumerate(seq[1:])]
    signal = []
    for i, tf in enumerate(signal_TFn):
        if tf > 0:
            signal += [("A", i + 1)] * tf
        elif tf < 0:
            signal = None
            break
    return tuple(signal) if signal is not None else None


def sequence_to_category(seq):
    return tuple(s > 0 for s in seq)


def r_squared(data, fit):
    data, fit = np.array(data), np.array(fit)
    res = float(np.sum((data - fit) ** 2))
    tot = float(np.sum((data - np.mean(data)) ** 2))
    return 1.0 - res / tot


def make_histx(bins):
    return [np.mean([x1, x2]) for x1, x2 in _pairwise(tuple(bins))]


def fast_mode(array):
    from scipy.stats import find_repeats
    array = np.asarray(array)
    values, counts = find_repeats(array)
    if len(counts) == 0:
        array = np.sort(array)
        return array[0], 1.0
    position = counts.argmax()
    return values[position], counts[position]


def qq(sample1, sample2, num_quantiles=101):
    s1, s2 = sorted(sample1), sorted(sample2)
    quantiles = np.linspace(0, 100, num_quantiles)
    return tuple((np.percentile(s1, q), np.percentile(s2, q))
                 for q in quantiles)


def generate_intensities(fluorosequence, beta, beta_sigma, number,
                         quench_factors=None):
    if quench_factors is None:
        quench_factors = [0.0] * len(fluorosequence)
    category = tuple(seq != 0 for seq in fluorosequence)
    intensities = [np.random.lognormal(
        mean=math.log(beta) + math.log(seq) - quench_factors[seq - 1],
        sigma=beta_sigma, size=number)
        if seq > 0 else [0.0] * number
        for seq in fluorosequence]
    return category, tuple(zip(*intensities))


def generate_sequences(max_possible, num_cycles, num_samples, category):
    return tuple(zip(*[[choice(range(1, max_possible + 1))
                        for _ in range(num_samples)]
                       if category[cycle] else [0] * num_samples
                       for cycle in range(num_cycles)]))


def split_heatmap(num_cycles, cycle):
    """(jupyter_development.py:227-248)"""
    all_SD = [(("A", c),) for c in range(1, num_cycles + 1)]
    all_DD = [(("A", b), ("A", c))
              for c in range(1, num_cycles + 1) for b in range(1, c)]
    before = ([(((aa, c),), True, 1) for ((aa, c),) in all_SD if c < cycle] +
              [(((a1, b), (a2, c)), True, 2)
               for ((a1, b), (a2, c)) in all_DD if c < cycle])
    after = ([(((aa, c),), True, 1) for ((aa, c),) in all_SD if c >= cycle] +
             [(((a1, b), (a2, c)), True, 2)
              for ((a1, b), (a2, c)) in all_DD if c >= cycle])
    return tuple(before), tuple(after)


def unwind_photometries(photometries):
    for channel, cdict in photometries.items():
        for field, fdict in cdict.items():
            for (h, w), (category, intensities, row) in fdict.items():
                yield (channel, field, h, w, category, intensities, row)


def diff_signals(signals_a, signals_b):
    """Counts difference a - b per signal key
    (jupyter_development.py:1319+)."""
    keys = set(signals_a) | set(signals_b)
    return {k: signals_a.get(k, 0) - signals_b.get(k, 0) for k in keys}


def fasta_to_dict(fasta_path):
    """Parse a FASTA file to {name: sequence}
    (jupyter_development.py:1262+)."""
    out = {}
    name = None
    seq_parts = []
    with open(fasta_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    out[name] = "".join(seq_parts)
                name = line[1:].split()[0]
                seq_parts = []
            else:
                seq_parts.append(line)
    if name is not None:
        out[name] = "".join(seq_parts)
    return out


def match_diagnostic(fit_info, simulated_signals, num_frames=None):
    """Compare fitted signals against simulated ground truth.

    Spiritual parity with jupyter_development.match_diagnostic
    (jupyter_development.py:786): returns per-trace matches between the
    fitted signal and the ground-truth signal, plus aggregate accuracy.
    """
    matches = []
    for info in fit_info:
        signal = info[7]
        truth = info[-1] if num_frames is None else None
        matches.append((signal, truth, signal == truth))
    n_match = sum(1 for s, t, m in matches if m)
    return matches, (float(n_match) / len(matches) if matches else 0.0)
