"""Proteome preparation and the analytic Edman-delay model.

Parity: /root/reference/MCsimlib.py:42-861. The functions the reference
marks deprecated (raise DeprecationWarning at entry: discard,
truncate_heads, edman_failure_gaps(+_MP), perfect) keep that behavior.
"""

from __future__ import annotations

import math
import pickle


def _dp(d, e, p):
    """Bernoulli probability of e delays in a gap of length d, given Edman
    success p (MCsimlib.py:42-53)."""
    q = 1.0 - p
    return (math.factorial(d - 1 + e) /
            (math.factorial(e) * math.factorial(d - 1)) *
            p ** d * q ** e)


def load_proteome(filename, silent=True):
    """Unpickle {'PROTEIN': 'SEQUENCE'} (MCsimlib.py:55-86)."""
    with open(filename, "rb") as f:
        return pickle.load(f, encoding="latin1")


def homogenize(peptides, substitute_acid, target_acids):
    """Replace target acids with a substitute (MCsimlib.py:88-119).

    Parity note: the reference re-replaces from the ORIGINAL sequence each
    target acid iteration (only the last target acid's replacement
    survives) — reproduced exactly, bug and all.
    """
    return_peptides = {}
    for protein in peptides:
        sequence = peptides[protein]
        homogenized_sequence = sequence
        for acid in target_acids:
            homogenized_sequence = sequence.replace(acid, substitute_acid)
        return_peptides.setdefault(protein, homogenized_sequence)
    return return_peptides


def cleave(peptides, cleave_acid, silent=True):
    """Cleave after every cleave_acid (MCsimlib.py:121-190)."""
    return_peptides = {}
    for protein in peptides:
        if not peptides[protein]:
            continue
        subsequences = peptides[protein].split(cleave_acid)
        for index in range(len(subsequences) - 1):
            subsequences[index] += cleave_acid
        if subsequences[-1] == "":
            subsequences.pop()
        subsequences = [s for s in subsequences if s]
        if subsequences:
            return_peptides.setdefault(protein, tuple(subsequences))
    return return_peptides


def attach(peptides, attach_acid, silent=True):
    """Partition peptides into (head, tail) at the first attaching acid
    (MCsimlib.py:192-263). attach_acid='cterm' attaches everything by the
    carboxyl terminus (empty tails)."""
    return_peptides = {}
    if attach_acid == "cterm":
        for protein in peptides:
            for sequence in peptides[protein]:
                return_peptides.setdefault(protein, []).append((sequence, ""))
            return_peptides[protein] = tuple(return_peptides[protein])
        return return_peptides
    for protein in peptides:
        for sequence in peptides[protein]:
            if attach_acid in sequence:
                attach_point = sequence.find(attach_acid)
                return_peptides.setdefault(protein, [])
                return_peptides[protein].append((sequence[:attach_point],
                                                 sequence[attach_point:]))
        if protein in return_peptides:
            return_peptides[protein] = tuple(return_peptides[protein])
    return return_peptides


def homogenize_attached(peptides, substitute_acid, target_acids):
    """homogenize for attached (head, tail) pairs (MCsimlib.py:265-279)."""
    return_peptides = {}
    for protein, sequences in peptides.items():
        for head, tail in sequences:
            for acid in target_acids:
                head = head.replace(acid, substitute_acid)
                tail = tail.replace(acid, substitute_acid)
            return_peptides.setdefault(protein, []).append((head, tail))
    for protein, sequences in return_peptides.items():
        return_peptides[protein] = tuple(sequences)
    return return_peptides


def discard(peptides, label_acids, tot_range, silent=True):
    """Deprecated in the reference (MCsimlib.py:281-311)."""
    raise DeprecationWarning


def truncate_heads(peptides, max_edmans):
    """Deprecated in the reference (MCsimlib.py:345-372)."""
    raise DeprecationWarning


def edman_failure_gaps(peptides, label_acids, p, probability_threshold=0.1,
                       result_queue=None, child_number=0, silent=True):
    """Deprecated in the reference (MCsimlib.py:386-453)."""
    raise DeprecationWarning


def edman_failure_gaps_MP(peptides, label_acids, p, probability_threshold=0.1,
                          child_count=None, silent=True):
    """Deprecated in the reference (MCsimlib.py:585-596)."""
    raise DeprecationWarning


def _split_peptides_for_mp(peptides, child_count):
    """Partition proteins into child_count lists (MCsimlib.py:543-583)."""
    ppcb = len(peptides) // child_count
    ppcr = len(peptides) % child_count
    proteins = list(peptides.keys())
    out = [proteins[(ppcb + 1) * x:(ppcb + 1) * (x + 1)]
           for x in range(ppcr)]
    out += [proteins[ppcr * (ppcb + 1) + x * ppcb:
                     ppcr * (ppcb + 1) + (x + 1) * ppcb]
            for x in range(child_count - ppcr)]
    return out


def _exposures(position, windows):
    """Exposure counts per color before a position (MCsimlib.py:634-688)."""
    exposure_dictionary = {}
    for acid in windows:
        exposures = list(set(list(windows[acid]) +
                             [x - 1 for x in windows[acid]]))
        exposure_dictionary.setdefault(acid,
                                       sum(x < position for x in exposures))
    return exposure_dictionary


def window_filter(signals, windows):
    """Filter signals down to observable drops (MCsimlib.py:690-726)."""
    windowed_signals = []
    for signal in signals:
        filtered_gaps = []
        for acid in windows:
            exposures = set(list(windows[acid]) +
                            [x - 1 for x in windows[acid]])
            filtered_gaps.extend([gap for gap in signal
                                  if (gap[1] == acid and
                                      gap[0] in exposures and
                                      gap[0] - 1 in exposures)])
        filtered_gaps = sorted(set(filtered_gaps), key=lambda g: g[0])
        windowed_signals.append(tuple(filtered_gaps))
    return tuple(windowed_signals)


def perfect(signal_to_protein, b, windows, probability_threshold=0.01):
    """Deprecated in the reference (MCsimlib.py:728-779)."""
    raise DeprecationWarning
