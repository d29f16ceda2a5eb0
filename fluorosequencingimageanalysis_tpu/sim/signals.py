"""Random signal generation: single-peptide sampling and trie accumulation.

Parity: /root/reference/MCsimlib.py:863-1226. Note the reference's
``monte_carlo_trie`` depends on a C extension (``randsiggen``) that is NOT
present in its tree (its docstring admits the .c file is elsewhere,
MCsimlib.py:1981-1982), so it cannot actually run there; our version uses
the exact Python model and therefore works. The ``monte_carlo_dictionary``
family is deprecated in the reference and stays deprecated.
"""

from __future__ import annotations

import math
import random

from .proteome import _dp
from .trie import SignalTrie


def random_signal(peptide, p=1.0, b=0.0, u=0.0, windows={}):
    """Sample one sequence of luminosity drops for a peptide
    (MCsimlib.py:863-1074): dud removal (u), Edman delays (p), head/tail
    photobleaching (b), then windowing."""
    p, b, u = float(p), float(b), float(u)
    # Dud removal: each labeled acid dies with probability u ('x' marks a
    # dead fluor).
    for acid in windows:
        s_h = peptide[0].split(acid)
        s_t = peptide[1].split(acid)
        h_r = [acid if random.random() > u else "x"
               for _ in range(len(s_h) - 1)]
        t_r = [acid if random.random() > u else "x"
               for _ in range(len(s_t) - 1)]
        if len(s_h) > len(h_r):
            h_r += [""]
        elif len(s_h) < len(h_r):
            s_h += [""]
        if len(s_t) > len(t_r):
            t_r += [""]
        elif len(s_t) < len(t_r):
            s_t += [""]
        peptide = ("".join(x for pair in zip(s_h, h_r) for x in pair),
                   "".join(x for pair in zip(s_t, t_r) for x in pair))
    # Ideal cumulative gaps for live labeled head acids.
    gaps = tuple((index + 1, acid) for index, acid in enumerate(peptide[0])
                 if acid in windows)
    # Edman delays: inverse-CDF sample of the Bernoulli-delay distribution.
    modified_gaps = list(gaps)
    cumulative_e = 0
    for index, gap in enumerate(gaps):
        d = (gaps[index][0] - gaps[index - 1][0] if index > 0
             else gaps[index][0])
        random_point = random.random()
        e = 0
        accumulator = 0.0
        prior_accumulator = -1.0
        while accumulator - prior_accumulator > 0.0:
            prior_accumulator = accumulator
            accumulator += _dp(d, e, p)
            if accumulator >= random_point:
                break
            e += 1
        cumulative_e += e
        modified_gaps[index] = (gap[0] + cumulative_e, gap[1])
    # Head photobleaching: exposures strictly before the (delayed) drop.
    gaps = tuple(modified_gaps)
    for index, gap in enumerate(gaps):
        random_point = random.random()
        accumulator = 0.0
        exposures = sorted(set(
            [x for x in windows[gap[1]] if x < gap[0] - 1] +
            [x - 1 for x in windows[gap[1]] if x - 1 < gap[0] - 1]))
        for survival, position in enumerate(exposures):
            accumulator += math.e ** (-b * survival)
            if accumulator * (1 - math.e ** -b) >= random_point:
                modified_gaps[index] = (position + 1, gap[1])
                break
    # Tail photobleaching.
    tail_acids = [acid for acid in windows
                  for _ in range(peptide[1].count(acid))]
    for acid in tail_acids:
        random_point = random.random()
        accumulator = 0.0
        exposures = sorted(set(list(windows[acid]) +
                               [x - 1 for x in windows[acid]]))
        for survival, position in enumerate(exposures):
            accumulator += math.e ** (-b * survival)
            if accumulator * (1 - math.e ** -b) >= random_point:
                modified_gaps.append((position + 1, acid))
                break
    # Windowing: keep drops bounded by two exposures of their color.
    filtered_gaps = []
    for acid in windows:
        exposures = set(list(windows[acid]) +
                        [x - 1 for x in windows[acid]])
        filtered_gaps.extend([gap for gap in modified_gaps
                              if (gap[1] == acid and gap[0] in exposures and
                                  gap[0] - 1 in exposures)])
    return tuple(sorted(set(filtered_gaps), key=lambda g: g[0]))


def monte_carlo_trie(peptides, p, b, u, windows, sample_size=100,
                     random_seed=None, silent=True):
    """Sample sample_size signals per peptide into a SignalTrie
    (MCsimlib.py:1787-1849; the reference shells out to the missing
    randsiggen C extension — we run the exact Python model)."""
    return_trie = SignalTrie((None, None))
    if random_seed is not None:
        random.seed(random_seed)
    else:
        random.seed()
    for protein in peptides:
        for peptide in peptides[protein]:
            for _ in range(sample_size):
                signal = random_signal(peptide, p, b, u, windows)
                if signal:
                    return_trie.add_descendant(
                        sorted(signal, key=lambda x: x[0]), protein)
    return return_trie


def monte_carlo_trie_MP(peptides, p, b, u, windows, sample_size=1000,
                        alt_sample_sizes=None, child_count=None, silent=True):
    """Deprecated in the reference (MCsimlib.py:1851-1853)."""
    raise DeprecationWarning


def monte_carlo_dictionary(peptides, signals, p, b, u, windows,
                           sample_size=1000, result_queue=None,
                           child_number=0, silent=True):
    """Deprecated in the reference (MCsimlib.py:1076-1138)."""
    raise DeprecationWarning


def monte_carlo_dictionary_MP(peptides, signals, p, b, windows,
                              sample_size=1000, silent=True):
    """Deprecated in the reference (MCsimlib.py:1180-1187)."""
    raise DeprecationWarning
