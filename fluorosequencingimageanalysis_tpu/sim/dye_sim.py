"""Vectorized Monte-Carlo dye simulation (the TPU-native randsiggen).

The reference simulates one molecule at a time in a Python event loop
(peptide_simulator.py:190-319) fanned out over a Pool, and its docstring
references a C generator (randsiggen.c) that is absent from the tree
(MCsimlib.py:1981-1982). Here the whole molecule population advances in
lockstep: state is [num_sims, seq_len] dye-aliveness plus a [num_sims]
cleaved-prefix counter, and each cycle is one masked update inside a
lax.scan. 1e6 molecules x 20 cycles is a few ms on one chip.

Event order per cycle matches the reference's action list
(peptide_simulator.py:251-277): initial [dud, tirf, count]; then per cycle
[mock|edman, strip, tirf, count].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=(
    "num_mocks", "num_edmans", "num_sims", "seq_len"))
def _simulate_batch(key, labeled, num_mocks, num_edmans, num_sims, seq_len,
                    p, per_cycle_b, u, s, sc, s2):
    """Core batched simulation.

    labeled: (seq_len,) bool — which positions carry a dye.
    Returns counts (num_sims, num_cycles + 1) int32 where counts[:, 0] is
    the initial post-dud/post-tirf count.
    """
    num_cycles = num_mocks + num_edmans
    k_dud, k_tirf0, k_cycle = jax.random.split(key, 3)

    # Dud removal (peptide_simulator.py:102-120): initial per-dye Bernoulli.
    alive = labeled[None, :] & (
        jax.random.uniform(k_dud, (num_sims, seq_len)) >= u)
    # Initial tirf exposure.
    alive = alive & (jax.random.uniform(k_tirf0, (num_sims, seq_len))
                     <= per_cycle_b)
    removed = jnp.zeros((num_sims,), jnp.int32)  # cleaved-prefix length

    def count_dyes(alive, removed):
        pos = jnp.arange(seq_len)[None, :]
        present = alive & (pos >= removed[:, None])
        return jnp.sum(present, axis=-1).astype(jnp.int32)

    counts0 = count_dyes(alive, removed)

    def cycle_step(carry, inputs):
        alive, removed = carry
        cycle_idx, key = inputs  # cycle_idx 0-based
        k_edman, k_strip, k_tirf = jax.random.split(key, 3)
        is_edman = cycle_idx >= num_mocks
        # Edman (only during edman cycles): success w.p. p removes the
        # N-terminal residue (whether labeled or not).
        success = jax.random.uniform(k_edman, (num_sims,)) < p
        removed = jnp.where(is_edman & success & (removed < seq_len),
                            removed + 1, removed)
        # Strip: whole-molecule dye loss w.p. s (s2 after cycle sc). The
        # reference compares the CURRENT cycle_number (1-based during
        # cycle blocks) to sc (peptide_simulator.py:148-169).
        cycle_number = cycle_idx + 1
        using_s = jnp.where(cycle_number <= sc, s, s2)
        stripped = jax.random.uniform(k_strip, (num_sims,)) < using_s
        alive = alive & ~stripped[:, None]
        # Tirf: per-dye survival per exposure.
        alive = alive & (jax.random.uniform(k_tirf, (num_sims, seq_len))
                         <= per_cycle_b)
        return (alive, removed), count_dyes(alive, removed)

    keys = jax.random.split(k_cycle, num_cycles)
    (_, _), cycle_counts = jax.lax.scan(
        cycle_step, (alive, removed),
        (jnp.arange(num_cycles), keys))
    return jnp.concatenate([counts0[None, :], cycle_counts],
                           axis=0).T  # (num_sims, num_cycles + 1)


def simulate_dye_counts_batched(sequence, labels, num_mocks, num_edmans,
                                num_simulations, seed=0, **params):
    """Batched equivalent of sim.events.simulate_dye_counts for a single
    label color.

    Returns (counts (num_simulations, num_cycles + 1) int array, the label
    string used). Multi-color sequences run one call per label (colors are
    independent given the shared Edman/strip randomness is per-molecule;
    for exact multi-color joint statistics use the host simulator).
    """
    labels = set(labels)
    if len(labels) != 1:
        raise NotImplementedError(
            "batched path handles one label color; use "
            "sim.events.simulate_dye_counts for multi-color joints.")
    label = next(iter(labels))
    labeled = np.array([aa == label for aa in sequence], dtype=bool)
    p = float(params["p"])
    per_cycle_b = float(params.get("per_cycle_b",
                                   math.e ** -params["b"]))
    u = float(params["u"])
    s = float(params.get("s", 0.0))
    sc = int(params.get("sc", 0))
    s2 = float(params.get("s2", 0.0))
    counts = _simulate_batch(jax.random.PRNGKey(seed), jnp.asarray(labeled),
                             int(num_mocks), int(num_edmans),
                             int(num_simulations), len(sequence),
                             p, per_cycle_b, u, s, sc, s2)
    return np.asarray(counts), label


def simulate_photometries_batched(counts, beta, beta_sigma, seed=0,
                                  ddif=None):
    """Lognormal intensities for a (N, C) dye-count matrix in one pass.

    Equivalent of sim.events.simulate_photometries with number=1 for each
    molecule (no superdyes / distance-DDIF — those take the host path).
    """
    counts = np.asarray(counts)
    n, c = counts.shape
    key = jax.random.PRNGKey(seed)
    z = np.asarray(jax.random.normal(key, (n, c)))
    if ddif is None:
        ddif_arr = np.zeros(int(counts.max()) + 1)
    else:
        ddif_arr = np.asarray(ddif, dtype=float)
    safe = np.maximum(counts, 1)
    mean = (math.log(beta) + np.log(safe) -
            ddif_arr[np.minimum(safe - 1, len(ddif_arr) - 1)])
    out = np.exp(mean + beta_sigma * z)
    out[counts == 0] = 0.0
    return out
