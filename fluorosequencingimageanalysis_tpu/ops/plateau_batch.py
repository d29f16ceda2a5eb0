"""Batched exhaustive plateau fitting (the v1 fluor-count fitter).

The reference fits every trace by brute force: for every drop-position
combination (``itertools.product(range(T), repeat=max_num_drops)``) it
builds per-segment means and keeps the best R^2 under an order-dependent
preference for fewer plateaus (MCsimlib.py:2597-2673; host port:
inference/photometries.py:_plateau_fit). That is O(T^d) numpy calls per
trace, per trace.

Here the heavy part runs once for ALL traces: the T^d product collapses to
the ~sum_k C(T-1, k) distinct segmentations, whose segment-mean fits and
R^2 scores for every trace are two einsums on device. The reference's
sequential selection rule (including its revisit order and the
``delta_r_2`` asymmetry for larger fits) is then replayed exactly, but
vectorized across traces — T^d scalar steps each updating (N,) arrays.

Output is bit-compatible with _plateau_fit per trace.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _segmentations(T, max_num_drops):
    """(combo_table, product_combo_ids):

    combo_table: list of tuples of plateau start indices (0 always first);
    product_combo_ids: for each tuple of itertools.product(range(T), d),
        the index into combo_table of its deduped segmentation.
    """
    table = {}
    order = []
    ids = []
    for drops in itertools.product(range(T), repeat=max_num_drops):
        starts = tuple(sorted(set(drops) | {0}))
        if starts not in table:
            table[starts] = len(order)
            order.append(starts)
        ids.append(table[starts])
    return order, np.asarray(ids, dtype=np.int32)


@functools.partial(jax.jit, static_argnames=("T", "max_num_drops"))
def _scores_all_combos(x, T, max_num_drops):
    """Segment-mean fits + R^2 for every trace x every segmentation.

    x: (N, T). Returns (r2 (N, C), seg_means (N, C, T) as the fit values,
    n_segs (C,), downstep_ok (N, C)).
    """
    combos, _ = _segmentations(T, max_num_drops)
    C = len(combos)
    # seg_id[c, t]: which segment frame t belongs to in combo c.
    seg_id = np.zeros((C, T), dtype=np.int32)
    n_segs = np.zeros((C,), dtype=np.int32)
    for c, starts in enumerate(combos):
        bounds = list(starts) + [T]
        for s in range(len(starts)):
            seg_id[c, bounds[s]:bounds[s + 1]] = s
        n_segs[c] = len(starts)
    max_segs = int(seg_id.max()) + 1
    # membership[c, t, s] one-hot; averaging matrix A[c, t, u].
    x = jnp.asarray(x)
    member = (seg_id[:, :, None] ==
              np.arange(max_segs)[None, None, :]).astype(x.dtype)
    seg_len = member.sum(axis=1)                                # (C, S)
    avg = member / np.maximum(seg_len, 1.0)[:, None, :]         # (C, T, S)
    member_j = jnp.asarray(member)
    avg_j = jnp.asarray(avg)
    # per-trace per-combo segment means: (N, C, S)
    seg_mean = jnp.einsum("nt,cts->ncs", x, avg_j)
    # fit values back on the frame grid: (N, C, T)
    fit = jnp.einsum("ncs,cts->nct", seg_mean, member_j)
    res = jnp.sum((x[:, None, :] - fit) ** 2, axis=-1)          # (N, C)
    tot = jnp.sum((x - jnp.mean(x, axis=1, keepdims=True)) ** 2,
                  axis=1)                                       # (N,)
    r2 = 1.0 - res / tot[:, None]
    # downstep check on adjacent segment means (only real segments count):
    real = jnp.asarray((np.arange(max_segs)[None, :, None] + 1 <
                        n_segs[None, None, :]).astype(bool))    # (1,S-1?,C)
    up = seg_mean[:, :, :-1] < seg_mean[:, :, 1:]               # (N, C, S-1)
    pair_real = jnp.asarray(
        (np.arange(max_segs - 1)[None, :] < (n_segs - 1)[:, None])
        .astype(bool))                                          # (C, S-1)
    downstep_ok = ~jnp.any(up & pair_real[None, :, :], axis=-1)
    del real
    return r2, fit, jnp.asarray(n_segs), downstep_ok


def plateau_fit_batched(intensities, max_num_drops,
                        include_original_intensities=False,
                        downsteps_only=False, use_adjusted_r_2=False,
                        delta_r_2=0.05, original_intensities_only=True):
    """Batched _plateau_fit over an (N, T) intensity array.

    Returns a list of N ``(best_fit, best_r_2)`` tuples identical to
    inference.photometries._plateau_fit on each row (same output format
    switches, same order-dependent selection).
    """
    if include_original_intensities and original_intensities_only:
        raise Exception
    x = np.asarray(intensities, dtype=np.float64)
    N, T = x.shape
    combos, product_ids = _segmentations(T, max_num_drops)
    r2, fit, n_segs, downstep_ok = _scores_all_combos(
        jnp.asarray(x), T, max_num_drops)
    r2 = np.asarray(r2, dtype=np.float64)
    n_segs = np.asarray(n_segs)
    downstep_ok = np.asarray(downstep_ok)

    score = r2
    if use_adjusted_r_2:
        k = 2.0 * n_segs - 1.0
        with np.errstate(divide="ignore", invalid="ignore"):
            score = 1.0 - (1.0 - r2) * (T - 1.0) / (T - k - 1.0)[None, :]

    valid = ~np.isnan(score)
    if downsteps_only:
        valid = valid & downstep_ok

    # Replay the reference's sequential selection, vectorized over traces.
    best_id = np.full(N, -1, dtype=np.int64)
    best_len = np.zeros(N, dtype=np.int64)
    best_score = np.full(N, -1.0)
    # Revisited combos MUST be replayed: once the best moves to a larger
    # fit, a previously-losing smaller combo becomes eligible again through
    # the plain > rule (the reference iterates the raw product sequence).
    for cid in product_ids:
        cid = int(cid)
        s = score[:, cid]
        v = valid[:, cid]
        none = best_id < 0
        le = n_segs[cid] <= best_len
        upd = v & ((none | le) & (s > best_score) |
                   (~none & ~le) & (s > best_score + delta_r_2))
        best_id = np.where(upd, cid, best_id)
        best_len = np.where(upd, n_segs[cid], best_len)
        best_score = np.where(upd, s, best_score)

    out = []
    for i in range(N):
        row = x[i]
        if len(set(row.tolist())) == 1:
            # Reference typo parity (MCsimlib.py:2604 assigns a dead
            # `best_adjusted_r2`): under use_adjusted_r_2 a uniform trace
            # reports r_2 == -1, not 1.0.
            best_fit = [[v for v in row.tolist()]]
            br = -1 if use_adjusted_r_2 else 1.0
        elif best_id[i] < 0:
            out.append((None, -1))
            continue
        else:
            starts = combos[best_id[i]]
            bounds = list(starts) + [T]
            plateaus = [row[bounds[s]:bounds[s + 1]].tolist()
                        for s in range(len(starts))]
            best_fit = [[float(np.mean(p))] * len(p) for p in plateaus]
            br = float(best_score[i])
        if include_original_intensities:
            j = 0
            formatted = []
            for plateau in best_fit:
                formatted.append([])
                for v in plateau:
                    formatted[-1].append((v, row[j]))
                    j += 1
            best_fit = formatted
        elif original_intensities_only:
            j = 0
            formatted = []
            for plateau in best_fit:
                formatted.append([])
                for v in plateau:
                    formatted[-1].append(row[j])
                    j += 1
            best_fit = formatted
        out.append((best_fit, br))
    return out


def all_plateau_fits_batched(intensities, max_num_drops,
                             storage_r_2_cutoff=0.7):
    """Batched _all_plateau_fits over an (N, T) array
    (MCsimlib.py:2676-2720; host port inference/photometries.py).

    Scores every segmentation for every trace on device once, then emits —
    in the reference's raw product order, duplicates included — every fit
    whose R^2 clears the cutoff, in the reference's
    ``(fit_with_originals, r_2, adj_r_2)`` tuple format.
    """
    x = np.asarray(intensities, dtype=np.float64)
    N, T = x.shape
    combos, product_ids = _segmentations(T, max_num_drops)
    r2, _, n_segs, _ = _scores_all_combos(jnp.asarray(x), T, max_num_drops)
    r2 = np.asarray(r2, dtype=np.float64)
    n_segs = np.asarray(n_segs)
    k = 2.0 * n_segs - 1.0
    with np.errstate(divide="ignore", invalid="ignore"):
        adj = 1.0 - (1.0 - r2) * (T - 1.0) / (T - k - 1.0)[None, :]

    out = []
    for i in range(N):
        row = x[i]
        if len(set(row.tolist())) == 1:
            out.append([(tuple([[(v, v) for v in row.tolist()]]), 1.0, 1.0)])
            continue
        fits = []
        means_cache = {}
        for cid in product_ids:
            cid = int(cid)
            if r2[i, cid] < storage_r_2_cutoff:
                continue
            if cid not in means_cache:
                starts = combos[cid]
                bounds = list(starts) + [T]
                formatted = []
                j = 0
                for s in range(len(starts)):
                    seg = row[bounds[s]:bounds[s + 1]]
                    m = float(np.mean(seg))
                    formatted.append([(m, row[j + t])
                                      for t in range(len(seg))])
                    j += len(seg)
                means_cache[cid] = tuple(formatted)
            fits.append((means_cache[cid], float(r2[i, cid]),
                         float(adj[i, cid])))
        out.append(fits)
    return out
