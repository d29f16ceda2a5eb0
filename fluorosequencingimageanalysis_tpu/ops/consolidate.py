"""Consolidation of competing PSF fits (quality-ranked non-max suppression).

Reference semantics (/root/reference/pflib.py:478-519): fitted PSFs whose
centers lie within ``consolidation_radius`` of each other compete, and only
the best-R^2 fit survives. The reference walks a Python-2 dict in hash order,
deleting inferior rivals as it goes — an order-dependent procedure whose
order (Py2 tuple-hash iteration) is unreproducible by construction. We use
the deterministic equivalent: greedy keep-best, i.e. process fits in
descending R^2 (raster tie-break) and keep one iff no already-kept fit lies
within the radius. For isolated rival pairs (the generic case, since spots
are sparse) this yields exactly the reference outcome; for chains it picks
one of the outcomes the reference could produce under some hash order.

Implemented as a lax.scan over the ranked list with a running kept-mask, so
it jits with static shapes; N here is the number of R^2-passing fits
(hundreds), not raw candidates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def consolidate(centers_h, centers_w, r2, valid, radius=4.0):
    """Greedy quality-ranked NMS.

    Arguments:
        centers_h, centers_w: (N,) fitted centers in image coordinates.
        r2: (N,) fit quality used for ranking.
        valid: (N,) bool; invalid entries never compete and are never kept.
        radius: rivals are pairs with Euclidean distance <= radius
            (the reference skips pairs with dist^2 > radius^2,
            pflib.py:505-506, so the boundary is inclusive).

    Returns:
        keep: (N,) bool mask of surviving fits.
    """
    n = r2.shape[0]
    # Rank by descending r2; break ties by raster order of the (rounded)
    # centers, then index, for determinism.
    neg_inf = jnp.array(-jnp.inf, r2.dtype)
    score = jnp.where(valid, r2, neg_inf)
    order = jnp.argsort(-score, stable=True)

    ch = centers_h[order]
    cw = centers_w[order]
    v = valid[order]
    r2_sq = jnp.asarray(radius, ch.dtype) ** 2

    def step(kept, i):
        d2 = (ch - ch[i]) ** 2 + (cw - cw[i]) ** 2
        rival = kept & (d2 <= r2_sq)
        keep_i = v[i] & ~jnp.any(rival)
        kept = kept.at[i].set(keep_i)
        return kept, keep_i

    kept0 = jnp.zeros((n,), dtype=bool)
    kept, _ = lax.scan(step, kept0, jnp.arange(n))
    # Undo the ordering permutation.
    inv = jnp.zeros((n,), dtype=order.dtype).at[order].set(jnp.arange(n))
    return kept[inv]
