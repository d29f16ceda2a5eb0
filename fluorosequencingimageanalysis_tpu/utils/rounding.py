"""Python-2 rounding (half away from zero).

The reference is Python 2, whose ``round`` rounds halves away from zero;
Python 3 rounds halves to even. Every place the pipeline rounds a
coordinate into a dict key (psfs dicts pflib.py:513-519, tracking bins
flexlibrary.py:741-760, CSV keys MCsimlib.py:2557-2560) must use this to
stay key-compatible with reference artifacts.
"""

from __future__ import annotations

import math


def py2_round(x):
    """round() with Python-2 semantics: halves away from zero."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def py2_round_device_i32(x):
    """Device (jax) Py2 rounding to int32, halves AWAY FROM ZERO.

    Computed via |x|: for |x| < 2^23, |x| - floor(|x|) is exact in f32
    (Sterbenz for |x| >= 1, identity below 1), so the >= 0.5 comparison
    reproduces the host float64 py2_round of the same float32 value
    bit-for-bit — including negative inputs, where the naive
    floor(x + 0.5) form would round half-cases toward +inf instead.
    The ONE device implementation: parallel/mesh.py and
    pipeline/fast_timetrace.py must round identically or spot keys
    diverge between the experiment and movie paths.
    """
    import jax.numpy as jnp

    ax = jnp.abs(x)
    f = jnp.floor(ax)
    r = f + (ax - f >= 0.5)
    return jnp.where(x < 0, -r, r).astype(jnp.int32)
