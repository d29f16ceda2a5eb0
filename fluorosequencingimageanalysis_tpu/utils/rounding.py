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
    """round() with Python-2 semantics: halves away from zero.

    Computed as an EXACT fraction comparison, not floor(x + 0.5): the
    addition form rounds a near-half double UP when x + 0.5 rounds to
    the next integer (floor(0.49999999999999994 + 0.5) == 1, while
    Python 2's correctly-rounded round() returns 0). |x| - floor(|x|)
    is exact in float64 below 2^52, so the >= 0.5 comparison decides
    every case, ties included, exactly like the Py2 builtin. The array
    (pipeline/tracking._py2_round_array), device
    (py2_round_device_i32), and native (tracklink.cpp py2round) forms
    use the same comparison so keys can never diverge between paths.
    """
    if x >= 0:
        f = math.floor(x)
        return int(f) + (1 if x - f >= 0.5 else 0)
    f = math.ceil(x)
    return int(f) - (1 if f - x >= 0.5 else 0)


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
