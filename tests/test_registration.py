"""Golden tests: XLA phase correlation vs NumPy oracle + known shifts."""

import numpy as np
import pytest

from fluorosequencingimageanalysis_tpu.ops.registration import (
    phase_correlate, phase_correlate_stack)

from oracles import phase_correlate_oracle, fourier_shift


def _field(rng, shape=(128, 128)):
    img = rng.normal(500, 20, shape)
    for _ in range(10):
        h, w = rng.integers(10, shape[0] - 10, 2)
        hh, ww = np.indices(shape).astype(float)
        img += rng.uniform(1000, 3000) * np.exp(
            -(((hh - h) ** 2) + ((ww - w) ** 2)) / (2 * 1.3 ** 2))
    return img


def test_integer_shift_matches_oracle_and_truth():
    rng = np.random.default_rng(0)
    ref = _field(rng)
    for dh, dw in [(0, 0), (3, -2), (-5, 7), (10, 10)]:
        # roll moves content by +d; the registering shift is -d.
        reg = np.roll(np.roll(ref, dh, axis=0), dw, axis=1)
        r, c, e, p = phase_correlate(ref, reg, upsample_factor=1)
        ro, co, eo, po = phase_correlate_oracle(ref, reg, 1)
        assert (r, c) == (ro, co) == (-dh, -dw)
        np.testing.assert_allclose(e, eo, atol=1e-6)
        np.testing.assert_allclose(p, po, atol=1e-6)


@pytest.mark.parametrize("upsample", [10, 20])
def test_subpixel_shift_matches_oracle_and_truth(upsample):
    rng = np.random.default_rng(1)
    ref = _field(rng)
    for dh, dw in [(1.25, -0.6), (-2.15, 3.85), (0.05, 0.0)]:
        reg = fourier_shift(ref, -dh, -dw)  # shifting ref by -d => reg needs +d
        r, c, e, p = phase_correlate(ref, reg, upsample_factor=upsample)
        ro, co, eo, po = phase_correlate_oracle(ref, reg, upsample)
        np.testing.assert_allclose([r, c], [ro, co], atol=1e-9)
        assert abs(r - dh) <= 1.0 / upsample + 1e-9
        assert abs(c - dw) <= 1.0 / upsample + 1e-9
        np.testing.assert_allclose(e, eo, atol=1e-6)
        np.testing.assert_allclose(p, po, atol=1e-6)


def test_stack_registration():
    rng = np.random.default_rng(2)
    ref = _field(rng)
    shifts = [(0.0, 0.0), (1.3, -0.4), (-0.7, 2.1), (0.45, 0.45)]
    frames = []
    total_h = total_w = 0.0
    for dh, dw in shifts:
        total_h += dh
        total_w += dw
        frames.append(fourier_shift(ref, -total_h, -total_w))
    stack = np.stack(frames)
    r, c, e, p = phase_correlate_stack(stack, upsample_factor=20)
    r, c = np.asarray(r), np.asarray(c)
    assert r[0] == 0 and c[0] == 0
    for i, (dh, dw) in enumerate(shifts):
        if i == 0:
            continue
        assert abs(r[i] - dh) <= 0.05 + 1e-9, (i, r[i], dh)
        assert abs(c[i] - dw) <= 0.05 + 1e-9, (i, c[i], dw)
