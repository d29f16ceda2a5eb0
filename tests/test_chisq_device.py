"""Device-batched Kerssemakers engine (ops/chisq_batch_device) vs the
bit-exact host oracle (stepfitting.chi_squared_step_fitter, the reference
port of stepfitting_library.py:342-505).

The device engine computes the same chain with fp-rounded range means in
float64 — equal in exact arithmetic, near-tie-divergent in principle; the
sweeps here require EXACT plateau agreement trace-for-trace on noisy and
quantized workloads (measured 100% in development) so any structural
regression is loud."""

import numpy as np
import pytest

from fluorosequencingimageanalysis_tpu import stepfitting as sf
from fluorosequencingimageanalysis_tpu.ops.chisq_batch_device import (
    chi_squared_fit_device)


def _make_traces(rng, n, T, quantize=False):
    traces = np.zeros((n, T))
    for i in range(n):
        nsteps = int(rng.integers(0, min(5, T // 5)))
        drops = np.sort(rng.choice(np.arange(2, T - 2), nsteps,
                                   replace=False))
        lvl = float(nsteps + 1)
        tr = np.full(T, lvl)
        for d in drops:
            lvl -= 1.0
            tr[d:] = lvl
        tr = tr * 2000 + rng.normal(0, 400, T)
        if quantize:
            q = float(rng.choice([250.0, 500.0, 1000.0]))
            tr = np.round(tr / q) * q
        traces[i] = tr
    return traces


def _assert_equal_fits(dev, oracle, ctx):
    assert len(dev) == len(oracle), ctx
    for a, b in zip(dev, oracle):
        assert a[0] == b[0] and a[1] == b[1], (ctx, a, b)
        assert abs(a[2] - b[2]) < 1e-9, (ctx, a, b)


def test_device_engine_matches_oracle_randomized():
    rng = np.random.default_rng(1)
    for trial in range(6):
        T = int(rng.integers(16, 64))
        n = int(rng.integers(3, 8))
        traces = _make_traces(rng, n, T, quantize=bool(trial % 2))
        kwargs = dict(
            num_steps=int(rng.integers(2, min(9, T - 2))),
            min_step_length=int(rng.integers(0, 4)),
            min_step_magnitude=float(rng.choice([0.0, 300.0, 900.0])),
            ignore_counterfits=bool(rng.integers(0, 2)))
        dev = chi_squared_fit_device(traces, **kwargs)
        for i in range(n):
            oracle = sf.chi_squared_step_fitter(
                tuple(float(v) for v in traces[i]), **kwargs)
            _assert_equal_fits(dev[i], oracle, (trial, i, kwargs))


def test_device_engine_flat_trace_and_validation():
    # Flat trace: best fit never grows; S hits the bf_res == 0 -> 1e10
    # branch; result is the single whole-trace plateau.
    flat = np.full((1, 20), 3000.0)
    out = chi_squared_fit_device(flat, num_steps=4)
    oracle = sf.chi_squared_step_fitter(tuple(flat[0]), num_steps=4)
    _assert_equal_fits(out[0], oracle, "flat")

    with pytest.raises(ValueError, match="num_steps"):
        chi_squared_fit_device(flat, num_steps=19)  # > T - 2
    assert chi_squared_fit_device(np.zeros((0, 10)), num_steps=2) == []


def test_batch_api_device_engine_and_probe_routing(monkeypatch):
    """chi_squared_fit_batch(engine=...): 'device' routes to the jitted
    program; None consults utils/probes.chisq_engine (native on CPU)."""
    from fluorosequencingimageanalysis_tpu.utils import probes

    rng = np.random.default_rng(3)
    traces = _make_traces(rng, 4, 40)
    native = sf.chi_squared_fit_batch(traces, num_steps=6, engine="native")
    device = sf.chi_squared_fit_batch(traces, num_steps=6, engine="device")
    for a, b in zip(native, device):
        _assert_equal_fits(b, a, "engines")
    assert probes.chisq_engine() == "native"  # CPU: the native core's home

    calls = []
    monkeypatch.setattr(probes, "chisq_engine",
                        lambda: calls.append(1) or "native")
    out = sf.chi_squared_fit_batch(traces, num_steps=6)
    assert calls and len(out) == 4
