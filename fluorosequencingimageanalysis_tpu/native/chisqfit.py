"""ctypes binding for the batched Kerssemakers chi-squared step fitter
(chisqfit.cpp).

The reference's chi-squared fitter
(/root/reference/stepfitting_library.py:342-505) is sequential per trace
but embarrassingly parallel across traces; this core runs the exact
per-trace chain in C++ for a whole (N, T) batch, threaded. Per-trace
results are bit-equal to ``stepfitting.chi_squared_step_fitter`` (the
host oracle) — enforced in tests/test_stepfit_batch.py. Builds
``_chisqfit.so`` on first use (g++ -O3); ``have_native()`` gates the
fallback to the host loop.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ._build import NativeLib

_HERE = os.path.dirname(os.path.abspath(__file__))

_I32 = np.ctypeslib.ndpointer(np.int32, flags="C")
_F64 = np.ctypeslib.ndpointer(np.float64, flags="C")


def _prototypes(lib):
    fn = lib.cs_chisq_batch
    fn.restype = ctypes.c_int
    fn.argtypes = [
        _F64,                              # traces (N, T)
        ctypes.c_int32, ctypes.c_int32,    # N, T
        ctypes.c_int32, ctypes.c_int32,    # num_plateaus, min_step_length
        ctypes.c_double, ctypes.c_int32,   # min_step_magnitude, ignore_cf
        ctypes.c_int32,                    # n_threads
        _I32, _I32, _I32, _F64,            # out n/start/stop/height
    ]


_NATIVE = NativeLib(
    os.path.join(_HERE, "chisqfit.cpp"),
    os.path.join(_HERE, "_chisqfit.so"), _prototypes,
    # -ffp-contract=off: GCC at -O3 contracts a*b+c accumulations into
    # FMAs (verified: vfmadd emitted for the residual loops), whose
    # single-rounding results differ in the last ulp from the
    # Python float semantics this core promises bit-parity with —
    # near-tied comparisons could then diverge, machine-dependently.
    flag_sets=(["-O3", "-march=native", "-ffp-contract=off",
                "-pthread"],
               ["-O3", "-ffp-contract=off", "-pthread"],
               ["-O2", "-ffp-contract=off", "-pthread"]))


def _load():
    return _NATIVE.load()


def have_native() -> bool:
    return _load() is not None


def chisq_fit_batch_native(traces, num_plateaus, min_step_length,
                           min_step_magnitude, ignore_counterfits,
                           n_threads=None):
    """Run the chi-squared fitter over (N, T) traces in the native core.

    Returns (n, start, stop, height): per-trace plateau counts and the
    [N, T]-buffered plateau triples (row i's plateaus are
    (start[i, :n[i]], stop[i, :n[i]], height[i, :n[i]])).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native chisqfit unavailable (g++ build failed)")
    traces = np.ascontiguousarray(traces, dtype=np.float64)
    if traces.ndim != 2:
        raise ValueError("traces must be (N, T)")
    N, T = traces.shape
    if T < 2:
        raise ValueError("chi-squared fitting needs at least 2 frames")
    if not 1 <= num_plateaus <= T:
        raise ValueError(f"num_plateaus={num_plateaus} out of range for "
                         f"T={T}")
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    out_n = np.zeros(N, np.int32)
    out_start = np.zeros((N, T), np.int32)
    out_stop = np.zeros((N, T), np.int32)
    out_height = np.zeros((N, T), np.float64)
    rc = lib.cs_chisq_batch(traces, np.int32(N), np.int32(T),
                            np.int32(num_plateaus),
                            np.int32(min_step_length),
                            float(min_step_magnitude),
                            np.int32(1 if ignore_counterfits else 0),
                            np.int32(n_threads), out_n, out_start,
                            out_stop, out_height)
    if rc != 0:
        raise RuntimeError(f"cs_chisq_batch failed (rc={rc})")
    return out_n, out_start, out_stop, out_height
