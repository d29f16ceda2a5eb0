"""ctypes binding for the native step-fit post-pass (stepchain.cpp).

The device step (ops/stepfit_batch.py) computes Chung-Kennedy traces and
sliding-t step masks for thousands of traces in one dispatch; this core
runs the remaining per-trace chain — plateau assembly, refit on the raw
trace, and the iterated drop-sort Welch-t merge filter
(stepfitting.py:494-552, the port of stepfitting_library.py:1328-1480) —
in C++ instead of per-trace Python. Builds ``_stepchain.so`` on first
use (g++ -O3), cached next to the source; ``have_native()`` gates the
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
_U8 = np.ctypeslib.ndpointer(np.uint8, flags="C")


def _prototypes(lib):
    fn = lib.sc_postpass
    fn.restype = ctypes.c_int
    fn.argtypes = [
        _F64, _U8,                      # raw, mask (N, Tm)
        ctypes.c_int32, ctypes.c_int32,  # N, Tm
        ctypes.c_double, ctypes.c_int32,  # p_threshold, no_merge
        ctypes.c_int32,                  # n_threads
        _I32, _I32, _I32, _F64,          # refit n/start/stop/height
        _I32, _I32, _I32, _F64,          # tfil n/start/stop/height
    ]
    wb = lib.sc_welch_p_batch
    wb.restype = None
    wb.argtypes = [_F64, _I32, _I32, _F64, _I32, _I32,
                   ctypes.c_int32, _F64]


_NATIVE = NativeLib(
    os.path.join(_HERE, "stepchain.cpp"),
    os.path.join(_HERE, "_stepchain.so"), _prototypes,
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


def stepfit_postpass(raw, mask, p_threshold, no_merge_start, n_threads=None):
    """Run the plateau-assembly + refit + drop-sort-t-merge chain on
    (N, Tm) mirrored raw traces and their step masks.

    Returns (refit_n, refit_start, refit_stop, refit_height,
    tfil_n, tfil_start, tfil_stop, tfil_height) — plateau triples are
    (start[i, :n], stop[i, :n], height[i, :n]) per trace i.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native stepchain unavailable (g++ build failed)")
    raw = np.ascontiguousarray(raw, dtype=np.float64)
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    N, Tm = raw.shape
    if mask.shape != (N, Tm):
        raise ValueError("mask must match raw's (N, T) shape")
    if Tm and mask[:, 0].any():
        # A step AT frame 0 would open a plateau that ends before it
        # starts; the host chain raises ValueError on the same input
        # (stepfitting._fit_plateau), and excluding it also bounds the
        # plateau count at Tm (the width of the output buffers).
        raise ValueError("step mask hit at frame 0: plateaus start "
                         "after the first step frame")
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    refit_n = np.zeros(N, np.int32)
    tfil_n = np.zeros(N, np.int32)
    refit_start = np.zeros((N, Tm), np.int32)
    refit_stop = np.zeros((N, Tm), np.int32)
    refit_height = np.zeros((N, Tm), np.float64)
    tfil_start = np.zeros((N, Tm), np.int32)
    tfil_stop = np.zeros((N, Tm), np.int32)
    tfil_height = np.zeros((N, Tm), np.float64)
    rc = lib.sc_postpass(raw, mask, np.int32(N), np.int32(Tm),
                         float(p_threshold), np.int32(no_merge_start),
                         np.int32(n_threads), refit_n, refit_start,
                         refit_stop, refit_height, tfil_n, tfil_start,
                         tfil_stop, tfil_height)
    if rc != 0:
        raise RuntimeError(f"sc_postpass failed (rc={rc})")
    return (refit_n, refit_start, refit_stop, refit_height,
            tfil_n, tfil_start, tfil_stop, tfil_height)


def welch_p_batch(segments_a, segments_b):
    """Two-tailed Welch p for pairs of 1-D arrays (testing hook)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native stepchain unavailable")
    a_cat = np.ascontiguousarray(np.concatenate(segments_a), np.float64)
    b_cat = np.ascontiguousarray(np.concatenate(segments_b), np.float64)
    a_len = np.array([len(s) for s in segments_a], np.int32)
    b_len = np.array([len(s) for s in segments_b], np.int32)
    a_off = np.concatenate([[0], np.cumsum(a_len[:-1])]).astype(np.int32)
    b_off = np.concatenate([[0], np.cumsum(b_len[:-1])]).astype(np.int32)
    out = np.empty(len(segments_a), np.float64)
    lib.sc_welch_p_batch(a_cat, a_off, a_len, b_cat, b_off, b_len,
                         np.int32(len(segments_a)), out)
    return out
