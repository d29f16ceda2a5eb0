"""ctypes binding for the native greedy-tracking core (tracklink.cpp).

The linking semantics (reference flexlibrary.py:679-1027) live in C++; this
module only marshals arrays. Builds ``_tracklink.so`` on first use (g++
-O3), cached next to the source; ``have_native()`` gates the fallback to
the pure-NumPy path in pipeline/tracking.py.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ._build import NativeLib

_HERE = os.path.dirname(os.path.abspath(__file__))


def _prototypes(lib):
    fn = lib.trk_greedy_link
    fn.restype = ctypes.c_int
    fn.argtypes = [
        np.ctypeslib.ndpointer(np.float64, flags="C"),  # h
        np.ctypeslib.ndpointer(np.float64, flags="C"),  # w
        np.ctypeslib.ndpointer(np.int32, flags="C"),    # frame_start
        ctypes.c_int32, ctypes.c_int32,                 # frames/spots
        ctypes.c_int32, ctypes.c_int32,                 # H, W
        ctypes.c_double,                                # radius
        np.ctypeslib.ndpointer(np.int32, flags="C"),    # out_ancestor
        np.ctypeslib.ndpointer(np.int32, flags="C"),    # out_desc
        np.ctypeslib.ndpointer(np.int64, flags="C"),    # err_out
    ]


_NATIVE = NativeLib(os.path.join(_HERE, "tracklink.cpp"),
                    os.path.join(_HERE, "_tracklink.so"), _prototypes)


def _load():
    return _NATIVE.load()


def have_native() -> bool:
    return _load() is not None


def greedy_link(h, w, frame_start, frame_shape, candidate_radius):
    """Run the C++ linker on offset-adjusted positions.

    h, w: (n_spots,) float64, frame-major, ALREADY offset-adjusted.
    frame_start: (n_frames + 1,) int32 prefix offsets into h/w.
    Returns (ancestor, descendant): per-spot global links, -1 for none.
    Raises AssertionError on a shared bin (reference precondition).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native tracklink unavailable (g++ build failed)")
    h = np.ascontiguousarray(h, dtype=np.float64)
    w = np.ascontiguousarray(w, dtype=np.float64)
    frame_start = np.ascontiguousarray(frame_start, dtype=np.int32)
    n_spots = int(h.shape[0])
    n_frames = int(frame_start.shape[0]) - 1
    anc = np.empty(n_spots, dtype=np.int32)
    desc = np.empty(n_spots, dtype=np.int32)
    err = np.zeros(2, dtype=np.int64)
    rc = lib.trk_greedy_link(h, w, frame_start, np.int32(n_frames),
                             np.int32(n_spots),
                             np.int32(frame_shape[0]),
                             np.int32(frame_shape[1]),
                             float(candidate_radius), anc, desc, err)
    if rc == 2:
        s = int(err[1])
        raise ValueError(
            f"spot {s} at (h, w) = ({float(h[s])}, {float(w[s])}) rounds "
            f"outside the {tuple(int(v) for v in frame_shape)} frame — "
            "positions must be offset-adjusted AND in-range "
            "(run discard_dropouts first)")
    if rc != 0:
        W = int(frame_shape[1])
        cell = int(err[1])
        raise AssertionError(
            str((cell // W, cell % W)) + " is already filled in frame_bins["
            + str(int(err[0])) + "]")
    return anc, desc
