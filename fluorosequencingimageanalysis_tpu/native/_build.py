"""Shared g++ build helper for the native cores' ctypes bindings.

Every binding compiles its .cpp to a shared object next to the source on
first use. Two hazards the naive `g++ -o final.so` form has:

- concurrent processes (pytest workers, parallel CLI runs) on a fresh
  checkout race on the output path, and ctypes.CDLL can load a
  partially-written file;
- a swallowed compiler error silently drops the session to the Python
  fallback with nothing to diagnose.

So: compile to a per-pid temp file and os.replace() it into place
(atomic on POSIX — a reader sees either the old complete file or the
new complete file, never a torn write), and log the last compiler
stderr at WARNING when every flag set fails.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

logger = logging.getLogger(__name__)
logger.addHandler(logging.NullHandler())


class NativeLib:
    """Lazy, thread-safe, rebuild-on-stale-source loader for one core.

    One definition of the double-checked-lock + mtime-staleness +
    CDLL-and-prototype dance all four bindings need (it was copy-pasted
    four times and had already drifted on the fallback flag sets).

    Arguments:
        src / so: absolute paths of the C++ source and its shared object.
        configure: callable(lib) declaring the ctypes prototypes; any
            exception it raises marks the core permanently unavailable
            for this process (callers fall back to Python).
        flag_sets: extra-flag lists tried in order by build_shared.
    """

    def __init__(self, src, so, configure,
                 flag_sets=(["-O3", "-march=native"], ["-O3"], ["-O2"])):
        self._src = src
        self._so = so
        self._configure = configure
        self._flag_sets = [list(f) for f in flag_sets]
        self._lock = threading.Lock()
        self._lib = None
        self._failed = False

    def load(self):
        """The configured ctypes.CDLL, or None (build/load failure)."""
        if self._lib is not None or self._failed:
            return self._lib
        with self._lock:
            if self._lib is not None or self._failed:
                return self._lib
            if not os.path.exists(self._so) or (
                    os.path.exists(self._src) and
                    os.path.getmtime(self._so) < os.path.getmtime(self._src)):
                if not build_shared(self._src, self._so, self._flag_sets):
                    self._failed = True
                    return None
            try:
                lib = ctypes.CDLL(self._so)
                self._configure(lib)
                self._lib = lib
            except Exception:
                logger.warning("loading native core %s failed; using the "
                               "Python implementation.",
                               os.path.basename(self._so), exc_info=True)
                self._failed = True
        return self._lib


def build_shared(src: str, so: str, flag_sets) -> bool:
    """Compile ``src`` to shared object ``so``; True on success.

    flag_sets: iterable of extra-flag lists tried in order (e.g.
    [["-O3", "-march=native"], ["-O3"]] — the portable set last).
    """
    tmp = f"{so}.{os.getpid()}.tmp"
    last_err = None
    try:
        for flags in flag_sets:
            cmd = (["g++"] + list(flags) +
                   ["-shared", "-fPIC", "-std=c++17", src, "-o", tmp])
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=300)
            except subprocess.CalledProcessError as e:
                last_err = e.stderr.decode(errors="replace")[-2000:]
                continue
            except Exception as e:  # g++ missing, timeout, ...
                last_err = repr(e)
                continue
            os.replace(tmp, so)
            return True
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
    logger.warning("native build of %s failed; falling back to the Python "
                   "implementation. Last compiler error:\n%s",
                   os.path.basename(src), last_err)
    return False
