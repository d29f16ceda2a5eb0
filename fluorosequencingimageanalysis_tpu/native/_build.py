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

import logging
import os
import subprocess

logger = logging.getLogger(__name__)
logger.addHandler(logging.NullHandler())


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
