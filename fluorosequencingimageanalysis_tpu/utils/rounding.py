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
