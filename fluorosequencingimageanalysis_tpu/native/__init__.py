"""Native (C++) runtime components, loaded via ctypes.

The compute path of this framework is jax/XLA/pallas; the pieces that are
serial, host-side, and hot — like the Monte-Carlo signal generator the
reference delegates to a (missing) C extension — live here as C++ with a
plain C ABI. Sources are bundled and compiled on first use with ``g++``;
the resulting ``.so`` is cached next to the source.
"""

from .randsiggen import (  # noqa: F401
    have_native, random_signal_batch, monte_carlo_trie_native)
from .trackcsv import (  # noqa: F401
    parse_track_csv_native, read_track_photometries_arrays)
