"""Transfer packing (utils/transfer): N result arrays -> <=3 blobs,
bit-exact round trip."""

import numpy as np

from fluorosequencingimageanalysis_tpu.utils.transfer import (
    pack_for_transfer, transfer_nbytes, unpack_transfer)


def test_pack_unpack_bit_exact_roundtrip():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    arrs = {
        "phot": rng.normal(0, 1e5, (4, 3, 16)).astype(np.float32),
        "off_h": rng.normal(0, 2, (4, 3)).astype(np.float32),
        "rh": rng.integers(-3, 512, (4, 3, 16)).astype(np.int16),
        "rw": rng.integers(0, 65535, (4, 3, 16)).astype(np.uint16),
        "state": rng.integers(-1, 2, (4, 3, 16)).astype(np.int8),
        "over": rng.integers(0, 2, (4, 3)).astype(bool),
        "count": rng.integers(0, 9000, (4, 3)).astype(np.int32),
        "scalar_per_row": rng.integers(0, 7, (4,)).astype(np.int32),
    }
    # Include exotic float bit patterns: nan, inf, -0.0 must survive the
    # bitcast exactly.
    arrs["phot"][0, 0, :4] = [np.nan, np.inf, -np.inf, -0.0]
    dev = {k: jnp.asarray(v) for k, v in arrs.items()}
    blobs, spec = pack_for_transfer(dev)
    assert len(blobs) == 3  # one per byte width
    assert transfer_nbytes(blobs) == sum(v.nbytes for v in arrs.values())
    out = unpack_transfer(blobs, spec)
    assert set(out) == set(arrs)
    for k, v in arrs.items():
        assert out[k].dtype == v.dtype, k
        np.testing.assert_array_equal(
            out[k].view(np.uint8), v.view(np.uint8), err_msg=k)


def test_pack_rejects_bad_inputs():
    import jax.numpy as jnp
    import pytest

    with pytest.raises(ValueError, match="unsupported"):
        pack_for_transfer({"a": jnp.zeros((2, 2), jnp.complex64)})
    with pytest.raises(ValueError, match="leading axis"):
        pack_for_transfer({"a": jnp.zeros((2, 2), jnp.float32),
                           "b": jnp.zeros((3, 2), jnp.float32)})
