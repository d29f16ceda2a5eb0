"""Multi-device mesh tests on the 8-virtual-CPU-device backend
(conftest sets --xla_force_host_platform_device_count=8).

Validates the SURVEY §2.4 design claim: the reference's Pool fan-outs
collapse into sharded array programs whose results are independent of the
mesh layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluorosequencingimageanalysis_tpu.parallel.mesh import (
    make_mesh, shard_fields, experiment_step_sharded)


def _stack(F=8, C=2, H=64, W=64, seed=0):
    rng = np.random.default_rng(seed)
    stack = rng.normal(100.0, 3.0, (F, C, H, W))
    hh, ww = np.mgrid[0:5, 0:5]
    for f in range(F):
        for (h, w) in [(12, 12), (30, 40), (50, 20), (20, 52)]:
            psf = 800.0 * np.exp(-((hh - 2.2) ** 2 + (ww - 2.4) ** 2) / 2.0)
            stack[f, :, h - 2:h + 3, w - 2:w + 3] += psf
    return stack.astype(np.float32)


def test_make_mesh_layouts():
    assert len(jax.devices()) == 8, "conftest should provide 8 cpu devices"
    m = make_mesh(8)
    assert m.shape == {"data": 8, "model": 1}
    m2 = make_mesh(8, data_axis=4)
    assert m2.shape == {"data": 4, "model": 2}
    m3 = make_mesh(8, model_axis=4)
    assert m3.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh(8, data_axis=3, model_axis=3)


def test_shard_fields_placement():
    mesh = make_mesh(8)
    x = shard_fields(jnp.zeros((8, 2, 16, 16)), mesh)
    spec = x.sharding.spec
    assert spec[0] == "data"


def test_experiment_step_sharding_invariant():
    """The sharded experiment step must give identical results on a 1-device
    and an 8-device mesh (no cross-field communication exists)."""
    stack = _stack()
    out1 = experiment_step_sharded(jnp.asarray(stack), make_mesh(1),
                                   max_candidates=64, num_iters=20,
                                   upsample_factor=5)
    mesh8 = make_mesh(8)
    x8 = shard_fields(jnp.asarray(stack), mesh8)
    with mesh8:
        out8 = experiment_step_sharded(x8, mesh8, max_candidates=64,
                                       num_iters=20, upsample_factor=5)
    np.testing.assert_allclose(np.asarray(out1["offsets_h"]),
                               np.asarray(out8["offsets_h"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1["params"]),
                               np.asarray(out8["params"]),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(out1["keep"]) == np.asarray(out8["keep"])).all()
    np.testing.assert_allclose(np.asarray(out1["photometry"]),
                               np.asarray(out8["photometry"]),
                               rtol=1e-4, atol=1e-2)


def test_experiment_step_2d_mesh():
    """data x model 2D mesh compiles and matches the 1-device result."""
    stack = _stack(F=4)
    out1 = experiment_step_sharded(jnp.asarray(stack), make_mesh(1),
                                   max_candidates=64, num_iters=20,
                                   upsample_factor=5)
    mesh = make_mesh(8, data_axis=4, model_axis=2)
    x = shard_fields(jnp.asarray(stack), mesh)
    with mesh:
        out = experiment_step_sharded(x, mesh, max_candidates=64,
                                      num_iters=20, upsample_factor=5)
    np.testing.assert_allclose(np.asarray(out1["params"]),
                               np.asarray(out["params"]),
                               rtol=1e-4, atol=1e-4)


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
