"""Device-mesh parallelism for whole-experiment processing.

The reference scales with single-node multiprocessing.Pool fan-outs,
load-balanced by candidate counts (/root/reference/pflib.py:1000-1111 and
friends — SURVEY.md section 2.4). On TPU all of those collapse into sharded
array programs: one experiment is a ``f32[fields, cycles, H, W]`` stack,
sharded across an ICI mesh on two axes:

- ``data``: fields — embarrassingly parallel, no cross-field communication;
- ``model``: the per-field candidate bucket of the batched LM fit — the
  FLOP-heavy stage — so a single hot field's fits also spread across chips
  (the reference's load-balancer exists only because of MIMD raggedness;
  under SIMD padding every field costs the same).

XLA inserts the (minimal) collectives; the only cross-device data motion is
the resharding around the fit stage and the final gather of fitted
parameters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, data_axis=None, model_axis=None):
    """Create a ('data', 'model') mesh over the available devices.

    By default all devices go to 'data' (fields axis) — the right layout for
    many-field experiments. Pass explicit axis sizes for other splits.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if data_axis is None and model_axis is None:
        data_axis, model_axis = n_devices, 1
    elif data_axis is None:
        data_axis = n_devices // model_axis
    elif model_axis is None:
        model_axis = n_devices // data_axis
    if data_axis * model_axis != n_devices:
        raise ValueError("data_axis * model_axis must equal n_devices")
    return Mesh(devices.reshape(data_axis, model_axis), ("data", "model"))


def shard_fields(stack, mesh):
    """Place a [fields, ...] array with the fields axis sharded on 'data'."""
    spec = P("data", *([None] * (stack.ndim - 1)))
    return jax.device_put(stack, NamedSharding(mesh, spec))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "max_candidates", "num_iters",
                     "upsample_factor", "photometry_radius",
                     "photometry_brim"))
def experiment_step_sharded(stack, mesh, max_candidates=256, num_iters=30,
                            upsample_factor=10, photometry_radius=9,
                            photometry_brim=6):
    """One full experiment step over a [fields, cycles, H, W] stack.

    Stages (all inside one jitted program, partitioned over the mesh):
      1. registration: phase-correlate consecutive cycles per field,
      2. detection + batched LM PSF fit on every (field, cycle) image,
      3. photometry (mexican hat) at every fitted spot.

    Returns a dict of sharded arrays:
      offsets_h/w: [F, C] per-cycle offsets
      params:      [F, C, K, 7] PSF fits
      keep:        [F, C, K] surviving-fit mask
      photometry:  [F, C, K] mexican-hat photometries at the fit centers
    """
    from ..models.detect import detect_and_fit
    from ..ops.registration import phase_correlate_stack
    from ..ops.photometry import mexican_hat_batch

    F, C, H, W = stack.shape
    data_spec = NamedSharding(mesh, P("data", None, None, None))
    stack = jax.lax.with_sharding_constraint(stack, data_spec)

    # 1. Registration: vmap over fields; each field registers its C cycles.
    off_h, off_w, _, _ = jax.vmap(
        lambda frames: phase_correlate_stack(frames, upsample_factor))(stack)

    # 2. Detection + fit per (field, cycle). The candidate bucket axis is
    # sharded over 'model' so the LM FLOPs spread across the second mesh
    # axis as well.
    imgs = stack.reshape(F * C, H, W)

    def per_image(img):
        res = detect_and_fit(img, max_candidates=max_candidates,
                             num_iters=num_iters)
        return res.params, res.keep, res.center_h, res.center_w

    params, keep, ch, cw = jax.vmap(per_image)(imgs)
    params = jax.lax.with_sharding_constraint(
        params.reshape(F, C, max_candidates, 7),
        NamedSharding(mesh, P("data", None, "model", None)))
    keep = keep.reshape(F, C, max_candidates)
    ch = ch.reshape(F, C, max_candidates)
    cw = cw.reshape(F, C, max_candidates)

    # 3. Photometry at the (rounded) fit centers, masked by validity and
    # interior-ness.
    r = photometry_radius
    rch = jnp.clip(jnp.round(ch).astype(jnp.int32), r, H - r - 1)
    rcw = jnp.clip(jnp.round(cw).astype(jnp.int32), r, W - r - 1)

    def phot_one(img, hs, ws):
        return mexican_hat_batch(img, hs, ws, brim_size=photometry_brim,
                                 radius=r)

    phot = jax.vmap(phot_one)(imgs, rch.reshape(F * C, -1),
                              rcw.reshape(F * C, -1))
    phot = phot.reshape(F, C, max_candidates) * keep

    return {
        "offsets_h": off_h, "offsets_w": off_w,
        "params": params, "keep": keep,
        "center_h": ch, "center_w": cw,
        "photometry": phot,
    }
