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
    static_argnames=("mesh", "max_candidates", "max_spots", "num_iters",
                     "upsample_factor", "photometry_radius",
                     "photometry_brim"))
def experiment_step_sharded(stack, mesh, max_candidates=256, max_spots=None,
                            num_iters=30, upsample_factor=10,
                            photometry_radius=9, photometry_brim=6):
    """One full experiment step over a [fields, cycles, H, W] stack.

    Stages (all inside one jitted program, partitioned over the mesh):
      1. registration: phase-correlate consecutive cycles per field,
      2. detection + batched LM PSF fit on every (field, cycle) image,
      3. compaction of surviving spots into a [max_spots] bucket,
      4. photometry (mexican hat) at the surviving spots only.

    Returns a dict of sharded arrays:
      offsets_h/w: [F, C] per-cycle offsets
      params:      [F, C, K, 7] PSF fits
      keep:        [F, C, K] surviving-fit mask
      spot_h/w:    [F, C, S] compacted surviving-spot centers
      spot_valid:  [F, C, S]
      photometry:  [F, C, S] mexican-hat photometries at the kept spots
    """
    from ..models.detect import detect_and_fit_batch
    from ..ops.registration import phase_correlate_stack
    from ..ops.photometry import mexican_hat_batch

    F, C, H, W = stack.shape
    data_spec = NamedSharding(mesh, P("data", None, None, None))
    stack = jax.lax.with_sharding_constraint(stack, data_spec)

    # 1. Registration: vmap over fields; each field registers its C cycles.
    off_h, off_w, _, _ = jax.vmap(
        lambda frames: phase_correlate_stack(frames, upsample_factor))(stack)

    # 2. Detection + fit, batched over all (field, cycle) images in ONE
    # lane-major LM call; the candidate bucket axis is sharded over
    # 'model' so the LM FLOPs spread across the second mesh axis as well.
    # On multi-chip meshes detection runs under shard_map over 'data'
    # (fields are independent, so each chip detects its own shard — this is
    # also how the fused Pallas kernel partitions, since custom calls are
    # not auto-partitionable by GSPMD).
    imgs = stack.reshape(F * C, H, W)
    use_pallas = jax.default_backend() in ("tpu", "axon")
    n_data = mesh.shape["data"]
    if n_data > 1:
        import inspect
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        # jax >= 0.8 renamed check_rep -> check_vma.
        _kw = ("check_vma" if "check_vma" in
               inspect.signature(shard_map).parameters else "check_rep")

        def detect_shard(im):
            return detect_and_fit_batch(im, max_candidates=max_candidates,
                                        num_iters=num_iters,
                                        use_pallas=use_pallas)

        example = jax.eval_shape(detect_shard, imgs)
        out_specs = jax.tree_util.tree_map(
            lambda s: P(*(["data"] + [None] * (len(s.shape) - 1))), example)
        res = shard_map(detect_shard, mesh=mesh,
                        in_specs=P("data", None, None),
                        out_specs=out_specs, **{_kw: False})(imgs)
    else:
        res = detect_and_fit_batch(imgs, max_candidates=max_candidates,
                                   num_iters=num_iters,
                                   use_pallas=use_pallas)
    params = jax.lax.with_sharding_constraint(
        res.params.reshape(F, C, max_candidates, 7),
        NamedSharding(mesh, P("data", None, "model", None)))
    keep = res.keep.reshape(F, C, max_candidates)
    ch = res.center_h.reshape(F, C, max_candidates)
    cw = res.center_w.reshape(F, C, max_candidates)

    # 3. Compact surviving spots into a small static bucket so photometry
    # only touches real spots (typically ~10% of candidates).
    if max_spots is None:
        max_spots = max(min(max_candidates, 512), 8)
    keep_flat = keep.reshape(F * C, max_candidates)
    score = jnp.where(keep_flat, res.r2.reshape(F * C, -1), -jnp.inf)
    top_score, top_idx = jax.lax.top_k(score, max_spots)
    spot_valid = top_score > -jnp.inf
    ch_flat = res.center_h.reshape(F * C, -1)
    cw_flat = res.center_w.reshape(F * C, -1)
    sh = jnp.take_along_axis(ch_flat, top_idx, axis=-1)
    sw = jnp.take_along_axis(cw_flat, top_idx, axis=-1)

    # 4. Photometry at the (rounded) kept-spot centers.
    r = photometry_radius
    rch = jnp.clip(jnp.round(sh).astype(jnp.int32), r, H - r - 1)
    rcw = jnp.clip(jnp.round(sw).astype(jnp.int32), r, W - r - 1)

    def phot_one(img, hs, ws):
        return mexican_hat_batch(img, hs, ws, brim_size=photometry_brim,
                                 radius=r)

    phot = jax.vmap(phot_one)(imgs, rch, rcw)
    phot = phot.reshape(F, C, max_spots) * spot_valid.reshape(F, C, -1)

    return {
        "offsets_h": off_h, "offsets_w": off_w,
        "params": params, "keep": keep,
        "center_h": ch, "center_w": cw,
        "spot_h": sh.reshape(F, C, max_spots),
        "spot_w": sw.reshape(F, C, max_spots),
        "spot_valid": spot_valid.reshape(F, C, max_spots),
        "photometry": phot,
    }
