"""Multi-host (DCN) scaling: one experiment sharded across processes.

The reference is strictly single-node — its entire distributed story is
``multiprocessing.Pool`` with pickle IPC (/root/reference/pflib.py:1000-1111
and SURVEY section 2.4), and the one place cross-process state would be
needed is explicitly unimplemented
(/root/reference/flexlibrary.py:2673-2689). The TPU design's story beyond a
single pod slice is multi-process SPMD: every host runs THIS SAME program,
contributes the fields it loaded locally, and ``jax.distributed`` + GSPMD
execute the one sharded experiment step over the global ('data', 'model')
mesh. Fields are purely data-parallel, so the only inter-host (DCN) traffic
is the coordination handshake and the final result gather — the hot compute
and the fit-stage reshard ride ICI inside each host's slice.

Usage — identical on every host::

    from fluorosequencingimageanalysis_tpu.parallel import multihost

    multihost.initialize()                  # env-driven on TPU pods; or pass
                                            # coordinator/num_processes/id
    local_fields = load_my_shard()          # [F_local, C, H, W]
    out = multihost.run_experiment_step(local_fields, max_candidates=256)
    # out: host-replicated dict of np arrays over ALL processes' fields,
    # in process order.

Tested end-to-end with real multi-process execution (Gloo collectives over
two 4-virtual-device CPU processes) in tests/test_multihost.py; the same
code path drives TPU pods, where ``initialize()`` picks up the cluster from
the environment.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import experiment_step_sharded, make_mesh

_INITIALIZED = False


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Join this process to a multi-host JAX cluster (idempotent).

    With no arguments, ``jax.distributed.initialize`` auto-detects the
    cluster from the environment (the normal mode on TPU pods). Explicit
    arguments support manual clusters (including the CPU test cluster).
    Safe to call when already initialized or when single-process.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    # Already initialized by the host program (a launcher, another
    # library): a plain no-op. is_initialized() is safe pre-XLA.
    if jax.distributed.is_initialized():
        _INITIALIZED = True
        return
    # NOTE: no jax.* backend queries before this call — jax.distributed
    # must run before anything initializes XLA (even jax.process_count()).
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            local_device_ids=local_device_ids)
    except ValueError:
        # Auto-detect found no cluster (jax raises
        # "coordinator_address should be defined"): on a plain
        # single-process machine that IS the promised no-op. ANY explicit
        # argument means the caller intended a real cluster (e.g.
        # process_id given but coordinator_address forgotten) — swallowing
        # that would silently degrade a multi-host launch into independent
        # single-process runs with host-divergent results.
        if (coordinator_address is not None or num_processes is not None
                or process_id is not None or local_device_ids is not None):
            raise
    _INITIALIZED = True


def global_mesh(data_axis=None, model_axis=None):
    """A ('data', 'model') mesh over ALL devices of ALL processes.

    ``jax.devices()`` is already cluster-global after ``initialize()``, so
    this is ``make_mesh`` with the multi-host contract documented: device
    order groups each process's local devices together, which is what maps
    each process's locally-contributed fields onto its own chips in
    :func:`shard_fields_from_local`.
    """
    return make_mesh(data_axis=data_axis, model_axis=model_axis)


def shard_fields_from_local(local_stack, mesh):
    """Build one global [F_global, ...] array from per-process field shards.

    Every process passes its own ``[F_local, ...]`` block (equal F_local on
    all processes); the result is a global ``jax.Array`` whose leading axis
    is sharded on the mesh's 'data' axis, with each process's fields
    resident on its own devices — no data moves over DCN.
    """
    local_stack = np.asarray(local_stack)
    spec = P("data", *([None] * (local_stack.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local_stack)


def allgather(tree):
    """Replicate a (possibly non-addressable) sharded result on every host.

    Returns NumPy arrays; this is the one DCN-wide data movement of the
    pipeline — the reduced per-spot results, not the raw frames.
    """
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree, tiled=True)


def run_experiment_step(local_fields, mesh=None, gather=True, **step_kwargs):
    """Run the sharded experiment step over every process's fields.

    Args:
        local_fields: this process's ``[F_local, C, H, W]`` stack (raw
            camera dtypes welcome — cast happens on device). F_local must
            be the same on every process.
        mesh: a global mesh from :func:`global_mesh` (default: all devices
            to 'data').
        gather: when True (default) the per-field results are replicated to
            every host as NumPy arrays, padding removed, fields in process
            order. When False the raw global sharded dict is returned
            (leading axis includes per-process padding).
        **step_kwargs: forwarded to
            :func:`..mesh.experiment_step_sharded`.

    Data-axis padding: the 'data' axis needs the global field count to
    split evenly, so each process zero-pads its block to the next multiple
    of its data-axis share; padded rows are dropped again after the gather.
    """
    local = np.asarray(local_fields)
    if mesh is None:
        mesh = global_mesh()
    nproc = jax.process_count()
    n_data = mesh.shape["data"]
    if n_data % nproc:
        raise ValueError(
            f"data axis ({n_data}) must be a multiple of the process count "
            f"({nproc}) so every process owns whole data-axis shards")
    share = n_data // nproc
    f_local = local.shape[0]
    if nproc > 1:
        # The keep-index math below assumes every process contributed the
        # SAME field count; a mismatch that still lands on a consistent
        # global shape would return silently wrong, host-divergent rows.
        # One tiny DCN allgather turns that into a loud error.
        from jax.experimental import multihost_utils
        counts = np.asarray(
            multihost_utils.process_allgather(np.int64(f_local)))
        if not (counts == f_local).all():
            raise ValueError(
                "run_experiment_step needs the same F_local on every "
                f"process; got per-process field counts {counts.tolist()}")
    pad = (-f_local) % share
    if pad:
        local = np.concatenate(
            [local, np.zeros((pad,) + local.shape[1:], local.dtype)])
    x = shard_fields_from_local(local, mesh)
    with mesh:
        out = experiment_step_sharded(x, mesh, **step_kwargs)
    if not gather:
        return out
    gathered = allgather(out)
    f_padded = f_local + pad
    if pad:
        keep = np.concatenate([np.arange(p * f_padded, p * f_padded + f_local)
                               for p in range(nproc)])
        gathered = {k: np.asarray(v)[keep] for k, v in gathered.items()}
    else:
        gathered = {k: np.asarray(v) for k, v in gathered.items()}
    return gathered
