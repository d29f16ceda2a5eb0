"""Shared helpers for chunked device dispatch.

Three hot paths (whole-stack photometry, v8 scoring, batched step fitting)
chunk their device calls and pad ragged tails to power-of-two buckets so
every call shape hits an already-compiled program; the sharded variants
additionally need even shards across the mesh's first axis. One definition
here keeps the bucketing rules from drifting apart.
"""

from __future__ import annotations


def pow2_bucket(n: int, cap: int, multiple_of: int = 1) -> int:
    """Padded batch size for a chunk of ``n`` rows.

    Full chunks stay at ``cap``; ragged tails round up to the next power
    of two (capped). With ``multiple_of`` > 1 the result is also rounded
    up to that multiple (even shards across a device mesh).

    ``n`` must already be chunked to at most ``cap`` rows: silently
    returning ``cap`` for a larger ``n`` would hand callers a negative
    pad size (``bucket - n``) and a confusing reshape error far from the
    cause.
    """
    if n > cap:
        raise ValueError(
            f"pow2_bucket: n={n} exceeds the dispatch cap {cap}; chunk the "
            "rows before bucketing.")
    bucket = n if n == cap else min(cap, 1 << max(n - 1, 1).bit_length())
    if multiple_of > 1:
        bucket = max(bucket, multiple_of)
        bucket += (-bucket) % multiple_of
    return bucket


def mesh_row_sharding(mesh):
    """(sharding, n_devices): rows of a 2D array over the mesh's first axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    return NamedSharding(mesh, P(axis, None)), int(mesh.shape[axis])
